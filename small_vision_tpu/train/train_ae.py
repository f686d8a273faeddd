"""The unified-AE pretrain/finetune trainer.

Parity target: /root/reference/big_vision/trainers/train_ae.py (732 LoC):
same train-state layout {params, opt, rng, gd [, ema_params]}, same joint
MAE+diffusion loss split by a static `no_noise_prob` batch fraction
(:304-361), label-CFG dropout, EMA, NaN abort, periodic eval/checkpoint, and
the same eval predict-fn suite (:384-543) feeding the evaluator framework.

TPU-first deviations:
  - The fused device-side pp program (flip/value_range/onehot) runs INSIDE
    the jitted update_fn, so raw uint8 batches cross PCIe/DCN and the
    f32 expansion happens in HBM.
  - Explicit NamedSharding everywhere (no flax logical-axis rules); the
    mesh supports data+fsdp(+tensor) axes, not just 1-D data.
  - bf16 matmuls by default; fp32 params and loss.
  - Checkpointing is orbax-async (utils/checkpoint.py) instead of
    hand-rolled tensorstore.
"""

import functools
import importlib
import os
from typing import Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from small_vision_tpu import optim, parallel
from small_vision_tpu.data import pipeline
from small_vision_tpu.ops import diffusion as gd_lib
from small_vision_tpu.parallel.ctx import activate_mesh
from small_vision_tpu.utils import (Chrono, MetricWriter, itstime, steps)
from small_vision_tpu.utils import checkpoint as ckpt_lib


def _info(note):
  if jax.process_index() == 0:
    print(f"[33mNOTE[0m: {note}", flush=True)


def build_model(config):
  model_mod = importlib.import_module(
      f"small_vision_tpu.models.{config.get('model_name', 'ae')}")
  return model_mod.Model(**dict(config.get("model", {})))


def mae_mix_weight(batch_size: int, no_noise_prob: float) -> float:
  """Realized MAE-branch loss weight: int(B*p)/B.

  The batch is split by the static count n_no_noise = int(B*p), so the loss
  mix must use the realized count ratio, not the nominal probability
  (reference trainers/train_ae.py:304,361) — they differ whenever B*p is
  fractional.
  """
  return int(batch_size * no_noise_prob) / batch_size


def make_update_fn(model, tx, config, device_pp, mesh,
                   train_state_sharding, vae_encode=None):
  """Builds the single-XLA-program train step (donated train_state+batch)."""
  no_noise_prob = float(config.get("no_noise_prob", 0.5))
  mask_ratio = float(config.get("mask_ratio", 0.375))
  mask_ratio_no_noise = float(config.get("mask_ratio_no_noise", 0.75))
  use_labels = bool(config.get("use_labels", False))
  ema_decay = config.get("ema_decay", None)
  channels = int(config.get("diffusion_space", (64, 64, 3))[-1])
  latent = bool(config.get("latent_diffusion", False))
  pre_latents = bool(config.get("use_preprocessed_latents", False))
  # l2_params/l2_updates/l2_grads parity metrics (the reference computes them
  # every step inside update_fn). They cost ~10% of the step (three full
  # passes over params+updates+grads fused into the weight-grad matmuls), so
  # the trainer compiles TWO variants and runs the heavy one only on log
  # steps (`update_fn.with_l2`); `l2_metrics=False` disables them entirely.
  l2_metrics = bool(config.get("l2_metrics", True))
  inject_draws = bool(config.get("_inject_draws", False))  # test-only hook
  repl = parallel.replicated_sharding(mesh)

  def update_fn_impl(train_state, batch, with_l2):
    rng = train_state["rng"]
    gd = train_state["gd"]

    rng, pp_rng = jax.random.split(rng)
    if device_pp is not None:
      batch = device_pp(dict(batch), pp_rng)
    images = batch["image"]
    if latent and not pre_latents:
      # VAE-encode pixels → latents inside the same program: the encoder
      # conv stack fuses into the step; pixels never persist in HBM.
      rng, vae_rng = jax.random.split(rng)
      images = vae_encode(train_state["vae_params"], vae_rng, images)
    b = images.shape[0]

    n_no_noise = int(b * no_noise_prob)  # static split, reference :304
    n_noise = b - n_no_noise
    x0_noise = images[:n_noise]
    x0_clean = images[n_noise:]
    labels_t = batch["label"][:n_noise] if use_labels else None

    if inject_draws:
      # Differential-test hook (`config._inject_draws`): consume the step's
      # randomness from the batch instead of the train-state rng stream, so
      # a trajectory can be driven bitwise against the reference update_fn
      # (trainers/train_ae.py:302-325) with identical t/noise/mask draws.
      batched_t = batch["_t"]
      noise = batch["_noise"]
      rng_mae, cfg_mae, mae_mae = (
          batch["_rng_mae"], batch["_cfg_mae"], batch["_mae_mae"])
      rng_dit, mae_dit, cfg_dit = (
          batch["_rng_dit"], batch["_mae_dit"], batch["_cfg_dit"])
    else:
      (rng, t_rng, noise_rng, rng_mae, cfg_mae, mae_mae,
       rng_dit, mae_dit, cfg_dit) = jax.random.split(rng, 9)

      batched_t = jax.random.randint(
          t_rng, (n_noise,), 0, gd.num_timesteps, jnp.int32)
      noise = jax.random.normal(noise_rng, x0_noise.shape, jnp.float32)
    x_t = gd_lib.q_sample(gd, x0_noise, batched_t, noise)

    def mae_branch_loss(pred, out):
      pred_x0 = pred[..., :channels]
      se = (pred_x0 - x0_clean) ** 2
      return jnp.mean(se * out["mask"]) / jnp.mean(out["mask"])

    def dit_branch_loss(pred, out):
      # eps loss on visible, x0 loss on masked tokens.
      pred_x0 = pred[..., :channels]
      pred_eps = pred[..., channels:]
      x0_se = (pred_x0 - x0_noise) ** 2
      eps_se = (pred_eps - noise) ** 2
      if out["mask"] is not None:
        eps_loss = (jnp.mean(eps_se * (1 - out["mask"]))
                    / jnp.mean(1 - out["mask"]))
        x0_loss = jnp.mean(x0_se * out["mask"]) / jnp.mean(out["mask"])
        return (eps_loss + x0_loss) / 2
      return (jnp.mean(eps_se) + jnp.mean(x0_se)) / 2

    # fused_branches: run both loss branches through one apply that batches
    # the shared patchify/decoder/head stages (models/ae.py dual_forward).
    # Measured NEUTRAL at UMD-B/4 bs256 on one v5e (924 vs 934 imgs/s — the
    # B-doubled decoder raises HBM pressure under auto-remat), so default
    # off; the op-count halving matters on dispatch-bound small configs.
    fused_branches = bool(config.get("fused_branches", False))

    def loss_fn(params):
      if fused_branches and n_no_noise > 0 and n_noise > 0:
        # Both branches: one apply sharing the patchify/decoder/head stages
        # at full batch (models/ae.py dual_forward) — the encoders stay
        # per-branch (different static keep-lengths). Same per-branch math
        # as the two-apply form below.
        pred, out_mae, out_dit = model.apply(
            {"params": params}, x0_clean, x_t,
            t_b=batched_t + 1, y_b=labels_t,
            mask_a=mask_ratio_no_noise, mask_b=mask_ratio,
            train=True, method="dual_forward",
            rngs={"dropout": rng_dit, "cfg": cfg_dit, "mae_noise": mae_dit})
        mae_loss = mae_branch_loss(pred[:n_no_noise], out_mae)
        dit_loss = dit_branch_loss(pred[n_no_noise:], out_dit)
      else:
        if n_no_noise > 0:
          # MAE branch: clean input, t=0, heavy masking; loss on masked x0.
          pred, out = model.apply(
              {"params": params}, x0_clean,
              t=jnp.zeros((n_no_noise,), jnp.int32),
              train=True, mask=mask_ratio_no_noise,
              rngs={"dropout": rng_mae, "cfg": cfg_mae, "mae_noise": mae_mae})
          mae_loss = mae_branch_loss(pred, out)
        else:
          mae_loss = 0.0

        if n_noise > 0:
          # Diffusion branch: noised input at t+1 (t=0 reserved for clean).
          pred, out = model.apply(
              {"params": params}, x_t,
              t=batched_t + 1, y=labels_t,
              train=True, mask=mask_ratio,
              rngs={"dropout": rng_dit, "cfg": cfg_dit, "mae_noise": mae_dit})
          dit_loss = dit_branch_loss(pred, out)
        else:
          dit_loss = 0.0

      # Mix by the REALIZED batch fractions, not the nominal probability:
      # n_no_noise = int(b*p) truncates, so n_no_noise/b != p whenever b*p is
      # fractional (reference trainers/train_ae.py:361 uses the count ratio).
      w_mae = mae_mix_weight(b, no_noise_prob)
      return dit_loss * (1.0 - w_mae) + mae_loss * w_mae

    params, opt = train_state["params"], train_state["opt"]
    loss, grads = jax.value_and_grad(loss_fn)(params)
    if os.environ.get("SV_GRAD_BARRIER"):
      # Experimental: stop XLA fusing the optimizer chain's global-norm
      # sum-of-squares INTO the weight-grad matmul fusions (xprof shows those
      # combined multiply_reduce fusions at ~60 TF/s vs ~179 TF/s for plain
      # grad matmuls).
      grads = jax.lax.optimization_barrier(grads)
    updates, opt = tx.update(grads, opt, params)
    params = optax.apply_updates(params, updates)

    measurements = {"training_loss": loss}
    if with_l2:
      measurements["l2_params"] = optax.global_norm(params)
      measurements["l2_updates"] = optax.global_norm(updates)
      measurements["l2_grads"] = optax.global_norm(grads)

    new_state = {"params": params, "opt": opt, "rng": rng, "gd": gd}
    if ema_decay:
      new_state["ema_params"] = optax.incremental_update(
          params, train_state["ema_params"], ema_decay)
    if latent:
      new_state["vae_params"] = train_state["vae_params"]
    return new_state, measurements

  def _jit(with_l2):
    return jax.jit(
        functools.partial(update_fn_impl, with_l2=with_l2),
        donate_argnums=(0, 1),
        out_shardings=(train_state_sharding, repl))

  update_fn = _jit(False)
  # `.with_l2` is the log-step variant (same state in/out, extra metrics).
  # jax.jit wrappers accept attribute assignment; fall back to plain if not.
  try:
    update_fn.with_l2 = _jit(True) if l2_metrics else update_fn
  except AttributeError:  # pragma: no cover
    pass
  return update_fn


def make_eval_fns(model, config, vae_encode=None, vae_decode=None):
  """The predict-fn suite evaluators consume (reference :384-543)."""
  channels = int(config.get("diffusion_space", (64, 64, 3))[-1])
  dspace = tuple(config.get("diffusion_space", (64, 64, 3)))
  latent = bool(config.get("latent_diffusion", False))
  size = int(config.get("size", dspace[0]))

  def to_latent(train_state, images, rng):
    if not latent:
      return images
    return vae_encode(train_state["vae_params"], rng, images)

  def from_latent(train_state, z):
    if not latent:
      return z
    return vae_decode(train_state["vae_params"], z)
  use_labels = bool(config.get("use_labels", False))
  num_classes = config.get("num_classes", None)
  sampling_steps = int(config.get("diff_schedule", {}).get(
      "sampling_timesteps", 125))
  eta = float(config.get("diff_schedule", {}).get("eta", 1.0))
  clip_denoised = bool(config.get("diff_schedule", {}).get(
      "clip_denoised", True))
  mask_ratio_no_noise = float(config.get("mask_ratio_no_noise", 0.75))

  def predict_fn(train_state, batch):
    """Clean forward at t=0; `out` carries pre_logits for probes."""
    images = to_latent(train_state, batch["image"],
                       jax.random.split(train_state["rng"])[1])
    _, out = model.apply({"params": train_state["params"]}, images,
                         t=jnp.zeros((images.shape[0],), jnp.int32))
    return None, out

  def make_noised_predict(t_value):
    def noised_predict_fn(train_state, batch):
      vae_rng, noise_rng = jax.random.split(train_state["rng"])
      images = to_latent(train_state, batch["image"], vae_rng)
      b = images.shape[0]
      t = jnp.full((b,), t_value, jnp.int32)
      x_t = gd_lib.q_sample(train_state["gd"], images, t,
                            jax.random.normal(noise_rng, images.shape))
      _, out = model.apply({"params": train_state["params"]}, x_t, t=t + 1)
      return None, out
    return noised_predict_fn

  def patch_fn(train_state, batch):
    """MAE reconstruction: masked clean forward, returns (pred_x0, mask)."""
    vae_rng, mae_rng = jax.random.split(train_state["rng"])
    images = to_latent(train_state, batch["image"], vae_rng)
    b = images.shape[0]
    pred, out = model.apply(
        {"params": train_state["params"]}, images,
        t=jnp.zeros((b,), jnp.int32), mask=mask_ratio_no_noise,
        rngs={"mae_noise": mae_rng})
    pred_x0, mask = pred[..., :channels], out["mask"]
    if latent:
      pred_x0 = from_latent(train_state, pred_x0)
      mask = jax.image.resize(mask, (b, size, size, 1), "nearest")
    return pred_x0, mask

  def loss_fn(train_state, batch):
    """Validation diffusion loss + visualization tensors."""
    vae_rng, t_rng, noise_rng = jax.random.split(train_state["rng"], 3)
    images = to_latent(train_state, batch["image"], vae_rng)
    b = images.shape[0]
    gd = train_state["gd"]
    labels = batch.get("label") if use_labels else None
    t = jax.random.randint(t_rng, (b,), 0, gd.num_timesteps, jnp.int32)
    noise = jax.random.normal(noise_rng, images.shape)
    x_t = gd_lib.q_sample(gd, images, t, noise)
    pred, _ = model.apply({"params": train_state["params"]}, x_t,
                          y=labels, t=t + 1)
    pred_x0 = pred[..., :channels]
    pred_eps = pred[..., channels:]
    # Per-example loss so the evaluator can mask out zero-padded rows of the
    # final short batch and weight ragged batches correctly.
    red = tuple(range(1, pred_eps.ndim))
    loss = (jnp.mean((pred_eps - noise) ** 2, axis=red)
            + jnp.mean((pred_x0 - images) ** 2, axis=red)) / 2
    pred_x0_eps = gd_lib.predict_xstart_from_eps(gd, x_t, t, pred_eps)
    if latent:
      x_t = from_latent(train_state, x_t)
      pred_x0 = from_latent(train_state, pred_x0)
      pred_x0_eps = from_latent(train_state, pred_x0_eps)
    return loss, x_t, pred_x0, pred_x0_eps

  def make_apply_fn(train_state, eps_pred=True):
    """The sampler's eps model: EMA params, t+1 shift, optional CFG."""
    p = train_state.get("ema_params", train_state["params"])

    def apply_fn(*, x_t, t, rng, y=None, cfg_scale=None):
      del rng
      pred, _ = model.apply({"params": p}, x_t, t=t + 1, y=y,
                            cfg_scale=cfg_scale)
      if eps_pred:
        return pred[..., channels:]
      return gd_lib.predict_eps_from_xstart(
          train_state["gd"], x_t, t, pred[..., :channels])
    return apply_fn

  def make_sample_fn(num_classes_arg=None, manual_ys=None, cfg_scale=None,
                     unnormalize=True, eps_pred=True):
    def sample_fn(train_state, rng):
      num_samples = int(config.get("num_samples_per_call", 1024))
      rng, key = jax.random.split(rng)
      if num_classes_arg is not None and manual_ys is None:
        # Class-balanced labels (reference train_ae.py:491-495: arange over
        # all classes, random fill to the call size). Calls smaller than the
        # class count (CPU smoke runs) cover the first num_samples classes.
        ys = jnp.arange(min(num_classes_arg, num_samples))
        if num_samples > num_classes_arg:
          ys = jnp.concatenate([ys, jax.random.randint(
              key, (num_samples - num_classes_arg,), 0, num_classes_arg)])
      elif manual_ys is not None:
        ys = jnp.asarray(manual_ys)
      else:
        ys = None

      out = gd_lib.ddim_sample_loop(
          train_state["gd"], make_apply_fn(train_state, eps_pred=eps_pred),
          rng, (num_samples,) + dspace, ys=ys, cfg_scale=cfg_scale,
          sampling_steps=sampling_steps, eta=eta,
          clip_denoised=clip_denoised)
      samples, rng = out["sample"], out["rng"]
      if latent:
        samples = from_latent(train_state, samples)

      if unnormalize:
        samples = jnp.clip(samples, -1, 1) * 0.5 + 0.5
        samples = jnp.clip(samples * 255, 0, 255).astype(jnp.uint8)

      rng, key = jax.random.split(rng)
      n_show = int(config.get("num_samples", 36))
      show_idx = jax.random.randint(key, (n_show,), 0, num_samples)
      return {"fid_samples": samples,
              "image_examples": samples[show_idx],
              "ys": ys, "rng": rng}
    return sample_fn

  fns = {
      "predict": predict_fn,
      "noised_predict": make_noised_predict(50),
      "patch": patch_fn,
      "loss": loss_fn,
      "uncond_eps": make_sample_fn(),
  }
  if num_classes:
    fns.update({
        "cond_eps": make_sample_fn(num_classes),
        "cfg_eps_1.0": make_sample_fn(num_classes, cfg_scale=1.0),
        "cfg_eps_1.5": make_sample_fn(num_classes, cfg_scale=1.5),
        "cfg_eps_2.0": make_sample_fn(num_classes, cfg_scale=2.0),
        "cfg_eps_4.0": make_sample_fn(num_classes, cfg_scale=4.0),
        "cfg_x0_2.0": make_sample_fn(num_classes, cfg_scale=2.0,
                                     eps_pred=False),
        "cfg_x0_4.0": make_sample_fn(num_classes, cfg_scale=4.0,
                                     eps_pred=False),
    })
  return fns


def train_and_evaluate(config, workdir: Optional[str] = None, mesh=None):
  """Runs the training loop; returns the final train_state and metrics."""
  mesh = mesh or parallel.make_mesh(
      fsdp=int(config.get("mesh_fsdp", 1)),
      tensor=int(config.get("mesh_tensor", 1)))
  chrono = Chrono()
  mw = MetricWriter(workdir, config)

  batch_size = int(config["input"]["batch_size"])
  if batch_size % jax.device_count():
    raise ValueError(f"batch {batch_size} % devices {jax.device_count()}")

  train_iter, device_pp, ntrain_img = pipeline.training(
      dict(config["input"]), mesh)
  total_steps = steps("total", config, ntrain_img, batch_size)
  get_steps = lambda name, default=ValueError: steps(
      name, config, ntrain_img, batch_size, total_steps, default)
  _info(f"{total_steps} steps "
        f"({total_steps * batch_size / ntrain_img:.1f} epochs)")
  chrono.inform(total_steps=total_steps, global_bs=batch_size,
                steps_per_epoch=ntrain_img / batch_size,
                measure=mw.measure, write_note=_info)

  model = build_model(config)

  def init(rng):
    bs = max(batch_size // jax.device_count(), 1)
    dspace = tuple(config.get("diffusion_space", (64, 64, 3)))
    fake = jnp.zeros((bs,) + dspace, jnp.float32)
    ts = jnp.zeros((bs,), jnp.int32)
    rngs = {"params": rng, "dropout": rng, "mae_noise": rng, "cfg": rng}
    return flax.core.unfreeze(model.init(
        rngs, fake, t=ts, train=True,
        mask=float(config.get("mask_ratio_no_noise", 0.75)) or 0.5))["params"]

  rng = jax.random.PRNGKey(int(config.get("seed", 0)))
  rng, rng_init = jax.random.split(rng)
  params_shape = jax.eval_shape(init, rng_init)

  # Optimizer.
  warmup_steps = get_steps("warmup", None) or max(
      int(0.05 * total_steps), 1)
  tx, _ = optim.adamw_trainer_tx(
      peak_lr=float(config.get("peak_lr", 15e-5)),
      batch_size=batch_size,
      # Clamp so the cosine decay span stays positive in 0-step eval-only
      # runs (eval_ae_i1k total_steps=0); no-op for real training.
      total_steps=max(total_steps, warmup_steps + 1),
      warmup_steps=warmup_steps,
      wd=float(config.get("wd", 0.05)),
      betas=tuple(config.get("betas", (0.9, 0.95))),
      clip_norm=float(config.get("clip_norm", 1.0)),
      no_decay_list=tuple(getattr(model, "no_decay_list",
                                  ("cls", "mask_token", "bias"))),
      mu_dtype=config.get("mu_dtype", "bfloat16"))
  opt_shape = jax.eval_shape(tx.init, params_shape)

  if jax.process_index() == 0:
    from small_vision_tpu.utils.trees import tree_size
    mw.measure("num_params", tree_size(params_shape))

  # Shardings.
  repl = parallel.replicated_sharding(mesh)
  params_sharding = parallel.infer_sharding(
      params_shape, mesh, config.get("param_sharding", "replicated"))
  opt_sharding = parallel.infer_sharding(
      opt_shape, mesh, config.get("optim_sharding", "replicated"))

  with activate_mesh(mesh):
    rng_init = parallel.reshard(rng_init, repl)
    params = jax.jit(init, out_shardings=params_sharding)(rng_init)
    if config.get("model_init"):
      # Warm-start from a flat-npz zoo checkpoint (reference train loop's
      # model_init path; models/vit.py:381 load()).
      from small_vision_tpu.models.common import (adapt_block_layout,
                                                  merge_params)
      from small_vision_tpu.utils.checkpoint import load_params_npz
      loaded = adapt_block_layout(
          load_params_npz(config["model_init"]), params)
      params = parallel.reshard(
          merge_params(loaded, jax.device_get(params),
                       dont_load=tuple(config.get("model_load", {}).get(
                           "dont_load", ()))),
          params_sharding)
    opt = jax.jit(tx.init, out_shardings=opt_sharding)(params)
    rng, rng_loop = jax.random.split(rng)
    rng_loop = parallel.reshard(rng_loop, repl)

    gd = gd_lib.GaussianDiffusion.create(
        config.get("diff_schedule", {}).get("beta_schedule", "cosine"),
        int(config.get("diff_schedule", {}).get("timesteps", 1000)))
    gd = parallel.reshard(gd, repl)

    train_state = {"params": params, "opt": opt, "rng": rng_loop, "gd": gd}
    train_state_sharding = {
        "params": params_sharding, "opt": opt_sharding, "rng": repl,
        "gd": jax.tree.map(lambda _: repl, gd)}
    del params, opt, rng_loop

    vae_encode = vae_decode = None
    if config.get("latent_diffusion"):
      from small_vision_tpu.models.vae import load_vae
      vae_params, vae_encode, vae_decode = load_vae(
          config.get("vae_weights"), image_size=int(config.get("size", 256)))
      vae_sharding = parallel.infer_sharding(
          jax.eval_shape(lambda p: p, vae_params), mesh,
          config.get("vae_param_sharding", "replicated"))
      train_state["vae_params"] = parallel.reshard(vae_params, vae_sharding)
      train_state_sharding["vae_params"] = vae_sharding
      del vae_params

    if config.get("ema_decay"):
      train_state["ema_params"] = jax.tree.map(jnp.copy,
                                               train_state["params"])
      train_state_sharding["ema_params"] = params_sharding

    # Checkpoint resume. A finetune run writes to its own subdirectory
    # (reference: checkpoint_finetune.bv, train_ae.py:284-285); on its first
    # start it performs "surgery" on the pretrain checkpoint: fresh label
    # embedder/trunk + fresh optimizer (reference :222-261). Chrono scalars
    # ride along at save time only (the jitted step never sees them).
    ckpt_extra = lambda: {"chrono": chrono.save()}
    ckpt_dir = workdir
    if workdir and config.get("finetune"):
      import os
      ckpt_dir = os.path.join(workdir, "finetune")

    ckpt_mngr = None
    if ckpt_dir and (config.get("save_ckpt", True) or config.get("resume")):
      ckpt_mngr = ckpt_lib.make_manager(
          ckpt_dir, keep_period=get_steps("keep_ckpt", None))
      abstract = ckpt_lib.abstract_like(
          {**train_state, **ckpt_extra()},
          {**train_state_sharding, "chrono": repl})
      restored = ckpt_lib.restore(ckpt_mngr, abstract)
      if restored is not None:
        _info(f"Resumed from step {ckpt_mngr.latest_step()}")
        chrono.load(restored.pop("chrono"))
        train_state = restored
      elif config.get("finetune") or config.get("resume"):
        # First finetune start (or explicit resume path): pull params (+ema)
        # from the pretrain checkpoint, keep fresh label head + optimizer.
        src_dir = config.get("resume") or workdir
        src_mngr = (ckpt_lib.make_manager(src_dir)
                    if src_dir != ckpt_dir else ckpt_mngr)
        if src_mngr.latest_step() is not None:
          _info(f"Finetune surgery from {src_dir} "
                f"step {src_mngr.latest_step()}")
          fresh = ("label_embed", "label_trunk")
          loaded = ckpt_lib.restore_subtree(
              src_mngr, "params",
              ckpt_lib.abstract_like(
                  {k: v for k, v in train_state["params"].items()
                   if k not in fresh},
                  {k: v for k, v in params_sharding.items()
                   if k not in fresh}))
          train_state["params"] = {**train_state["params"], **loaded}
          if "ema_params" in train_state:
            train_state["ema_params"] = jax.tree.map(
                jnp.copy, train_state["params"])
          train_state["opt"] = jax.jit(
              tx.init, out_shardings=opt_sharding)(train_state["params"])

    update_fn = make_update_fn(model, tx, config, device_pp, mesh,
                               train_state_sharding, vae_encode=vae_encode)
    eval_fns = make_eval_fns(model, config, vae_encode=vae_encode,
                             vae_decode=vae_decode)

    # Evaluators (lazy import: the framework needs eval_fns).
    evaluators = []
    if config.get("evals"):
      from small_vision_tpu.evaluators import common as eval_common
      evaluators = eval_common.from_config(
          config, eval_fns, mesh,
          lambda key, cfg: steps(key, cfg, ntrain_img, batch_size,
                                 total_steps, default=None))

    def handle_eval_results(name, prefix, results, step):
      """Logs evaluator outputs; fid_samples get scored + dumped
      (reference train loop :670-712)."""
      for key, value in results:
        if key == "fid_samples":
          samples, ys = value["samples"], value["ys"]
          ref_stats = config.get("inception_reference_path")
          if ref_stats:
            from small_vision_tpu.evaluators.fid import create_fid_score_fn
            fid_fn = create_fid_score_fn(
                config.get("fid_batch_size", 1024), ref_stats,
                config.get("inception_weights"))
            fid_score, is_score = fid_fn(samples)
            mw.measure(f"{prefix}{key}_fid_score", fid_score)
            mw.measure(f"{prefix}{key}_inception_score", is_score)
          if workdir and jax.process_index() == 0:
            import os
            out_dir = os.path.join(workdir, f"{name}_samples")
            os.makedirs(out_dir, exist_ok=True)
            np.savez(os.path.join(out_dir, f"samples_{step}.npz"),
                     samples=samples,
                     ys=ys if ys is not None else np.zeros(0))
        elif key.startswith("image"):
          if workdir and jax.process_index() == 0:
            import os
            from small_vision_tpu.utils.misc import make_grid
            grid = make_grid(value, num_samples=config.get(
                "num_samples", 36))
            out_dir = os.path.join(workdir, "grids")
            os.makedirs(out_dir, exist_ok=True)
            np.save(os.path.join(
                out_dir, f"{name}_{key}_{step}.npy"), grid)
        else:
          mw.measure(f"{prefix}{key}", value)

    first_step = int(jax.device_get(
        optim.get_count(train_state["opt"], jittable=True)))
    chrono.inform(first_step=first_step)
    _info(f"Starting at step {first_step + 1}/{total_steps}")

    if config.get("force_eval") or first_step == total_steps:
      mw.step_start(first_step)
      for (name, evaluator, _, prefix) in evaluators:
        _info(f"{name} evaluation (forced)...")
        handle_eval_results(name, prefix, evaluator.run(train_state),
                            first_step)
      mw.step_end()
      if config.get("force_eval"):
        mw.close()
        return train_state, eval_fns

    log_steps = get_steps("log_training", 100)
    ckpt_steps = get_steps("ckpt", None)

    if first_step and hasattr(train_iter, "start_step"):
      # Deterministic data resume: continue the example stream exactly where
      # the preempted run's step count left off (the reference replays
      # tf.data from scratch instead).
      train_iter.start_step = first_step
    train_it = iter(train_iter)

    if config.get("profile_flops"):
      # Static cost analysis of the compiled step (reference :618-625).
      example_batch = next(train_it)
      compiled = update_fn.lower(train_state, example_batch).compile()
      ca = compiled.cost_analysis()
      ca = ca[0] if isinstance(ca, list) else ca
      gflops = ca.get("flops", 0) / 1e9
      _info(f"Estimated GFLOPs per step: {gflops:.1f}")
      mw.measure("gflops", gflops)

    prof = None
    for step in range(first_step + 1, total_steps + 1):
      batch = next(train_it)
      mw.step_start(step)
      # Heavy parity metrics (l2 norms) only on steps that log them. The
      # variant choice must be HOST-INDEPENDENT (host=None): every process
      # must run the same XLA program or multihost collectives desync.
      metrics_now = itstime(step, log_steps, total_steps)
      log_now = metrics_now and jax.process_index() == 0
      step_fn = getattr(update_fn, "with_l2", update_fn) if metrics_now \
          else update_fn
      with jax.profiler.StepTraceAnnotation("train_step", step_num=step):
        train_state, measurements = step_fn(train_state, batch)

      if config.get("profile") and jax.process_index() == 0:
        from small_vision_tpu.utils.misc import startstop_prof
        prof = startstop_prof(prof, step, first_step, log_steps,
                              workdir=workdir)

      if log_now:
        measurements = jax.device_get(measurements)
        measurements["epochs"] = step * batch_size / ntrain_img
        for name, value in measurements.items():
          mw.measure(name, value)
        chrono.tick(step)
        if not np.isfinite(measurements["training_loss"]):
          raise RuntimeError(
              f"Loss became NaN/Inf within steps "
              f"[{step - log_steps}, {step}]")

      if ckpt_mngr and config.get("save_ckpt", True) and itstime(
          step, ckpt_steps, total_steps, first=False):
        chrono.pause(wait_for=jax.tree.leaves(train_state["params"]))
        from small_vision_tpu.parallel.collectives import broadcast_one_to_all
        ckpt = {**train_state,
                "chrono": broadcast_one_to_all(ckpt_extra()["chrono"])}
        ckpt_lib.save(ckpt_mngr, ckpt, step)
        chrono.resume()

      for (name, evaluator, ev_steps, prefix) in evaluators:
        if itstime(step, ev_steps, total_steps, first=False, last=True):
          chrono.pause(wait_for=jax.tree.leaves(train_state["params"]))
          chrono.tick(step)
          _info(f"{name} evaluation at step {step}...")
          handle_eval_results(name, prefix, evaluator.run(train_state),
                              step)
          chrono.resume()

      mw.step_end()

    if ckpt_mngr:
      ckpt_lib.wait_until_finished(ckpt_mngr)
    mw.close()
    return train_state, eval_fns
