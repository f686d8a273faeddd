"""Linear-probe trainer: frozen AE features → BatchNorm + Dense head.

Parity target: /root/reference/big_vision/trainers/linear_ae.py —
`LinearCLS` = affine-free BatchNorm + Dense (:32-47), frozen AE params
loaded from a pretrain checkpoint (:177-188), optax.lars at lr 0.1·bs/256
warmup-cosine (:199-208), optional noised-input probe at t=50 (:275-281),
stop_gradient on pre_logits so only the head trains (:285-300).
"""

import functools
from typing import Optional

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from small_vision_tpu import optim, parallel
from small_vision_tpu.data import pipeline
from small_vision_tpu.ops import diffusion as gd_lib
from small_vision_tpu.parallel.ctx import activate_mesh
from small_vision_tpu.utils import Chrono, MetricWriter, itstime, steps
from small_vision_tpu.utils import checkpoint as ckpt_lib
from small_vision_tpu.train.train_ae import _info, build_model


class LinearCLS(nn.Module):
  """Affine-free BatchNorm + linear head over the frozen representation."""
  num_classes: int = 1000

  @nn.compact
  def __call__(self, rep, train=True):
    x = nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        use_scale=False, use_bias=False, name="bn")(rep)
    return nn.Dense(self.num_classes)(x)


def load_frozen_backbone(config, model, mesh, workdir_pretrain):
  """Loads AE params (only) from a pretrain checkpoint directory."""
  def init(rng):
    dspace = tuple(config.get("diffusion_space", (64, 64, 3)))
    fake = jnp.zeros((2,) + dspace, jnp.float32)
    ts = jnp.zeros((2,), jnp.int32)
    rngs = {"params": rng, "dropout": rng, "mae_noise": rng, "cfg": rng}
    return flax.core.unfreeze(
        model.init(rngs, fake, t=ts, train=True, mask=0.5))["params"]

  params_shape = jax.eval_shape(init, jax.random.PRNGKey(0))
  sharding = parallel.infer_sharding(
      params_shape, mesh, config.get("param_sharding", "replicated"))

  if workdir_pretrain:
    mngr = ckpt_lib.make_manager(workdir_pretrain)
    return ckpt_lib.restore_subtree(
        mngr, "params", ckpt_lib.abstract_like(params_shape, sharding))
  # No checkpoint: random init (useful for smoke tests).
  return jax.jit(init, out_shardings=sharding)(jax.random.PRNGKey(0))


def train_and_evaluate(config, workdir: Optional[str] = None, mesh=None):
  mesh = mesh or parallel.make_mesh()
  chrono = Chrono()
  mw = MetricWriter(workdir, config)

  batch_size = int(config["input"]["batch_size"])
  train_iter, device_pp, ntrain_img = pipeline.training(
      dict(config["input"]), mesh)
  total_steps = steps("total", config, ntrain_img, batch_size)
  chrono.inform(total_steps=total_steps, global_bs=batch_size,
                steps_per_epoch=ntrain_img / batch_size,
                measure=mw.measure, write_note=_info)

  model = build_model(config)
  use_noised = bool(config.get("use_noised_pred", False))
  num_classes = int(config.get("num_classes", 1000))
  width = int(config.get("width", getattr(model, "width", 768)))
  repl = parallel.replicated_sharding(mesh)

  with activate_mesh(mesh):
    model_params = load_frozen_backbone(
        config, model, mesh, config.get("pretrain_workdir"))

    linear_model = LinearCLS(num_classes=num_classes)
    total_epochs = config.get("total_epochs")
    if total_epochs:
      warmup_steps = max(
          int(0.05 * total_epochs) * ntrain_img // batch_size, 1)
    else:  # Step-denominated config (e.g. runlocal): 5% of total.
      warmup_steps = max(total_steps // 20, 1)
    tx, _ = optim.lars_probe_tx(
        base_lr=float(config.get("peak_lr", 0.1)), batch_size=batch_size,
        total_steps=total_steps, warmup_steps=warmup_steps)

    def head_init(rng):
      rep = jnp.zeros((2, width), jnp.float32)
      variables = flax.core.unfreeze(
          linear_model.init({"params": rng}, rep, train=True))
      return variables["params"], variables["batch_stats"]

    params, batch_stats = jax.jit(
        head_init, out_shardings=(repl, repl))(
            parallel.reshard(jax.random.PRNGKey(1), repl))
    opt = jax.jit(tx.init, out_shardings=repl)(params)

    gd = parallel.reshard(gd_lib.GaussianDiffusion.create(
        config.get("diff_schedule", {}).get("beta_schedule", "cosine"),
        int(config.get("diff_schedule", {}).get("timesteps", 1000))), repl)

    model_params_sharding = jax.tree.map(
        lambda x: x.sharding, model_params)
    train_state = {"params": params, "model_params": model_params,
                   "opt": opt, "batch_stats": batch_stats,
                   "rng": parallel.reshard(jax.random.PRNGKey(2), repl),
                   "gd": gd}
    train_state_sharding = {
        "params": repl, "model_params": model_params_sharding,
        "opt": jax.tree.map(lambda _: repl, opt),
        "batch_stats": repl, "rng": repl,
        "gd": jax.tree.map(lambda _: repl, gd)}
    del params, opt, batch_stats, model_params

    # Probe checkpoint/resume (reference linear_ae.py:62-65,167-188): the
    # probe's own state (head params/opt/bn stats/rng) is saved under
    # {workdir}/probe; the frozen backbone always reloads from the pretrain
    # checkpoint, so it is not duplicated here.
    _PROBE_KEYS = ("params", "opt", "batch_stats", "rng")
    ckpt_mngr = None
    start_step = 0
    if workdir and config.get("save_ckpt", True):
      import os
      ckpt_mngr = ckpt_lib.make_manager(os.path.join(workdir, "probe"))
      saveable = {k: train_state[k] for k in _PROBE_KEYS}
      abstract = ckpt_lib.abstract_like(
          saveable, jax.tree.map(lambda x: x.sharding, saveable))
      restored = ckpt_lib.restore(ckpt_mngr, abstract)
      if restored is not None:
        train_state.update(restored)
        start_step = ckpt_mngr.latest_step()
        _info(f"Probe resumed from step {start_step}")

    def backbone_rep(train_state, images, rng):
      """Frozen forward (t=0, or t=50 noised) → stop-gradient pre_logits."""
      b = images.shape[0]
      if use_noised:
        t = jnp.full((b,), 50, jnp.int32)
        noise = jax.random.normal(rng, images.shape)
        images = gd_lib.q_sample(train_state["gd"], images, t, noise)
        t_in = t + 1
      else:
        t_in = jnp.zeros((b,), jnp.int32)
      _, out = model.apply({"params": train_state["model_params"]},
                           images, t=t_in, train=False)
      return jax.lax.stop_gradient(out["pre_logits"])

    @functools.partial(jax.jit, donate_argnums=(0,),
                       out_shardings=(train_state_sharding, repl))
    def update_fn(train_state, batch):
      rng = train_state["rng"]
      rng, pp_rng, noise_rng = jax.random.split(rng, 3)
      if device_pp is not None:
        batch = device_pp(dict(batch), pp_rng)
      labels = batch["labels"] if "labels" in batch else batch["label"]
      if labels.ndim == 1:
        labels = jax.nn.one_hot(labels, num_classes)

      rep = backbone_rep(train_state, batch["image"], noise_rng)
      batch_stats = train_state["batch_stats"]

      def loss_fn(params):
        logits, new_state = linear_model.apply(
            {"params": params, "batch_stats": batch_stats}, rep,
            mutable=["batch_stats"], train=True)
        loss = optax.softmax_cross_entropy(logits, labels).mean()
        acc = jnp.mean(jnp.argmax(logits, -1) == jnp.argmax(labels, -1))
        return loss, {"batch_stats": new_state["batch_stats"], "acc": acc}

      params, opt = train_state["params"], train_state["opt"]
      (loss, aux), grads = jax.value_and_grad(
          loss_fn, has_aux=True)(params)
      updates, opt = tx.update(grads, opt, params)
      params = optax.apply_updates(params, updates)
      new_state = {**train_state, "params": params, "opt": opt, "rng": rng,
                   "batch_stats": aux["batch_stats"]}
      return new_state, {"training_loss": loss,
                         "training_accuracy": aux["acc"]}

    def eval_logits_fn(train_state, batch):
      """Classification-evaluator predict fn (train=False, running stats)."""
      rng = train_state["rng"]
      _, noise_rng = jax.random.split(rng)
      rep = backbone_rep(train_state, batch["image"], noise_rng)
      logits = linear_model.apply(
          {"params": train_state["params"],
           "batch_stats": train_state["batch_stats"]}, rep, train=False)
      return logits, {}

    eval_fns = {"predict": eval_logits_fn}
    evaluators = []
    if config.get("evals"):
      from small_vision_tpu.evaluators import common as eval_common
      evaluators = eval_common.from_config(
          config, eval_fns, mesh,
          lambda key, cfg: steps(key, cfg, ntrain_img, batch_size,
                                 total_steps, default=None))

    log_steps = steps("log_training", config, ntrain_img, batch_size,
                      total_steps, default=100)
    ckpt_steps = steps("ckpt", config, ntrain_img, batch_size, total_steps,
                       default=None)
    if start_step and hasattr(train_iter, "start_step"):
      train_iter.start_step = start_step  # deterministic data resume
    train_it = iter(train_iter)
    for step in range(start_step + 1, total_steps + 1):
      batch = next(train_it)
      mw.step_start(step)
      train_state, measurements = update_fn(train_state, batch)
      if itstime(step, log_steps, total_steps, host=0):
        measurements = jax.device_get(measurements)
        for name, value in measurements.items():
          mw.measure(name, value)
        chrono.tick(step)
        if not np.isfinite(measurements["training_loss"]):
          raise RuntimeError("Probe loss became NaN/Inf")
      if ckpt_mngr and itstime(step, ckpt_steps, total_steps, first=False,
                               last=True):
        chrono.pause(wait_for=train_state["params"])
        ckpt_lib.save(ckpt_mngr,
                      {k: train_state[k] for k in _PROBE_KEYS}, step)
        chrono.resume()
      for (name, evaluator, ev_steps, prefix) in evaluators:
        if itstime(step, ev_steps, total_steps, first=False, last=True):
          for key, value in evaluator.run(train_state):
            mw.measure(f"{prefix}{key}", value)
      mw.step_end()

    if ckpt_mngr:
      ckpt_lib.wait_until_finished(ckpt_mngr)
    mw.close()
    return train_state, eval_fns
