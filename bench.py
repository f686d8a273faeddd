"""Throughput bench: UMD-B/4 @ 64px training step on the local chip(s).

Prints ONE JSON line:
  {"metric": "train imgs/sec/chip (UMD-B/4@64)", "value": N,
   "unit": "imgs/sec/chip", "vs_baseline": R, ...extras}

`vs_baseline` compares the TPU-native configuration (bf16 matmuls, fused
device pp, donated buffers) against a same-chip run in the reference's
compute configuration (fp32 matmuls — /root/reference/big_vision/models/
ae.py:51 `dtype_mm="float32"` default), since the reference publishes no
throughput numbers (BASELINE.md).

Env knobs: SV_BENCH_BATCH (default 256), SV_BENCH_STEPS (default 20),
SV_BENCH_SKIP_BASELINE=1, SV_BENCH_SAMPLER=0.
"""

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _build_step(dtype_mm: str, batch_size: int, attn_impl: str = "xla"):
  import ml_collections as mlc
  from small_vision_tpu import optim, parallel
  from small_vision_tpu.ops import diffusion as gd_lib
  from small_vision_tpu.train import train_ae

  config = mlc.ConfigDict()
  config.diffusion_space = (64, 64, 3)
  config.no_noise_prob = 0.5
  config.mask_ratio = 0.375
  config.mask_ratio_no_noise = 0.75
  config.use_labels = False
  config.diff_schedule = dict(beta_schedule="cosine", timesteps=1000)
  config.model = dict(variant="B/4", img_size=64, scan=True, adaln=True,
                      dtype_mm=dtype_mm, attn_impl=attn_impl,
                      remat_policy="nothing_saveable")

  mesh = parallel.make_mesh()
  model = train_ae.build_model(config)

  def init(rng):
    fake = jnp.zeros((batch_size,) + (64, 64, 3), jnp.float32)
    ts = jnp.zeros((batch_size,), jnp.int32)
    rngs = {"params": rng, "dropout": rng, "mae_noise": rng, "cfg": rng}
    return model.init(rngs, fake, t=ts, train=True, mask=0.75)["params"]

  tx, _ = optim.adamw_trainer_tx(
      peak_lr=15e-5, batch_size=batch_size, total_steps=1000,
      warmup_steps=50, wd=0.05)

  repl = parallel.replicated_sharding(mesh)
  params_shape = jax.eval_shape(init, jax.random.PRNGKey(0))
  params_sharding = parallel.infer_sharding(params_shape, mesh, "replicated")
  opt_sharding = parallel.infer_sharding(
      jax.eval_shape(tx.init, params_shape), mesh, "replicated")

  params = jax.jit(init, out_shardings=params_sharding)(
      parallel.reshard(jax.random.PRNGKey(0), repl))
  opt = jax.jit(tx.init, out_shardings=opt_sharding)(params)
  gd = parallel.reshard(
      gd_lib.GaussianDiffusion.create("cosine", 1000), repl)
  train_state = {"params": params, "opt": opt,
                 "rng": parallel.reshard(jax.random.PRNGKey(1), repl),
                 "gd": gd}
  train_state_sharding = {"params": params_sharding, "opt": opt_sharding,
                          "rng": repl, "gd": jax.tree.map(lambda _: repl, gd)}

  # Device pp (uint8 → flip → value_range) fused into the step, as in
  # training; the reference did this work on the host CPU instead.
  from small_vision_tpu.pp.builder import get_preprocess_fn
  import small_vision_tpu.pp.ops_general  # noqa: F401
  import small_vision_tpu.pp.ops_image  # noqa: F401
  _, device_pp = get_preprocess_fn('flip_lr|value_range(-1, 1)')

  update_fn = train_ae.make_update_fn(
      model, tx, config, device_pp, mesh, train_state_sharding)

  rng = np.random.default_rng(0)
  batch = {"image": rng.integers(0, 256, (batch_size, 64, 64, 3),
                                 dtype=np.uint8)}
  batch = jax.tree.map(
      lambda x: jax.make_array_from_process_local_data(
          parallel.batch_sharding(mesh), x), batch)
  return update_fn, train_state, batch, model, mesh


def _time_train(dtype_mm, batch_size, steps, attn_impl="xla"):
  update_fn, train_state, batch, _, _ = _build_step(
      dtype_mm, batch_size, attn_impl)
  fresh = lambda: jax.tree.map(jnp.copy, batch)
  # Warmup/compile. NOTE: on the tunneled 'axon' backend, block_until_ready
  # on an output does not reliably cover compile+execute, so we device_get a
  # scalar each step — an honest sync that trainers do on log steps anyway.
  for _ in range(3):
    train_state, m = update_fn(train_state, fresh())
    float(jax.device_get(m["training_loss"]))
  t0 = time.perf_counter()
  loss = 0.0
  for _ in range(steps):
    train_state, m = update_fn(train_state, fresh())
    loss = float(jax.device_get(m["training_loss"]))
  dt = time.perf_counter() - t0
  assert np.isfinite(loss), f"bench loss not finite: {loss}"
  return batch_size * steps / dt


def _time_sampler(batch_size=64, sampling_steps=125):
  """125-step DDIM sampler imgs/sec (the FID-10k path)."""
  from small_vision_tpu.ops import diffusion as gd_lib
  from small_vision_tpu.train import train_ae
  import ml_collections as mlc

  config = mlc.ConfigDict()
  config.diffusion_space = (64, 64, 3)
  config.num_samples_per_call = batch_size
  config.num_samples = 16
  config.use_labels = False
  config.num_classes = None
  config.diff_schedule = dict(beta_schedule="cosine", timesteps=1000,
                              sampling_timesteps=sampling_steps, eta=1.0,
                              clip_denoised=True)
  config.mask_ratio_no_noise = 0.75
  config.model = dict(variant="B/4", img_size=64, scan=True, adaln=True,
                      dtype_mm="bfloat16")

  model = train_ae.build_model(config)
  rng = jax.random.PRNGKey(0)
  x = jnp.zeros((2, 64, 64, 3))
  rngs = {"params": rng, "dropout": rng, "mae_noise": rng, "cfg": rng}
  params = model.init(rngs, x, t=jnp.zeros((2,), jnp.int32))["params"]
  gd = gd_lib.GaussianDiffusion.create("cosine", 1000)
  train_state = {"params": params, "gd": gd, "rng": rng}

  eval_fns = train_ae.make_eval_fns(model, config)
  sample_fn = jax.jit(eval_fns["uncond_eps"])
  out = sample_fn(train_state, jax.random.PRNGKey(1))  # compile
  jax.block_until_ready(out["fid_samples"])
  t0 = time.perf_counter()
  out = sample_fn(train_state, jax.random.PRNGKey(2))
  jax.block_until_ready(out["fid_samples"])
  dt = time.perf_counter() - t0
  return batch_size / dt


def main():
  batch = int(os.environ.get("SV_BENCH_BATCH", 256))
  steps = int(os.environ.get("SV_BENCH_STEPS", 20))
  n_chips = jax.device_count()

  native = _time_train("bfloat16", batch, steps)
  extras = {}

  if os.environ.get("SV_BENCH_SKIP_BASELINE", "0") != "1":
    ref_mode = _time_train("float32", batch, max(steps // 2, 5))
    extras["ref_mode_fp32_imgs_per_sec_per_chip"] = round(
        ref_mode / n_chips, 2)
    vs_baseline = native / ref_mode
  else:
    vs_baseline = 1.0

  if os.environ.get("SV_BENCH_SAMPLER", "1") != "0":
    extras["sampler_125step_imgs_per_sec"] = round(_time_sampler(), 3)

  print(json.dumps({
      "metric": "train imgs/sec/chip (UMD-B/4@64)",
      "value": round(native / n_chips, 2),
      "unit": "imgs/sec/chip",
      "vs_baseline": round(vs_baseline, 3),
      "batch_size": batch,
      "n_chips": n_chips,
      "device": jax.devices()[0].device_kind,
      **extras,
  }))


if __name__ == "__main__":
  main()
