"""AOT sampler export for serving (`jax.export`).

Produces a self-contained deployable artifact: the jitted DDIM sampler
(uncond / class-conditional / CFG, optionally int8-quantized) with the
checkpoint's EMA weights baked in as constants, serialized with
`jax.export`. Deserializing needs only jax — no model code, no config, no
checkpoint tree — and runs on the platform(s) the artifact was lowered for:

  python -m small_vision_tpu.tools.export_sampler \\
      --config ae_i1k.py:variant=B/4,use_labels=True,quant=int8_all \\
      --workdir /path/to/train_run --fn cfg_eps_2.0 --batch_size 64 \\
      --out /path/to/sampler.jaxexport

  # at the serving site:
  from small_vision_tpu.tools.export_sampler import load_exported
  sample = load_exported("/path/to/sampler.jaxexport")
  images = sample(seed)           # uint8 [B, H, W, 3]

The reference is a training repo with no serving/export surface (its
sampling exists only inside evaluators, big_vision
evaluators/diffusion_sampling.py + trainers/train_ae.py:485-529); this is
the TPU-native production path from a training workdir to a single file a
serving fleet can run.
"""

import argparse
import os

import jax
import jax.numpy as jnp


def abstract_params(model, config):
  """Shape/dtype tree of the model's params (mirrors the trainer's init)."""
  import flax

  def init(rng):
    dspace = tuple(config.get("diffusion_space", (64, 64, 3)))
    fake = jnp.zeros((2,) + dspace, jnp.float32)
    ts = jnp.zeros((2,), jnp.int32)
    rngs = {"params": rng, "dropout": rng, "mae_noise": rng, "cfg": rng}
    return flax.core.unfreeze(model.init(
        rngs, fake, t=ts, train=True,
        mask=float(config.get("mask_ratio_no_noise", 0.75)) or 0.5))["params"]

  return jax.eval_shape(init, jax.random.PRNGKey(0))


def load_params(config, workdir, *, use_ema=True, model=None):
  """(EMA) params from the latest committed checkpoint in `workdir`.

  Falls back from ema_params to params when the run kept no EMA. Arrays are
  restored host-local and unsharded (serving loads onto its own topology).
  """
  from small_vision_tpu.train import train_ae
  from small_vision_tpu.utils import checkpoint as ckpt_lib

  model = model or train_ae.build_model(config)
  abstract = abstract_params(model, config)
  mngr = ckpt_lib.make_manager(workdir)  # manager reads {workdir}/checkpoints
  step = ckpt_lib.latest_step(mngr)
  if step is None:
    raise FileNotFoundError(f"no committed checkpoint under {workdir}")
  keys = ("ema_params", "params") if use_ema else ("params",)
  err = None
  for key in keys:
    try:
      return ckpt_lib.restore_subtree(mngr, key, abstract), step, key
    except Exception as e:  # noqa: BLE001 — key absent in this checkpoint.
      err = e
  raise KeyError(f"none of {keys} restorable from step {step}: {err}")


def build_sample_callable_p(config, *, fn="uncond_eps", batch_size=None):
  """(params, rng(uint32[2])) -> uint8 images [B,H,W,C].

  `fn` is any key of the trainer's predict-fn suite (uncond_eps, cond_eps,
  cfg_eps_1.5, ...). The returned callable is pure and jit/export-ready.
  """
  from small_vision_tpu.ops import diffusion as gd_lib
  from small_vision_tpu.train import train_ae

  if batch_size:
    config.num_samples_per_call = int(batch_size)
  model = train_ae.build_model(config)
  eval_fns = train_ae.make_eval_fns(model, config)
  if fn not in eval_fns:
    raise KeyError(f"unknown sampler fn {fn!r}; available: "
                   f"{sorted(k for k in eval_fns if 'eps' in k or 'x0' in k)}")
  sample_fn = eval_fns[fn]
  sched = dict(config.get("diff_schedule", {}))
  gd = gd_lib.GaussianDiffusion.create(
      sched.get("beta_schedule", "cosine"), int(sched.get("timesteps", 1000)))

  def sample(params, rng):
    state = {"params": params, "gd": gd, "rng": rng}
    return sample_fn(state, rng)["fid_samples"]

  return sample


def build_sample_callable(config, params, *, fn="uncond_eps",
                          batch_size=None):
  """rng(uint32[2]) -> uint8 images [B,H,W,C], weights closed over."""
  sample_p = build_sample_callable_p(config, fn=fn, batch_size=batch_size)
  return lambda rng: sample_p(params, rng)


def export_sampler(config, params, out_path, *, fn="uncond_eps",
                   batch_size=None, platforms=None,
                   allow_custom_calls=("tpu_custom_call",),
                   weights_mode="baked", weights_out=None,
                   weights_dtype=None):
  """Serializes the sampler with jax.export; returns the Exported.

  `weights_mode`:
    - "baked": weights are constants inside the artifact — one fully
      self-contained file, but the StableHLO module carries the full
      parameter bytes (~700 MB at UMD-B f32), which every compile at the
      serving site must re-ingest. Right for small models / edge bundles.
    - "arg": the exported callable takes (params, rng); the artifact is a
      few MB of program and the weights ship separately (`weights_out`
      writes them as a flat .npz, the reference zoo format,
      utils/checkpoint.py save_params_npz). The serving site device_puts
      weights ONCE and reuses them across calls — the production-right
      split (weights rotate independently of the program artifact).

  `weights_dtype` (arg mode only): storage dtype for floating weight leaves
  (e.g. "bfloat16" — halves the sidecar .npz and the serving site's
  host->device weight transfer). The exported program takes weights in this
  dtype and casts each leaf back to its training dtype as its FIRST op, so
  the compute graph is identical to the full-precision artifact; the only
  numerics delta is the one-time storage rounding (parity asserted in
  tests/test_serving.py::test_arg_mode_bf16_sidecar_parity).

  `allow_custom_calls`: custom-call targets to exempt from jax.export's
  forward-compatibility check. The Pallas attention kernels lower to
  `tpu_custom_call`, which carries no cross-libtpu-version guarantee — fine
  when the serving fleet pins the same libtpu as the exporter (the normal
  production setup); pass `attn_impl=xla` in the config for an artifact
  with no custom calls at all.
  """
  from jax import export as jexport

  rng_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)
  disabled = [jexport.DisabledSafetyCheck.custom_call(t)
              for t in (allow_custom_calls or ())]
  if weights_mode == "baked":
    sample = build_sample_callable(config, params, fn=fn,
                                   batch_size=batch_size)
    exp = jexport.export(jax.jit(sample), platforms=platforms,
                         disabled_checks=disabled)(rng_spec)
  elif weights_mode == "arg":
    sample_p = build_sample_callable_p(config, fn=fn, batch_size=batch_size)
    if weights_dtype:
      store = jnp.dtype(weights_dtype)
      orig_dtypes = jax.tree.map(lambda l: l.dtype, params)
      inner = sample_p

      def sample_p(p, rng):  # noqa: F811 — storage->training dtype restore.
        restored = jax.tree.map(lambda x, d: x.astype(d), p, orig_dtypes)
        return inner(restored, rng)

      def storage_dtype(l):
        return store if jnp.issubdtype(l.dtype, jnp.floating) else l.dtype
    else:
      def storage_dtype(l):
        return l.dtype
    param_specs = jax.tree.map(
        lambda l: jax.ShapeDtypeStruct(l.shape, storage_dtype(l)), params)
    exp = jexport.export(jax.jit(sample_p), platforms=platforms,
                         disabled_checks=disabled)(param_specs, rng_spec)
    if weights_out:
      from small_vision_tpu.utils import checkpoint as ckpt_lib
      ckpt_lib.save_params_npz(
          weights_out, params,
          cast_floating=jnp.dtype(weights_dtype) if weights_dtype else None)
  else:
    raise ValueError(f"weights_mode must be 'baked' or 'arg', "
                     f"got {weights_mode!r}")
  blob = exp.serialize()
  if out_path:
    with open(out_path, "wb") as f:
      f.write(blob)
  return exp


def load_exported_keyed(path, weights=None):
  """Deserializes an exported sampler into `f(key: uint32[2]) -> uint8[B...]`.

  Needs only jax at the serving site (plus numpy for .npz weights). For an
  arg-mode artifact pass `weights`: a params pytree or a path to the .npz
  written by `export_sampler(..., weights_out=...)`; they are device_put
  once here and bound into the returned callable, reused across calls.
  """
  from jax import export as jexport

  with open(path, "rb") as f:
    exp = jexport.deserialize(f.read())

  takes_params = len(exp.in_avals) > 1
  if takes_params:
    if weights is None:
      raise ValueError(
          f"{path} was exported with weights_mode='arg'; pass weights= "
          "(a params pytree or a .npz path from weights_out)")
    if isinstance(weights, (str, os.PathLike)):
      from small_vision_tpu.utils import checkpoint as ckpt_lib
      weights = ckpt_lib.load_params_npz(weights)
    weights = jax.device_put(weights)
    return lambda key: exp.call(weights, key)
  if weights is not None:
    raise ValueError(f"{path} is a baked-weights artifact; weights= "
                     "must not be passed")
  return exp.call


def load_exported(path, weights=None):
  """Deserializes an exported sampler into `sample(seed:int) -> uint8[B...]`.

  See `load_exported_keyed` for the weights= contract.
  """
  keyed = load_exported_keyed(path, weights=weights)
  return lambda seed: keyed(jax.random.PRNGKey(seed))


def main(argv=None):
  parser = argparse.ArgumentParser()
  parser.add_argument("--config", required=True)
  parser.add_argument("--workdir", required=True)
  parser.add_argument("--out", required=True)
  parser.add_argument("--fn", default="uncond_eps")
  parser.add_argument("--batch_size", type=int, default=64)
  parser.add_argument("--no_ema", action="store_true")
  parser.add_argument("--platforms", default="",
                      help="comma list (e.g. tpu,cpu); default: current")
  parser.add_argument("--weights_mode", default="baked",
                      choices=("baked", "arg"))
  parser.add_argument("--weights_out", default="",
                      help="arg mode: also write weights as flat .npz here")
  parser.add_argument("--weights_dtype", default="",
                      help="arg mode: storage dtype for floating weights "
                           "(e.g. bfloat16 — halves the sidecar)")
  args = parser.parse_args(argv)

  from small_vision_tpu.cli import parse_config
  config = parse_config(args.config)
  params, step, key = load_params(config, args.workdir,
                                  use_ema=not args.no_ema)
  platforms = [p for p in args.platforms.split(",") if p] or None
  export_sampler(config, params, args.out, fn=args.fn,
                 batch_size=args.batch_size, platforms=platforms,
                 weights_mode=args.weights_mode,
                 weights_out=args.weights_out or None,
                 weights_dtype=args.weights_dtype or None)
  size = os.path.getsize(args.out)
  print(f"exported {args.fn} (weights: {key} @ step {step}, "
        f"{args.weights_mode}) bs={args.batch_size} -> {args.out} "
        f"({size / 1e6:.1f} MB)")


if __name__ == "__main__":
  main()
