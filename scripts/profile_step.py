"""Capture an xprof trace of the native train step and print the op breakdown.

Usage: python scripts/profile_step.py [native|reference|sampler] [out_dir]

Writes the raw xplane trace under out_dir (default /tmp/sv_profile) and prints
a per-op-category time table aggregated from the trace, so kernel-level
optimization work has real numbers instead of guesses (VERDICT round-1 weak
item: sampler had no roofline analysis).
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

MODE = sys.argv[1] if len(sys.argv) > 1 else "native"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sv_profile"


def run_traced(step, n_trace=3):
  for _ in range(2):
    step()
  jax.profiler.start_trace(OUT)
  t0 = time.perf_counter()
  for _ in range(n_trace):
    step()
  dt = (time.perf_counter() - t0) / n_trace
  jax.profiler.stop_trace()
  return dt


def main():
  import bench

  if MODE in ("native", "reference"):
    update_fn, train_state, batch, host_batch, mesh = bench._build_step(
        MODE, 256, attn_impl="pallas" if MODE == "native" else "xla")
    state = train_state

    def step():
      nonlocal state
      state, m = update_fn(state, batch)
      float(jax.device_get(m["training_loss"]))

  elif MODE == "sampler":
    sample_fn, ts = _build_sampler()

    def step():
      out = sample_fn(ts, jax.random.PRNGKey(2))
      float(np.asarray(
          jax.device_get(out["fid_samples"][0, 0, 0, 0]), np.float32))

  dt = run_traced(step)
  print(f"{MODE}: {dt * 1e3:.1f} ms/iter")
  report(OUT)


def _build_sampler():
  import jax.numpy as jnp
  import ml_collections as mlc
  from small_vision_tpu.ops import diffusion as gd_lib
  from small_vision_tpu.train import train_ae

  config = mlc.ConfigDict()
  config.diffusion_space = (64, 64, 3)
  config.num_samples_per_call = 64
  config.num_samples = 16
  config.use_labels = False
  config.num_classes = None
  config.diff_schedule = dict(beta_schedule="cosine", timesteps=1000,
                              sampling_timesteps=125, eta=1.0,
                              clip_denoised=True)
  config.mask_ratio_no_noise = 0.75
  config.model = dict(variant="B/4", img_size=64, scan=True, adaln=True,
                      dtype_mm="bfloat16", attn_impl="pallas")
  model = train_ae.build_model(config)
  rng = jax.random.PRNGKey(0)
  x = jnp.zeros((2, 64, 64, 3))
  rngs = {"params": rng, "dropout": rng, "mae_noise": rng, "cfg": rng}
  params = model.init(rngs, x, t=jnp.zeros((2,), jnp.int32))["params"]
  gd = gd_lib.GaussianDiffusion.create("cosine", 1000)
  ts = {"params": params, "gd": gd, "rng": rng}
  eval_fns = train_ae.make_eval_fns(model, config)
  return jax.jit(eval_fns["uncond_eps"]), ts


def report(out_dir, group_chars=60, top=40):
  """Aggregate device-plane event self-time by op name from the xplane trace.

  Parses the raw xplane proto directly (the installed tensorboard profile
  plugin predates TF 2.21's pywrap API, so its converters don't load).
  """
  from tensorflow.tsl.profiler.protobuf import xplane_pb2
  paths = sorted(glob.glob(os.path.join(
      out_dir, "plugins/profile/*/*.xplane.pb")), key=os.path.getmtime)
  if not paths:
    print("no xplane trace found under", out_dir)
    return
  xs = xplane_pb2.XSpace()
  with open(paths[-1], "rb") as f:
    xs.ParseFromString(f.read())
  for plane in xs.planes:
    if "TPU" not in plane.name and "/device" not in plane.name.lower():
      continue
    meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
    agg, n_ev = {}, {}
    t_lo, t_hi = float("inf"), 0.0
    for line in plane.lines:
      # Exactly the synchronous op timeline: "Async XLA Ops" carries
      # overlapped VMEM-prefetch copy-start/copy-done pairs (double-counts
      # wall time), and "Steps"/"XLA Modules" are whole-program envelopes.
      if line.name != "XLA Ops":
        continue
      for ev in line.events:
        name = meta.get(ev.metadata_id, "?")
        agg[name] = agg.get(name, 0.0) + ev.duration_ps / 1e6  # → µs
        n_ev[name] = n_ev.get(name, 0) + 1
        start = line.timestamp_ns * 1e3 + ev.offset_ps / 1.0
        t_lo = min(t_lo, start)
        t_hi = max(t_hi, start + ev.duration_ps)
    if not agg:
      continue
    total = sum(agg.values())
    wall = (t_hi - t_lo) / 1e6 if t_hi > t_lo else 0.0
    print(f"\n== {plane.name}: busy {total / 1e3:.2f} ms over "
          f"{wall / 1e3:.2f} ms traced ({100 * total / max(wall, 1):.0f}% "
          "duty) ==")
    groups = {}
    for name, t in agg.items():
      groups.setdefault(_op_group(name), [0.0, 0])[0] += t
      groups[_op_group(name)][1] += n_ev[name]
    print("-- by group --")
    for g, (t, n) in sorted(groups.items(), key=lambda kv: -kv[1][0])[:20]:
      print(f"{t / 1e3:9.3f} ms  {100 * t / total:5.1f}%  n={n:<6d} {g}")
    print("-- top ops --")
    for name, t in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
      print(f"{t / 1e3:9.3f} ms  {100 * t / total:5.1f}%  n={n_ev[name]:<5d}"
            f" {name[:group_chars + 50]}")


def _op_group(name):
  """Coarse bucket for an XLA/Mosaic op name."""
  n = name.lower()
  for pat, g in (
      ("custom-call", "custom-call (pallas / etc)"),
      ("convolution", "convolution"),
      ("dot", "matmul"),
      ("fusion", "fusion (elementwise/reduce)"),
      ("copy", "copy/layout"),
      ("transpose", "transpose"),
      ("reduce", "reduce"),
      ("all-reduce", "collective"),
      ("dynamic", "dynamic-slice/update"),
      ("select", "select"),
      ("scatter", "scatter"),
      ("gather", "gather"),
      ("rng", "rng"),
      ("convert", "convert"),
      ("iota", "iota"),
      ("broadcast", "broadcast"),
      ("constant", "constant"),
      ("infeed", "infeed"),
      ("outfeed", "outfeed"),
  ):
    if pat in n:
      return g
  return "other"


if __name__ == "__main__":
  main()
