"""Serving-path benchmark on the real chip.

Measures the production sampling story end-to-end:
  1. export: UMD-B/4 CFG-less sampler (125-step DDIM, int8_all quant,
     bs64) -> jax.export artifact in weights_mode="arg" (program-only
     artifact + .npz weights sidecar); reports export time and sizes.
  2. artifact throughput: deserialized exp.call (weights device_put once)
     timed over N calls — should match bench.py's
     sampler_125step_imgs_per_sec_int8 (the artifact adds no overhead vs
     the live jit).
  3. service latency: the SamplerServer dynamic-batching loop under
     concurrent mixed-size requests — throughput, mean/p95 request
     latency, mean batch fill.

weights_mode="baked" at UMD-B scale was measured unusable through the
tunneled chip: the 697 MB constants-in-module StableHLO blob ran >25 min
in remote_compile and then broke the tunnel's HTTP pipe. Baked mode stays
for small/edge bundles; arg mode is the production default.

Writes perf/serving_bench.json and prints one JSON line.

Usage (chip must be free):  python scripts/serving_bench.py
"""

import json
import os
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
  import jax
  os.makedirs(os.path.join(REPO, ".jax_cache"), exist_ok=True)
  jax.config.update("jax_compilation_cache_dir",
                    os.path.join(REPO, ".jax_cache"))

  from small_vision_tpu.cli import parse_config
  from small_vision_tpu.tools import export_sampler, serve

  quant = os.environ.get("SV_SERVE_QUANT", "int8_all")
  bs = int(os.environ.get("SV_SERVE_BS", 64))
  config = parse_config(
      f"ae_i1k.py:variant=B/4,size=64,data=synthetic"
      + (f",quant={quant}" if quant else ""))
  config.num_samples_per_call = bs
  from small_vision_tpu.train import train_ae
  model = train_ae.build_model(config)
  abstract = export_sampler.abstract_params(model, config)
  rngn = np.random.default_rng(0)
  import jax.numpy as jnp
  params = jax.tree.map(
      lambda l: jnp.asarray(rngn.normal(0, 0.02, l.shape).astype(l.dtype)),
      abstract)

  # 1. export (arg mode: program artifact + weights sidecar)
  path = "/tmp/sampler_bench.jaxexport"
  wts = "/tmp/sampler_bench_weights.npz"
  t0 = time.perf_counter()
  export_sampler.export_sampler(config, params, path, fn="uncond_eps",
                                batch_size=bs, weights_mode="arg",
                                weights_out=wts, weights_dtype="bfloat16")
  export_s = time.perf_counter() - t0
  size_mb = os.path.getsize(path) / 1e6
  weights_mb = os.path.getsize(wts) / 1e6

  # 2. artifact throughput — median defended by the shared window
  # requalification (utils/windows.py; VERDICT r4 task 4).
  from small_vision_tpu.utils import windows as win
  sample = export_sampler.load_exported(path, weights=wts)
  np.asarray(sample(0))  # compile/warm
  seed = {"i": 0}

  def artifact_windows(n):
    rates = []
    for _ in range(n):
      seed["i"] += 1
      t0 = time.perf_counter()
      np.asarray(sample(seed["i"]))
      rates.append(bs / (time.perf_counter() - t0))
    return rates

  rates, art_qual = win.requalify(artifact_windows, windows=3)
  artifact_rate = float(np.median(rates))

  # 3. service under concurrent load
  keyed = export_sampler.load_exported_keyed(path, weights=wts)
  srv = serve.SamplerServer(keyed, bs, max_wait_ms=100.0)
  srv.sample(1, seed=0)  # warm
  lat = []
  lock = threading.Lock()
  sizes = [16, 32, 8, 64, 24, 40, 16, 48, 64, 32, 8, 56]  # 408 imgs

  def client(n):
    t0 = time.perf_counter()
    out = srv.sample(n, timeout=600)
    assert out.shape[0] == n
    with lock:
      lat.append((time.perf_counter() - t0) * 1e3)

  t0 = time.perf_counter()
  threads = [threading.Thread(target=client, args=(n,)) for n in sizes]
  for t in threads:
    t.start()
    time.sleep(0.05)  # staggered arrivals, like real traffic
  for t in threads:
    t.join(600)
  wall = time.perf_counter() - t0
  srv.close()

  # 4. saturated service: K clients keep mixed-size work outstanding until
  # an image budget drains — the batcher should coalesce near-full batches
  # (closes the fill gap the staggered arm leaves: fill 0.71 -> >=0.95).
  srv2 = serve.SamplerServer(keyed, bs, max_wait_ms=100.0)
  srv2.sample(1, seed=0)  # warm
  sat_lat = []
  budget = {"left": 1024, "i": 0}
  sat_sizes = [16, 32, 8, 64, 24, 40, 48, 56]

  def sat_client():
    while True:
      with lock:
        if budget["left"] <= 0:
          return
        n = min(sat_sizes[budget["i"] % len(sat_sizes)], budget["left"])
        budget["i"] += 1
        budget["left"] -= n
      t0 = time.perf_counter()
      out = srv2.sample(n, timeout=600)
      assert out.shape[0] == n
      with lock:
        sat_lat.append((time.perf_counter() - t0) * 1e3)

  sat_total = budget["left"]
  t0 = time.perf_counter()
  sat_threads = [threading.Thread(target=sat_client) for _ in range(6)]
  for t in sat_threads:
    t.start()
  for t in sat_threads:
    t.join(900)
  sat_wall = time.perf_counter() - t0
  srv2.close()

  total_imgs = sum(sizes)
  result = {
      "metric": "serving (125-step DDIM, UMD-B/4@64, bs%d, %s)" % (
          bs, quant or "bf16"),
      "weights_mode": "arg",
      "artifact_mb": round(size_mb, 1),
      "weights_mb": round(weights_mb, 1),
      "export_s": round(export_s, 1),
      "artifact_imgs_per_sec": round(artifact_rate, 2),
      "artifact_windows": [round(r, 2) for r in rates],
      "artifact_spread_pct": round(win.spread_pct(rates), 2),
      **{f"artifact_{k}": v for k, v in art_qual.items()},
      "service_imgs_per_sec": round(total_imgs / wall, 2),
      "service_latency_ms_mean": round(float(np.mean(lat)), 1),
      "service_latency_ms_p95": round(float(np.percentile(lat, 95)), 1),
      "service_batches": srv.stats["batches"],
      "service_batch_fill_mean": round(
          srv.stats["batch_fill_sum"] / max(srv.stats["batches"], 1), 3),
      "n_requests": len(sizes), "total_imgs": total_imgs,
      "saturated_imgs_per_sec": round(sat_total / sat_wall, 2),
      "saturated_total_imgs": sat_total,
      "saturated_batch_fill_mean": round(
          srv2.stats["batch_fill_sum"] / max(srv2.stats["batches"], 1), 3),
      "saturated_latency_ms_p95": round(
          float(np.percentile(sat_lat, 95)), 1) if sat_lat else None,
  }
  out = os.path.join(REPO, "perf", "serving_bench.json")
  with open(out, "w") as f:
    json.dump(result, f, indent=1)
    f.write("\n")
  print(json.dumps(result), flush=True)


if __name__ == "__main__":
  main()
