"""int8_all sampler quality proxy (VERDICT r3 task 5): same-seed bf16 vs
int8_all samples compared in Inception feature space + pixel space.

Real-FID gating is environmentally blocked (no ImageNet, no pretrained
Inception weights). This is the strongest proxy runnable on this box:

  1. Same random-init flagship params + SAME sampling seeds through both
     sampler variants (bf16 default, quant=int8_all) -> paired sample sets.
  2. Pixel MSE / PSNR over the pairs (quantization drift per image).
  3. Frechet distance between the two sets under the repo's InceptionV3
     with fixed random weights — the exact FID protocol
     (evaluators/fid.py), self-consistent even without trained weights.
  4. Noise floor: the same Frechet distance between the two HALVES of the
     bf16 set. int8 passes the proxy if frechet(bf16, int8) is within
     --floor_mult x the split-half floor.

This keeps the +21% int8 sampler win honest until real weights exist
(reference FID protocol: /root/reference/big_vision/evaluators/fid.py:72-100;
gating note: STATUS.md "quantization" section).

Usage (real chip, ~6 min at defaults):
  python scripts/quant_fid_proxy.py
CPU smoke:
  JAX_PLATFORMS=cpu python scripts/quant_fid_proxy.py --total 64 \
      --per_call 32 --steps 4 --out /tmp/quant_proxy.json
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--total", type=int, default=2048)
  ap.add_argument("--per_call", type=int, default=512)
  ap.add_argument("--steps", type=int, default=125)
  ap.add_argument("--quant", default="int8_all")
  ap.add_argument("--variant", default="B/4")
  ap.add_argument("--size", type=int, default=64)
  ap.add_argument("--attn", default="pallas")
  ap.add_argument("--fid_batch", type=int, default=256)
  ap.add_argument("--floor_mult", type=float, default=3.0,
                  help="pass if frechet(bf16,int8) <= mult * split-half "
                       "floor of the bf16 set")
  ap.add_argument("--out", default=os.path.join(REPO, "perf",
                                                "quant_fid_proxy.json"))
  args = ap.parse_args()
  assert args.total % args.per_call == 0 and (args.total // 2) % 2 == 0

  import jax

  from small_vision_tpu.utils.misc import honor_env_platform
  honor_env_platform()
  import jax.numpy as jnp

  from small_vision_tpu.cli import parse_config
  from small_vision_tpu.evaluators import fid as fid_lib
  from small_vision_tpu.evaluators import inception
  from small_vision_tpu.ops import diffusion as gd_lib
  from small_vision_tpu.tools import export_sampler
  from small_vision_tpu.train import train_ae

  def build_sampler(quant):
    cfg_str = (f"ae_i1k.py:variant={args.variant},size={args.size},"
               f"use_labels=True,attn_impl={args.attn}")
    if quant:
      cfg_str += f",quant={quant}"
    config = parse_config(cfg_str)
    config.num_samples_per_call = args.per_call
    config.diff_schedule.sampling_timesteps = args.steps
    model = train_ae.build_model(config)
    eval_fns = train_ae.make_eval_fns(model, config)
    gd = gd_lib.GaussianDiffusion.create(
        config.diff_schedule.beta_schedule, config.diff_schedule.timesteps)
    return config, model, eval_fns["cond_eps"], gd

  config, model, _, _ = build_sampler("")
  # One shared random-init param tree (EMA stand-in) for both arms.
  abstract = export_sampler.abstract_params(model, config)
  nprng = np.random.default_rng(0)
  params = jax.tree.map(
      lambda l: jnp.asarray(nprng.normal(0, 0.02, l.shape).astype(l.dtype)),
      abstract)

  def sample_set(quant):
    _, _, fn, gd = build_sampler(quant)
    # params as a jit ARG (not a closure): closed-over trees get embedded in
    # the HLO as constants, which blows past the tunneled remote-compile
    # body limit at B-scale (HTTP 413).
    jfn = jax.jit(lambda p, key: fn(
        {"params": p, "gd": gd, "rng": key}, key)["fid_samples"])
    dparams = jax.device_put(params)
    out, key = [], jax.random.PRNGKey(7)
    per_call_s = []
    for _ in range(args.total // args.per_call):
      key, sub = jax.random.split(key)  # identical key sequence both arms
      t0 = time.perf_counter()
      out.append(np.asarray(jax.device_get(jfn(dparams, sub))))
      per_call_s.append(time.perf_counter() - t0)
    # Steady-state: call 0 carries the (tunneled, minutes-long) compile.
    steady = per_call_s[1:] or per_call_s
    return np.concatenate(out), float(np.median(steady))

  bf16, bf16_call_s = sample_set("")
  q, q_call_s = sample_set(args.quant)
  assert bf16.shape == q.shape and bf16.dtype == np.uint8

  # Pixel-space pairwise drift.
  diff = bf16.astype(np.float64) - q.astype(np.float64)
  mse = float(np.mean(diff ** 2))
  psnr = float(10 * np.log10(255.0 ** 2 / max(mse, 1e-12)))

  # Feature-space Frechet distances under the fixed-random-weight Inception.
  imodel, ivars = inception.init_params(rng=jax.random.PRNGKey(1))
  act_fn = fid_lib.make_activation_fn(imodel, ivars)

  def stats(images):
    m = fid_lib.StreamingMoments()
    for i in range(0, images.shape[0], args.fid_batch):
      chunk = images[i:i + args.fid_batch]
      mask = np.ones((chunk.shape[0],), np.float32)
      _, s, outer = act_fn(jnp.asarray(chunk), jnp.asarray(mask))
      m.update(chunk.shape[0], jax.device_get(s), jax.device_get(outer))
    return m.finalize()

  mu_b, sig_b = stats(bf16)
  mu_q, sig_q = stats(q)
  h = args.total // 2
  mu_h1, sig_h1 = stats(bf16[:h])
  mu_h2, sig_h2 = stats(bf16[h:])

  frechet_cross = float(fid_lib.compute_frechet_distance(
      mu_b, sig_b, mu_q, sig_q))
  frechet_floor = float(fid_lib.compute_frechet_distance(
      mu_h1, sig_h1, mu_h2, sig_h2))

  res = {
      "quant": args.quant, "variant": args.variant, "size": args.size,
      "total": args.total, "sampling_steps": args.steps,
      "device": str(jax.devices()[0].device_kind),
      "pixel_mse": round(mse, 4), "pixel_psnr_db": round(psnr, 2),
      "frechet_bf16_vs_int8": float(f"{frechet_cross:.3e}"),
      "frechet_splithalf_floor": float(f"{frechet_floor:.3e}"),
      "floor_mult": args.floor_mult,
      # max(floor, 1e-6) keeps the gate meaningful when both distances sit
      # below the protocol's numerical resolution (sqrtm rounding can give
      # exact/-0.0 values for statistically identical sets).
      "pass": bool(frechet_cross <= args.floor_mult
                   * max(frechet_floor, 1e-6)),
      "bf16_imgs_per_sec_steady": round(args.per_call / bf16_call_s, 2),
      "quant_imgs_per_sec_steady": round(args.per_call / q_call_s, 2),
  }
  assert np.isfinite(frechet_cross) and np.isfinite(frechet_floor)
  os.makedirs(os.path.dirname(args.out), exist_ok=True)
  with open(args.out, "w") as f:
    json.dump(res, f, indent=1)
    f.write("\n")
  print(json.dumps(res, indent=1))


if __name__ == "__main__":
  main()
