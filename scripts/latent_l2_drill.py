"""Latent-UMD-L/2 on-chip drill: the reference's second flagship config.

BASELINE.md's strongest quality rows (Latent-UMD-L/2 @ i1k-256: 54.4% LP,
FID 3.96) run the L/2 model in the 32x32x4 Stable-Diffusion latent space
(reference configs/ae_i1k.py:16-23, vae_utils.py). ImageNet-256 and the
pretrained SD VAE are environmentally unavailable, so this drill proves the
*execution path* end-to-end on the real chip and measures its throughput:

  - variant=L/2 (width 1024, depth 24 + dec 8), size=256, latent space
    (32, 32, 4), linear beta schedule, no clip_denoised — the exact config
    the CLI builds for `latent_diffusion=True`,
  - in-program VAE encode each step (pixels -> latents inside the jitted
    update, reference trainers/train_ae.py:89-98 semantics) with the native
    Flax AutoencoderKL (models/vae.py; weights random -- throughput and
    numerical-health drill, not a quality run),
  - real CLI trainer, synthetic 256px uint8 data, bf16, Pallas attention.

Asserts: loss finite and decreasing, throughput logged; writes
perf/latent_l2_drill.json with imgs/s medians for the full step
(VAE encode + L/2 update).

Usage (chip must be free; ~10 min):
  python scripts/latent_l2_drill.py [--batch_size 64] [--epochs 1]
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--workdir", default="/tmp/latent_l2_drill")
  ap.add_argument("--batch_size", type=int, default=64)
  ap.add_argument("--epochs", type=int, default=1)  # 50k synthetic / bs
  ap.add_argument("--parse_only", action="store_true",
                  help="skip training; (re)build the JSON from the workdir")
  ap.add_argument("--out", default=os.path.join(REPO, "perf",
                                                "latent_l2_drill.json"))
  args = ap.parse_args()

  # eval_steps=-1: no evaluators — this drill measures the TRAIN path
  # (VAE encode + L/2 update); the default fewshot/val evals at L/2-256
  # scale add ~30+ min of eval-only wall-clock that asserts nothing here.
  config = (f"ae_i1k.py:variant=L/2,size=256,latent_diffusion=True,"
            f"data=synthetic,batch_size={args.batch_size},"
            f"epochs={args.epochs},save_ckpt=False,log_steps=20,"
            f"eval_steps=-1")
  metrics_path = os.path.join(args.workdir, "sv_tpu_metrics.txt")
  if not args.parse_only:
    # The metric writer APPENDS; a stale file from an earlier run would mix
    # two runs' rows into the summary.
    if os.path.exists(metrics_path):
      os.remove(metrics_path)
    rc = subprocess.call(
        [sys.executable, "-m", "small_vision_tpu.cli",
         "--config", config, "--workdir", args.workdir],
        cwd=REPO)
    assert rc == 0, f"trainer failed rc={rc}"

  rows = []
  with open(metrics_path) as f:
    for line in f:
      if line.strip():
        rows.append(json.loads(line))
  rows = [r for r in rows if "training_loss" in r]
  # Defense in depth: keep only the LAST monotonic-step segment (a step
  # reset marks an earlier appended run).
  last_start = 0
  for i in range(1, len(rows)):
    if rows[i]["step"] <= rows[i - 1]["step"]:
      last_start = i
  rows = rows[last_start:]
  losses = [r["training_loss"] for r in rows]
  # Skip the first two log windows (compile + warmup) for throughput.
  imgs = [r["z/img_per_sec_per_core"] for r in rows[2:]]
  summary = {
      "config": config,
      "n_log_rows": len(rows),
      "first_loss": losses[0], "final_loss": losses[-1],
      "loss_decreased": losses[-1] < 0.5 * losses[0],
      "all_finite": bool(np.all(np.isfinite(losses))),
      "imgs_per_sec_per_chip_median": float(np.median(imgs)),
      "imgs_per_sec_per_chip_p10_p90": [
          float(np.percentile(imgs, 10)), float(np.percentile(imgs, 90))],
  }
  with open(args.out, "w") as f:
    json.dump(summary, f, indent=1)
  print("[latent-l2-drill]", json.dumps(summary), flush=True)
  assert summary["all_finite"], "non-finite loss in latent L/2 training"
  assert summary["loss_decreased"], (
      f"loss did not halve: {losses[0]:.4f} -> {losses[-1]:.4f}")


if __name__ == "__main__":
  main()
