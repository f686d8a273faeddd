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
perf/latent_l2_drill.json with a DEFENDED imgs/s median for the full step
(VAE encode + L/2 update): the post-warmup log rows are split into 3
contiguous windows and, if their spread exceeds the shared 2% threshold
(utils/windows.py — the r3 contaminated-median lesson), the whole training
run is re-measured (bounded retries) and the tightest set is kept.

Usage (chip must be free; ~10 min per attempt):
  python scripts/latent_l2_drill.py [--batch_size 64] [--epochs 1]
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from small_vision_tpu.utils import windows as win  # noqa: E402


def run_trainer(config, workdir, metrics_path):
  # The metric writer APPENDS; a stale file from an earlier run would mix
  # two runs' rows into the summary.
  if os.path.exists(metrics_path):
    os.remove(metrics_path)
  rc = subprocess.call(
      [sys.executable, "-m", "small_vision_tpu.cli",
       "--config", config, "--workdir", workdir],
      cwd=REPO)
  assert rc == 0, f"trainer failed rc={rc}"


def parse_rows(metrics_path):
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
  return rows[last_start:]


def window_rates(rows, n=3):
  """Post-warmup per-log-row rates chunked into n contiguous windows."""
  imgs = [r["z/img_per_sec_per_core"] for r in rows[2:]]
  chunks = np.array_split(np.asarray(imgs), n)
  return [float(np.median(c)) for c in chunks if len(c)]


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--workdir", default="/tmp/latent_l2_drill")
  ap.add_argument("--batch_size", type=int, default=64)
  ap.add_argument("--epochs", type=int, default=1)  # 50k synthetic / bs
  ap.add_argument("--max_retries", type=int, default=1,
                  help="re-training runs if the window spread is wide "
                       "(each costs a full run — default 1)")
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

  state = {"rows": None}

  def run_windows(n):
    if not (args.parse_only and state["rows"] is None):
      run_trainer(config, args.workdir, metrics_path)
    state["rows"] = parse_rows(metrics_path)
    return window_rates(state["rows"], n)

  if args.parse_only:
    rates = run_windows(3)
    qual = {"requalify_retries": 0,
            "host_contended": win.spread_pct(rates) > 2.0,
            "discarded_window_sets": [], "parse_only": True}
  else:
    rates, qual = win.requalify(run_windows, windows=3,
                                max_retries=args.max_retries)

  rows = state["rows"]
  losses = [r["training_loss"] for r in rows]
  imgs = [r["z/img_per_sec_per_core"] for r in rows[2:]]
  summary = {
      "config": config,
      "n_log_rows": len(rows),
      "first_loss": losses[0], "final_loss": losses[-1],
      "loss_decreased": losses[-1] < 0.5 * losses[0],
      "all_finite": bool(np.all(np.isfinite(losses))),
      "imgs_per_sec_per_chip_median": float(np.median(rates)),
      "windows_imgs_per_sec": [round(r, 1) for r in rates],
      "spread_pct": round(win.spread_pct(rates), 2),
      **qual,
      "imgs_per_sec_per_chip_p10_p90": [
          float(np.percentile(imgs, 10)), float(np.percentile(imgs, 90))],
  }
  with open(args.out, "w") as f:
    json.dump(summary, f, indent=1)
    f.write("\n")
  print("[latent-l2-drill]", json.dumps(summary), flush=True)
  assert summary["all_finite"], "non-finite loss in latent L/2 training"
  assert summary["loss_decreased"], (
      f"loss did not halve: {losses[0]:.4f} -> {losses[-1]:.4f}")


if __name__ == "__main__":
  main()
