"""int8 quantization loss-curve guardrail (VERDICT r2 item 7).

Runs the REAL CLI trainer twice on the local TPU with identical synthetic
data and seeds — bf16 default vs `quant=<mode>` — and compares the loss
curves: per-log-step deviation plus tail-window means. Writes a JSON
summary consumed by STATUS.md. The int8 path only ships as a default if
the deviation here is within run-to-run noise AND a FID guardrail passes
on a data-equipped machine (not available in this environment).

Usage (chip must be free):
  python scripts/quant_guardrail.py --steps 1000 [--quant int8_mlp]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def read_losses(workdir):
  rows = []
  path = os.path.join(workdir, "sv_tpu_metrics.txt")
  if not os.path.exists(path):
    return {}
  with open(path) as f:
    for line in f:
      line = line.strip()
      if line:
        try:
          r = json.loads(line)
        except json.JSONDecodeError:
          continue
        if "training_loss" in r:
          rows.append((r["step"], r["training_loss"]))
  return dict(rows)


def run(tag, config, workdir, want_steps):
  os.makedirs(workdir, exist_ok=True)
  log = os.path.join(workdir, "train.log")
  done = read_losses(workdir)
  if done and max(done) >= want_steps:
    # Resume: this arm already ran to completion (a prior invocation was
    # killed between arms); reuse its metrics instead of re-burning chip time.
    print(f"[guardrail] {tag}: reusing completed run in {workdir} "
          f"({len(done)} log points)", flush=True)
    return done
  print(f"[guardrail] {tag}: {config}", flush=True)
  with open(log, "w") as f:
    rc = subprocess.call(
        [sys.executable, "-m", "small_vision_tpu.cli",
         "--config", config, "--workdir", workdir],
        cwd=REPO, stdout=f, stderr=subprocess.STDOUT)
  assert rc == 0, f"{tag} trainer failed rc={rc}, see {log}"
  return read_losses(workdir)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--steps", type=int, default=1000)
  ap.add_argument("--batch_size", type=int, default=256)
  ap.add_argument("--quant", default="int8_mlp")
  ap.add_argument("--out", default="/tmp/quant_guardrail")
  args = ap.parse_args()

  epochs = max(args.steps * args.batch_size // 50_000, 1)
  base = (f"ae_i1k.py:data=synthetic,batch_size={args.batch_size},"
          f"epochs={epochs},save_ckpt=False,log_steps=20")

  # Last log step, minus two log intervals of slack: an arm killed right at
  # completion (preemption, wrapper timeout) may lose its final un-flushed
  # metric row — the comparison below only uses matched log steps anyway.
  want = epochs * 50_000 // args.batch_size - 40
  bf16 = run("bf16", base, os.path.join(args.out, "bf16"), want)
  q = run(args.quant, base + f",quant={args.quant}",
          os.path.join(args.out, args.quant), want)

  common = sorted(set(bf16) & set(q))
  assert len(common) >= 10, f"too few matched log steps: {len(common)}"
  deltas = [abs(bf16[s] - q[s]) for s in common]
  rel = [d / max(abs(bf16[s]), 1e-9) for d, s in zip(deltas, common)]
  tail = common[-max(len(common) // 4, 1):]
  tail_bf16 = sum(bf16[s] for s in tail) / len(tail)
  tail_q = sum(q[s] for s in tail) / len(tail)

  summary = {
      "quant": args.quant, "steps": common[-1], "n_log_points": len(common),
      "max_abs_delta": round(max(deltas), 5),
      "max_rel_delta": round(max(rel), 5),
      "tail_mean_bf16": round(tail_bf16, 5),
      "tail_mean_quant": round(tail_q, 5),
      "tail_rel_delta": round(abs(tail_bf16 - tail_q) / max(tail_bf16, 1e-9),
                              5),
      "final_bf16": bf16[common[-1]], "final_quant": q[common[-1]],
  }
  out = os.path.join(args.out, f"guardrail_summary_{args.quant}.json")
  with open(out, "w") as f:
    json.dump(summary, f, indent=1)
    f.write("\n")
  print("[guardrail]", json.dumps(summary), flush=True)


if __name__ == "__main__":
  main()
