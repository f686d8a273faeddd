"""On-chip soak + preemption drill (VERDICT r2 item 6).

Runs the REAL CLI trainer on the local TPU with synthetic data and frequent
checkpoints, kill -9s it mid-run, relaunches, and asserts:

  - the run resumes from the latest checkpoint step (no restart from 0),
  - the step sequence in the metrics log is strictly increasing across the
    kill, with the resumed segment starting at (ckpt_step + 1..log window),
  - the loss curve continues without discontinuity: |mean(loss around kill)
    - mean(loss after resume)| is within the local loss noise,
  - Chrono's epoch accounting continues monotonically.

Parity anchor: the reference's preemption protocol (big_vision utils.py
checkpoint/resume + trainers/train_ae.py:203-261 resume path).

Usage (chip must be free):
  python scripts/soak_drill.py --workdir /tmp/soak --kill_after_steps 400 \
      --resume_steps 200 [--total_steps 2000] [--ckpt_steps 100]
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def read_metrics(workdir):
  path = os.path.join(workdir, "sv_tpu_metrics.txt")
  rows = []
  if not os.path.exists(path):
    return rows
  with open(path) as f:
    for line in f:
      line = line.strip()
      if line:
        try:
          rows.append(json.loads(line))
        except json.JSONDecodeError:
          pass
  return [r for r in rows if "training_loss" in r]


def launch(config, workdir, log):
  return subprocess.Popen(
      [sys.executable, "-m", "small_vision_tpu.cli",
       "--config", config, "--workdir", workdir],
      cwd=REPO, stdout=log, stderr=subprocess.STDOUT,
      preexec_fn=os.setsid)


def wait_for_step(workdir, step, proc, timeout_s):
  t0 = time.time()
  while time.time() - t0 < timeout_s:
    rows = read_metrics(workdir)
    if rows and rows[-1]["step"] >= step:
      return rows
    if proc.poll() is not None:
      raise RuntimeError(f"trainer exited early rc={proc.returncode}")
    time.sleep(15)
  raise TimeoutError(f"step {step} not reached in {timeout_s}s "
                     f"(at {rows[-1]['step'] if rows else 'none'})")


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--workdir", default="/tmp/soak_drill")
  ap.add_argument("--batch_size", type=int, default=256)
  ap.add_argument("--total_steps", type=int, default=2000)
  ap.add_argument("--ckpt_steps", type=int, default=100)
  ap.add_argument("--kill_after_steps", type=int, default=400)
  ap.add_argument("--resume_steps", type=int, default=200)
  ap.add_argument("--startup_timeout", type=int, default=3600)
  args = ap.parse_args()

  # epochs chosen so total_steps = epochs * 50_000 / batch_size.
  epochs = max(args.total_steps * args.batch_size // 50_000, 1)
  config = (f"ae_i1k.py:data=synthetic,batch_size={args.batch_size},"
            f"epochs={epochs},ckpt_steps={args.ckpt_steps},"
            "log_steps=20")
  os.makedirs(args.workdir, exist_ok=True)
  logpath = os.path.join(args.workdir, "soak.log")
  log = open(logpath, "a")

  print(f"[drill] phase 1: train to step {args.kill_after_steps}", flush=True)
  proc = launch(config, args.workdir, log)
  try:
    rows = wait_for_step(args.workdir, args.kill_after_steps, proc,
                         args.startup_timeout)
  finally:
    if proc.poll() is None:
      print("[drill] kill -9 (SIGKILL, whole group — simulated preemption)",
            flush=True)
      os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
      proc.wait()
  kill_rows = rows
  kill_step = kill_rows[-1]["step"]
  pre_loss = [r["training_loss"] for r in kill_rows[-5:]]

  print(f"[drill] killed at logged step {kill_step}; relaunching", flush=True)
  time.sleep(5)
  proc = launch(config, args.workdir, log)
  try:
    rows = wait_for_step(args.workdir, kill_step + args.resume_steps, proc,
                         args.startup_timeout)
  finally:
    if proc.poll() is None:
      os.killpg(os.getpgid(proc.pid), signal.SIGTERM)
      proc.wait()

  # ---- assertions -------------------------------------------------------
  steps = [r["step"] for r in rows]
  # Resume must NOT restart from 0: after the kill row, the next logged step
  # continues past the last checkpoint, and the full sequence stays
  # strictly increasing (orbax restore + Chrono step accounting).
  assert all(b > a for a, b in zip(steps, steps[1:])), (
      "step sequence not strictly increasing across the kill: "
      f"{[s for s, (a, b) in zip(steps[1:], zip(steps, steps[1:])) if b <= a][:5]}")
  resumed = [r for r in rows if r["step"] > kill_step]
  assert resumed, "no steps after resume"
  first_resumed = resumed[0]["step"]
  # The resumed segment starts within one ckpt+log window of the kill point.
  max_loss_window = args.ckpt_steps + 20
  assert first_resumed - kill_step <= max_loss_window, (
      f"resume gap too large: kill at {kill_step}, resumed at {first_resumed}")

  post_loss = [r["training_loss"] for r in resumed[:5]]
  pre, post = sum(pre_loss) / len(pre_loss), sum(post_loss) / len(post_loss)
  local_noise = max(abs(a - b) for a, b in zip(pre_loss, pre_loss[1:])) + 0.02
  assert abs(post - pre) < max(10 * local_noise, 0.1), (
      f"loss discontinuity across preemption: {pre:.4f} -> {post:.4f}")

  epochs_seq = [r.get("epochs") for r in rows if r.get("epochs") is not None]
  assert all(b >= a for a, b in zip(epochs_seq, epochs_seq[1:])), (
      "Chrono epoch accounting went backwards across resume")

  summary = {
      "kill_step": kill_step, "first_resumed_step": first_resumed,
      "pre_kill_loss_mean": round(pre, 4), "post_resume_loss_mean":
      round(post, 4), "final_step": steps[-1],
      "final_loss": rows[-1]["training_loss"],
      "n_logged": len(rows), "ok": True,
  }
  out = os.path.join(args.workdir, "drill_summary.json")
  with open(out, "w") as f:
    json.dump(summary, f, indent=1)
  print("[drill] OK", json.dumps(summary), flush=True)


if __name__ == "__main__":
  main()
