"""On-chip soak + preemption drill (VERDICT r2 item 6).

Runs the REAL CLI trainer on the local TPU with synthetic data and periodic
checkpoints, kill -9s it mid-run (deliberately racing the async checkpoint
writer), relaunches, and asserts real preemption semantics:

  - the run resumes from the latest COMMITTED checkpoint (orbax atomic
    commit): the resumed segment starts within one checkpoint interval of
    the kill point — never from step 0, never past the kill point,
  - steps are strictly increasing within the resumed run (re-running the
    steps since the last committed checkpoint is EXPECTED — that is what a
    preempted trainer does; the metrics log records both passes),
  - trajectory reproducibility: where the resumed run re-logs steps the
    first run already logged, the losses match (restored train_state carries
    the rng, so the re-run draws the same noise/masks/data order),
  - the loss curve continues without discontinuity past the kill point,
  - Chrono's epoch accounting is monotone within the resumed run.

Parity anchor: the reference's preemption protocol (big_vision utils.py
:912-952 -LAST/-CUR/-tmp atomic pointer + trainers/train_ae.py:203-261
resume path).

Usage (chip must be free):
  python scripts/soak_drill.py --workdir /tmp/soak --kill_after_steps 10000 \
      --resume_steps 1500 [--total_steps 15000] [--ckpt_steps 2500]
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


def analyze_resume_events(rows):
  """Per-event overlap reproducibility for every kill+resume in a metrics log.

  Each step-decrease boundary in the logged step sequence is a real
  SIGKILL+resume (the trainer only ever logs monotonically within one
  process). For each boundary, computes how far the re-run steps' losses
  deviate from the original pass — restore is state-exact iff 0.
  """
  segs, cur = [], [rows[0]]
  for r in rows[1:]:
    if r["step"] <= cur[-1]["step"]:
      segs.append(cur)
      cur = [r]
    else:
      cur.append(r)
  segs.append(cur)
  events = []
  for a, b in zip(segs, segs[1:]):
    by_step = {r["step"]: r["training_loss"] for r in a}
    ov = [(r["step"], r["training_loss"]) for r in b if r["step"] in by_step]
    dev = max((abs(l - by_step[s]) / max(abs(by_step[s]), 1e-6)
               for s, l in ov), default=0.0)
    events.append({
        "killed_at_step": a[-1]["step"], "resumed_first_log": b[0]["step"],
        "n_overlap_steps": len(ov), "max_rerun_loss_dev": round(dev, 6)})
  return events


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
  ap.add_argument("--phase2_only", action="store_true",
                  help="The workdir already holds a killed phase-1 run (e.g. "
                       "the prior drill invocation was itself preempted): "
                       "skip train+kill, go straight to relaunch+assertions.")
  args = ap.parse_args()

  # epochs chosen so total_steps = epochs * 50_000 / batch_size.
  epochs = max(args.total_steps * args.batch_size // 50_000, 1)
  config = (f"ae_i1k.py:data=synthetic,batch_size={args.batch_size},"
            f"epochs={epochs},ckpt_steps={args.ckpt_steps},"
            "log_steps=20")
  os.makedirs(args.workdir, exist_ok=True)
  logpath = os.path.join(args.workdir, "soak.log")
  log = open(logpath, "a")

  if args.phase2_only:
    print("[drill] phase2_only: using existing workdir as post-kill state",
          flush=True)
    phase1 = read_metrics(args.workdir)
    assert phase1, f"--phase2_only but no metrics in {args.workdir}"
  else:
    print(f"[drill] phase 1: train to step {args.kill_after_steps}",
          flush=True)
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
    # Snapshot phase 1 AFTER the kill (the trainer may have logged past our
    # last 15 s poll before the SIGKILL landed).
    phase1 = read_metrics(args.workdir)
  kill_step = phase1[-1]["step"]
  pre_loss = [r["training_loss"] for r in phase1[-5:]]

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
  phase2 = rows[len(phase1):]
  assert phase2, "no metrics logged after resume"
  steps2 = [r["step"] for r in phase2]
  assert all(b > a for a, b in zip(steps2, steps2[1:])), (
      f"resumed run's steps not strictly increasing: {steps2[:10]}")
  first_resumed = steps2[0]
  # Resume starts from the last COMMITTED checkpoint: at most one checkpoint
  # interval (+ a log window) before the kill point — the kill may land
  # mid-write of the next checkpoint, whose torn tmp dir orbax must ignore —
  # and never past it (and never from 0).
  assert kill_step - (args.ckpt_steps + 20) <= first_resumed <= \
      kill_step + 20, (
          f"resume point {first_resumed} outside "
          f"[{kill_step - args.ckpt_steps - 20}, {kill_step + 20}] "
          f"(kill at {kill_step}, ckpt every {args.ckpt_steps})")

  # Trajectory reproducibility on re-run steps: the restored train_state
  # carries the rng and the data order is (seed, epoch)-deterministic, so
  # re-logged steps must reproduce the first run's losses.
  p1_by_step = {r["step"]: r["training_loss"] for r in phase1}
  overlap = [(s, r["training_loss"]) for s, r in zip(steps2, phase2)
             if s in p1_by_step]
  max_rerun_dev = max(
      (abs(l2 - p1_by_step[s]) / max(abs(p1_by_step[s]), 1e-6)
       for s, l2 in overlap), default=0.0)
  assert max_rerun_dev < 0.05, (
      f"re-run steps diverged from the original trajectory by "
      f"{max_rerun_dev:.1%} — restore is not state-exact")

  fresh = [r for r in phase2 if r["step"] > kill_step]
  assert fresh, "resumed run never passed the kill point"
  post_loss = [r["training_loss"] for r in fresh[:5]]
  pre, post = sum(pre_loss) / len(pre_loss), sum(post_loss) / len(post_loss)
  local_noise = max(abs(a - b) for a, b in zip(pre_loss, pre_loss[1:])) + 0.02
  assert abs(post - pre) < max(10 * local_noise, 0.1), (
      f"loss discontinuity across preemption: {pre:.4f} -> {post:.4f}")

  epochs_seq = [r.get("epochs") for r in phase2
                if r.get("epochs") is not None]
  assert all(b >= a for a, b in zip(epochs_seq, epochs_seq[1:])), (
      "Chrono epoch accounting went backwards within the resumed run")

  # Every kill+resume the metrics file has ever seen (the drill itself may
  # have been preempted between its own phases — each step-decrease boundary
  # is a real SIGKILL+resume): per-event overlap reproducibility.
  resume_events = analyze_resume_events(rows)
  assert all(e["max_rerun_loss_dev"] < 0.05 for e in resume_events), (
      f"a resume event diverged from the original trajectory: "
      f"{resume_events}")

  summary = {
      "resume_events": resume_events,
      "kill_step": kill_step, "first_resumed_step": first_resumed,
      "n_rerun_steps_checked": len(overlap),
      "max_rerun_loss_dev": round(max_rerun_dev, 6),
      "pre_kill_loss_mean": round(pre, 4), "post_resume_loss_mean":
      round(post, 4), "final_step": steps2[-1],
      "final_loss": phase2[-1]["training_loss"],
      "n_logged": len(rows), "ok": True,
  }
  out = os.path.join(args.workdir, "drill_summary.json")
  with open(out, "w") as f:
    json.dump(summary, f, indent=1)
    f.write("\n")
  print("[drill] OK", json.dumps(summary), flush=True)


if __name__ == "__main__":
  main()
