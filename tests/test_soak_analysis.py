"""Unit tests for soak_drill.py's kill+resume segment analysis.

The 10k soak drill (perf/soak_drill_10kstep.json) validates EVERY
SIGKILL+resume boundary a metrics log has ever seen — including kills of the
drill wrapper itself. The analysis is pure, so it is tested directly.
"""

import sys

sys.path.insert(0, "/root/repo/scripts")

from soak_drill import analyze_resume_events  # noqa: E402


def _rows(pairs):
  return [{"step": s, "training_loss": l} for s, l in pairs]


def test_single_run_has_no_events():
  rows = _rows([(20, 1.0), (40, 0.9), (60, 0.8)])
  assert analyze_resume_events(rows) == []


def test_one_resume_with_exact_overlap():
  # Killed at 60, resumed from ckpt 40: steps 60 re-run with identical loss.
  rows = _rows([(20, 1.0), (40, 0.9), (60, 0.8),      # run 1
                (60, 0.8), (80, 0.7)])                 # run 2 (overlap at 60)
  events = analyze_resume_events(rows)
  assert len(events) == 1
  e = events[0]
  assert e["killed_at_step"] == 60
  assert e["resumed_first_log"] == 60
  assert e["n_overlap_steps"] == 1
  assert e["max_rerun_loss_dev"] == 0.0


def test_divergent_rerun_is_measured():
  rows = _rows([(20, 1.0), (40, 0.5),
                (40, 0.6), (60, 0.4)])  # re-run step 40 deviates 20%
  (e,) = analyze_resume_events(rows)
  assert abs(e["max_rerun_loss_dev"] - 0.2) < 1e-6


def test_two_kill_events_reported_in_order():
  rows = _rows([(20, 1.0), (40, 0.9), (60, 0.8),       # run 1, killed @60
                (40, 0.9), (60, 0.8), (80, 0.7),       # run 2, killed @80
                (80, 0.7), (100, 0.6)])                # run 3
  events = analyze_resume_events(rows)
  assert [e["killed_at_step"] for e in events] == [60, 80]
  assert [e["resumed_first_log"] for e in events] == [40, 80]
  assert [e["n_overlap_steps"] for e in events] == [2, 1]
  assert all(e["max_rerun_loss_dev"] == 0.0 for e in events)


def test_boundary_detection_semantics():
  # A ckpt committed exactly at the kill step leaves a MONOTONE log (the
  # real 10k drill's second kill: resumed at 10020 after kill at 10000) —
  # undetectable from steps alone, which is why the drill ALSO runs its
  # explicit phase-2 resume-point/continuity assertions.
  rows = _rows([(20, 1.0), (40, 0.9), (60, 0.8), (80, 0.7)])
  assert analyze_resume_events(rows) == []
  # An EQUAL-step boundary is a resume (the restored run re-logs that step).
  rows = _rows([(20, 1.0), (40, 0.9),
                (40, 0.9), (60, 0.8)])
  (e,) = analyze_resume_events(rows)
  assert e["killed_at_step"] == 40
  assert e["n_overlap_steps"] == 1
  assert e["max_rerun_loss_dev"] == 0.0
