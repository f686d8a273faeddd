"""Unit tests for bench.py's window-requalification logic (VERDICT r3 #2).

The driver-scored BENCH_r03.json shipped with 6.09% window spread under host
contention; the bench must now defend its own median by re-measuring window
sets whose spread exceeds the threshold, keeping the tightest set, and
flagging `host_contended` when no set qualifies.
"""

import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


class _FakeWindows:
  """Deterministic sequence of window sets; counts calls."""

  def __init__(self, sets):
    self.sets = list(sets)
    self.calls = 0

  def __call__(self, n):
    out = self.sets[min(self.calls, len(self.sets) - 1)]
    self.calls += 1
    assert len(out) == n
    return out


def test_clean_first_set_no_retry():
  fake = _FakeWindows([[950.0, 953.0, 952.0]])
  rates, info = bench._requalify(fake, 3, threshold=2.0, max_retries=3)
  assert rates == [950.0, 953.0, 952.0]
  assert fake.calls == 1
  assert info["requalify_retries"] == 0
  assert info["host_contended"] is False
  assert info["discarded_window_sets"] == []


def test_contended_first_set_requalifies():
  # First set has the r3 pathology (6% spread), second is clean.
  fake = _FakeWindows([[900.9, 935.5, 957.9], [950.0, 953.0, 952.0]])
  rates, info = bench._requalify(fake, 3, threshold=2.0, max_retries=3)
  assert rates == [950.0, 953.0, 952.0]
  assert fake.calls == 2
  assert info["requalify_retries"] == 1
  assert info["host_contended"] is False
  # The discarded set's spread is recorded for the judge.
  assert len(info["discarded_window_sets"]) == 1
  assert info["discarded_window_sets"][0] > 2.0


def test_keeps_tightest_set_when_all_contended():
  sets = [[800.0, 900.0, 1000.0],   # 22% spread
          [880.0, 900.0, 930.0],    # ~5.6% — tightest
          [850.0, 900.0, 980.0],    # ~14%
          [840.0, 900.0, 990.0]]    # ~17%
  fake = _FakeWindows(sets)
  rates, info = bench._requalify(fake, 3, threshold=2.0, max_retries=3)
  assert rates == sets[1]
  assert fake.calls == 4  # initial + 3 bounded retries
  assert info["requalify_retries"] == 3
  assert info["host_contended"] is True
  assert len(info["discarded_window_sets"]) == 3


def test_retry_worse_than_best_is_discarded():
  sets = [[880.0, 900.0, 930.0],    # ~5.6% — stays best
          [800.0, 900.0, 1000.0],   # worse retry, discarded
          [900.0, 905.0, 903.0]]    # clean — wins, loop exits
  fake = _FakeWindows(sets)
  rates, info = bench._requalify(fake, 3, threshold=2.0, max_retries=3)
  assert rates == sets[2]
  assert info["requalify_retries"] == 2
  assert info["host_contended"] is False
  # Both losers recorded: the worse retry's spread, then the old best's.
  assert len(info["discarded_window_sets"]) == 2


def test_spread_pct():
  assert bench._spread_pct([100.0, 100.0, 100.0]) == 0.0
  assert abs(bench._spread_pct([98.0, 100.0, 102.0]) - 4.0) < 1e-9


def test_loadavg_readable():
  v = bench._loadavg()
  assert isinstance(v, float)
  assert v >= 0.0  # /proc/loadavg exists on this box
