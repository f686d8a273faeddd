"""JSONL metric writer.

Parity target: BigVisionMetricWriter
(/root/reference/big_vision/utils.py:1246-1303): appends one JSON row per
step to `{workdir}/sv_tpu_metrics.txt` from process 0 via a single worker
thread (so device_get / disk IO never blocks the train loop), and dumps the
config once as `config.json`.
"""

import json
import os
import queue
import threading

import jax
import numpy as np


class MetricWriter:

  def __init__(self, workdir=None, config=None):
    self.step_start(0)
    if jax.process_index() != 0:
      self.fname = None
      self._q = None
      return

    self.fname = None
    if workdir:
      os.makedirs(workdir, exist_ok=True)
      self.fname = os.path.join(workdir, "sv_tpu_metrics.txt")
      if config is not None:
        with open(os.path.join(workdir, "config.json"), "w") as f:
          conf = config.to_json_best_effort() if hasattr(
              config, "to_json_best_effort") else json.dumps(
                  config, default=str)
          f.write(conf)

    self._q = queue.Queue()
    self._worker = threading.Thread(target=self._run, daemon=True)
    self._worker.start()

  def _run(self):
    while True:
      item = self._q.get()
      if item is None:
        return
      row, fname = item
      # Values may still be device arrays; fetch here, off the main thread.
      row = {k: v() if callable(v) else v for k, v in row.items()}
      if fname:
        with open(fname, "a") as f:
          f.write(json.dumps(row) + "\n")

  def step_start(self, step):
    self.step = step
    self.step_metrics = {}

  def measure(self, name, value):
    """Records one metric for the current step; returns the plain value."""
    if self._q is None:  # Not process 0.
      return value
    if isinstance(value, jax.Array):
      value = jax.device_get(value)
    value = np.asarray(value)
    if value.size == 1:
      value = float(value.reshape(-1)[0])
    else:
      value = value.tolist()
    self.step_metrics[name] = value
    return value

  def step_end(self):
    if self._q is None or not self.step_metrics:
      return
    row = {"step": self.step, **self.step_metrics}
    self._q.put((row, self.fname))
    self.step_metrics = {}

  def close(self):
    self.step_end()
    if self._q is not None:
      self._q.put(None)
      self._worker.join(timeout=10)
