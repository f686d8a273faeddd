"""Metric writer: JSONL + pluggable sinks.

Parity target: BigVisionMetricWriter
(/root/reference/big_vision/utils.py:1246-1303) plus the reference's wandb
sink (train_tpu.py:38-45, trainers/train_ae.py:646): appends one JSON row
per step to `{workdir}/sv_tpu_metrics.txt` from process 0 via a single
worker thread (so device_get / disk IO never blocks the train loop), dumps
the config once as `config.json`, and fans each finalized row out to any
configured sinks (e.g. `WandbSink`) from the same worker thread.

A sink is any object with `log(row: dict)` and `close()`; rows are plain
Python scalars/lists with a "step" key. Sinks are optional — the framework
has no hard dependency on any experiment tracker.
"""

import json
import os
import queue
import threading

import jax
import numpy as np


class WandbSink:
  """Optional Weights & Biases sink (reference train_tpu.py:38-45).

  Imports wandb lazily; constructing it without wandb installed raises
  ImportError (callers gate on `wandb_available()`).
  """

  def __init__(self, project, name=None, config=None, **init_kw):
    import wandb
    self._wandb = wandb
    self._run = wandb.init(project=project, name=name,
                           config=_plain_config(config), **init_kw)

  def log(self, row):
    row = dict(row)
    step = row.pop("step", None)
    self._run.log(row, step=step)

  def close(self):
    self._run.finish()


def wandb_available() -> bool:
  try:
    import wandb  # noqa: F401
    return True
  except ImportError:
    return False


def _plain_config(config):
  if config is None:
    return None
  if hasattr(config, "to_dict"):
    return config.to_dict()
  return dict(config)


def make_sinks(config):
  """Builds sinks from config: `config.wandb = dict(project=..., ...)`.

  Returns [] when unconfigured; raises if configured but wandb is missing
  (a silent no-op would lose a run's metrics without anyone noticing).
  """
  sinks = []
  wandb_cfg = (config or {}).get("wandb") if hasattr(config, "get") else None
  if wandb_cfg:
    if not wandb_available():
      raise ImportError(
          "config.wandb is set but the wandb package is not installed")
    sinks.append(WandbSink(config=config, **dict(wandb_cfg)))
  return sinks


class MetricWriter:

  def __init__(self, workdir=None, config=None, sinks=None):
    self.step_start(0)
    if jax.process_index() != 0:
      self.fname = None
      self._q = None
      self._sinks = []
      return

    self._sinks = list(sinks) if sinks is not None else make_sinks(config)
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
      for sink in self._sinks:
        sink.log(row)

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
    for sink in self._sinks:
      sink.close()
