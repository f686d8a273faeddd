"""Sample-collection evaluator for FID/IS.

Parity target: /root/reference/big_vision/evaluators/diffusion_sampling.py —
loops the jitted `create_sample_fn` closure (fixed PRNGKey(0) for run-to-run
comparability, :36) until `total_samples` are collected, gathers across
hosts, and yields `("fid_samples", {"samples": …, "ys": …})` plus an example
grid.
"""

import jax
import numpy as np

from small_vision_tpu.parallel.collectives import fetch_global


class Evaluator:
  """predict_fn = a trainer sample fn: (train_state, rng) -> dict with
  fid_samples/image_examples/ys/rng."""

  def __init__(self, predict_fn, *, mesh, batch_size, total_samples=10_000):
    self.total_samples = int(total_samples)
    self._sample_fn = jax.jit(predict_fn)

  def run(self, train_state):
    rng = jax.random.PRNGKey(0)  # Fixed: FID curves comparable across steps.
    samples, labels = [], []
    n = 0
    example_grid = None
    while n < self.total_samples:
      out = self._sample_fn(train_state, rng)
      rng = out["rng"]
      # fetch_global: the jitted sample fn's outputs are global arrays (one
      # global sample set, batch-sharded or replicated over the mesh) —
      # fetch them exactly once. device_get raised on spanning shards, and
      # a blanket process_allgather would DUPLICATE replicated samples
      # nproc times, silently corrupting FID.
      got = fetch_global(
          {"samples": out["fid_samples"], "ys": out["ys"],
           "examples": out["image_examples"]})
      samples.append(np.asarray(got["samples"]))
      if got["ys"] is not None:
        labels.append(np.asarray(got["ys"]))
      if example_grid is None:
        example_grid = np.asarray(got["examples"])
      n += samples[-1].shape[0]

    samples = np.concatenate(samples)[:self.total_samples]
    ys = (np.concatenate(labels)[:self.total_samples]
          if labels else None)
    yield "fid_samples", {"samples": samples, "ys": ys}
    yield "image_examples", example_grid
