"""Validation diffusion loss + first-batch visualizations.

Parity target: /root/reference/big_vision/evaluators/diffusion_loss.py —
jit'd loss over the val split, plus x_t / pred-x0 / pred-x0-from-eps image
tensors from the first batch for qualitative tracking.
"""


import jax
import numpy as np

from small_vision_tpu.data import core as ds_core
from small_vision_tpu.data import pipeline


class Evaluator:
  """predict_fn = trainer "loss": (train_state, batch) ->
  (per_example_loss, x_t, pred_x0, pred_x0_eps).

  The final batch of a split is zero-padded up to batch_size with `_mask`=0
  rows (pipeline.make_for_inference); the reported loss is the mask-weighted
  mean over REAL examples, accumulated as (sum, count) across batches and
  processes so ragged batches carry their true weight."""

  def __init__(self, predict_fn, *, mesh, batch_size, data, pp_fn="",
               cache_final=True, num_batches=None):
    data = dict(data)
    source = ds_core.get(data.pop("name"), **data)
    self.iterate, self.device_pp, self.n_steps = pipeline.make_for_inference(
        source, pp_fn, mesh, batch_size)
    if num_batches:
      self.n_steps = min(self.n_steps, num_batches)
    self.mesh = mesh

    @jax.jit
    def _eval_fn(train_state, batch, pp_rng):
      if self.device_pp is not None:
        batch = self.device_pp(dict(batch), pp_rng)
      mask = batch["_mask"]
      loss, x_t, pred_x0, pred_x0_eps = predict_fn(train_state, batch)
      return (loss * mask).sum(), mask.sum(), x_t, pred_x0, pred_x0_eps
    self._eval_fn = _eval_fn

  def run(self, train_state):
    loss_sum, n_sum, firsts = 0.0, 0.0, None
    rng = jax.random.PRNGKey(0)
    for i, batch in enumerate(self.iterate()):
      if i >= self.n_steps:
        break
      rng, pp_rng = jax.random.split(rng)
      loss, n, x_t, pred_x0, pred_x0_eps = self._eval_fn(
          train_state, batch, pp_rng)
      loss_sum += float(jax.device_get(loss))
      n_sum += float(jax.device_get(n))
      if firsts is None:
        firsts = jax.device_get((x_t, pred_x0, pred_x0_eps))
    from small_vision_tpu.parallel.collectives import process_allgather
    totals = process_allgather(np.asarray([loss_sum, n_sum]))
    totals = np.asarray(totals).reshape(-1, 2).sum(axis=0)
    yield "loss", float(totals[0] / max(totals[1], 1.0))
    if firsts is not None:
      x_t, pred_x0, pred_x0_eps = firsts
      yield "image_x_t", np.asarray(x_t)
      yield "image_pred_x0", np.asarray(pred_x0)
      yield "image_pred_x0_eps", np.asarray(pred_x0_eps)
