"""Masked-patch reconstruction MSE + masked/reconstructed grids.

Parity target: /root/reference/big_vision/evaluators/mae_reconstruction.py —
`loss = mean((pred*mask − true*mask)²) / mean(mask)` (:46) on the val split,
plus masked-input and reconstruction visualizations.
"""

import jax
import jax.numpy as jnp
import numpy as np

from small_vision_tpu.data import core as ds_core
from small_vision_tpu.data import pipeline


class Evaluator:
  """predict_fn = trainer "patch": (train_state, batch) -> (pred_x0, mask)."""

  def __init__(self, predict_fn, *, mesh, batch_size, data, pp_fn="",
               cache_final=True, num_batches=None):
    data = dict(data)
    source = ds_core.get(data.pop("name"), **data)
    self.iterate, self.device_pp, self.n_steps = pipeline.make_for_inference(
        source, pp_fn, mesh, batch_size)
    if num_batches:
      self.n_steps = min(self.n_steps, num_batches)

    @jax.jit
    def _eval_fn(train_state, batch, pp_rng):
      if self.device_pp is not None:
        batch = self.device_pp(dict(batch), pp_rng)
      images = batch["image"]
      batch_mask = batch["_mask"]  # 0 on zero-padded rows of the last batch.
      pred_x0, mask = predict_fn(train_state, batch)
      se = (pred_x0 - images) ** 2
      red = tuple(range(1, se.ndim))
      per_ex = (jnp.mean(se * mask, axis=red)
                / jnp.maximum(jnp.mean(mask, axis=red), 1e-8))
      masked_img = images * (1 - mask)
      recon = images * (1 - mask) + pred_x0 * mask
      return (per_ex * batch_mask).sum(), batch_mask.sum(), masked_img, recon
    self._eval_fn = _eval_fn

  def run(self, train_state):
    loss_sum, n_sum, firsts = 0.0, 0.0, None
    rng = jax.random.PRNGKey(0)
    for i, batch in enumerate(self.iterate()):
      if i >= self.n_steps:
        break
      rng, pp_rng = jax.random.split(rng)
      loss, n, masked_img, recon = self._eval_fn(train_state, batch, pp_rng)
      loss_sum += float(jax.device_get(loss))
      n_sum += float(jax.device_get(n))
      if firsts is None:
        firsts = jax.device_get((masked_img, recon))
    from small_vision_tpu.parallel.collectives import process_allgather
    totals = process_allgather(np.asarray([loss_sum, n_sum]))
    totals = np.asarray(totals).reshape(-1, 2).sum(axis=0)
    yield "masked_mse", float(totals[0] / max(totals[1], 1.0))
    if firsts is not None:
      yield "image_masked", np.asarray(firsts[0])
      yield "image_reconstruction", np.asarray(firsts[1])
