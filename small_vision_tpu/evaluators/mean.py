"""Generic mean-of-per-example-metrics evaluator.

Parity target: /root/reference/big_vision/evaluators/mean.py — the
predict_fn returns a dict of per-example metric arrays; this evaluator
accumulates `_mask`-weighted sums and yields their normalized means.
"""

import jax
import jax.numpy as jnp
import numpy as np

from small_vision_tpu.data import core as ds_core
from small_vision_tpu.data import pipeline
from small_vision_tpu.parallel.collectives import process_allgather


class Evaluator:

  def __init__(self, predict_fn, *, mesh, batch_size, data, pp_fn="",
               cache_final=True):
    data = dict(data)
    source = ds_core.get(data.pop("name"), **data)
    self.iterate, self.device_pp, self.n_steps = pipeline.make_for_inference(
        source, pp_fn, mesh, batch_size)

    @jax.jit
    def _eval_fn(train_state, batch, pp_rng):
      if self.device_pp is not None:
        batch = self.device_pp(dict(batch), pp_rng)
      mask = batch["_mask"]
      metrics = predict_fn(train_state, batch)
      sums = jax.tree.map(lambda v: jnp.sum(v * mask), metrics)
      return sums, jnp.sum(mask)
    self._eval_fn = _eval_fn

  def run(self, train_state):
    totals, nseen = None, 0.0
    rng = jax.random.PRNGKey(0)
    for i, batch in enumerate(self.iterate()):
      if i >= self.n_steps:
        break
      rng, pp_rng = jax.random.split(rng)
      sums, n = jax.device_get(self._eval_fn(train_state, batch, pp_rng))
      nseen += float(n)
      totals = sums if totals is None else jax.tree.map(
          np.add, totals, sums)
    if totals is None:
      return
    gathered = process_allgather({"t": totals, "n": nseen})
    n = np.sum(gathered["n"])
    for key in totals:
      yield key, float(np.sum(gathered["t"][key]) / max(n, 1))
