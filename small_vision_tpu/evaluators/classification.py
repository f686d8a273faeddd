"""Top-1 accuracy + cross-entropy with padded-example correction.

Parity target: /root/reference/big_vision/evaluators/classification.py —
`_mask`-weighted sums so zero-padded eval batches don't bias metrics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from small_vision_tpu.data import core as ds_core
from small_vision_tpu.data import pipeline
from small_vision_tpu.parallel.collectives import process_allgather


class Evaluator:
  """predict_fn: (train_state, batch) -> (logits, out); labels may be
  int or one-hot under `label_key`."""

  def __init__(self, predict_fn, *, mesh, batch_size, data, pp_fn="",
               label_key="label", cache_final=True):
    data = dict(data)
    source = ds_core.get(data.pop("name"), **data)
    self.iterate, self.device_pp, self.n_steps = pipeline.make_for_inference(
        source, pp_fn, mesh, batch_size)
    self.label_key = label_key

    @jax.jit
    def _eval_fn(train_state, batch, pp_rng):
      if self.device_pp is not None:
        batch = self.device_pp(dict(batch), pp_rng)
      mask = batch["_mask"]
      labels = batch[label_key]
      logits, *_ = predict_fn(train_state, batch)
      if labels.ndim == logits.ndim:          # one-hot
        y = jnp.argmax(labels, axis=-1)
        logp = jax.nn.log_softmax(logits)
        xent = -jnp.sum(labels * logp, axis=-1)
      else:
        y = labels
        logp = jax.nn.log_softmax(logits)
        xent = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
      correct = (jnp.argmax(logits, axis=-1) == y).astype(jnp.float32)
      return (jnp.sum(correct * mask), jnp.sum(xent * mask), jnp.sum(mask))
    self._eval_fn = _eval_fn

  def run(self, train_state):
    ncorrect = nloss = nseen = 0.0
    rng = jax.random.PRNGKey(0)
    for i, batch in enumerate(self.iterate()):
      if i >= self.n_steps:
        break
      rng, pp_rng = jax.random.split(rng)
      c, l, n = jax.device_get(self._eval_fn(train_state, batch, pp_rng))
      ncorrect += float(c)
      nloss += float(l)
      nseen += float(n)
    sums = process_allgather({"c": ncorrect, "l": nloss, "n": nseen})
    c, l, n = (np.sum(sums["c"]), np.sum(sums["l"]), np.sum(sums["n"]))
    yield "prec@1", c / max(n, 1)
    yield "loss", l / max(n, 1)
