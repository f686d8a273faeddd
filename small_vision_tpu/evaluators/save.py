"""Inference-dump evaluator: writes predict_fn inputs+outputs to disk.

Parity target: /root/reference/big_vision/evaluators/save.py — gathers
outputs replicated, process 0 writes `{outfile}-{step}.npz`.
"""

import os

import jax
import numpy as np

from small_vision_tpu.data import core as ds_core
from small_vision_tpu.data import pipeline


class Evaluator:

  def __init__(self, predict_fn, *, mesh, batch_size, data, pp_fn="",
               outfile="inference.npz", workdir=None):
    data = dict(data)
    source = ds_core.get(data.pop("name"), **data)
    self.iterate, self.device_pp, self.n_steps = pipeline.make_for_inference(
        source, pp_fn, mesh, batch_size)
    self.outfile = os.path.join(workdir or ".", outfile)
    self._predict = jax.jit(predict_fn)

  def run(self, train_state):
    ins, outs = [], []
    rng = jax.random.PRNGKey(0)
    for i, batch in enumerate(self.iterate()):
      if i >= self.n_steps:
        break
      rng, pp_rng = jax.random.split(rng)
      batch = dict(batch)
      if self.device_pp is not None:
        batch = jax.jit(self.device_pp)(batch, pp_rng)
      # fetch_global: batch/pred shards span hosts with process_count>1
      # (device_get raises); every host assembles the full rows, process 0
      # writes (matching the reference's gather-then-write protocol).
      from small_vision_tpu.parallel.collectives import fetch_global
      mask = fetch_global(batch["_mask"]).astype(bool)
      pred, *_ = fetch_global(self._predict(train_state, batch))
      if pred is not None:
        outs.append(np.asarray(pred)[mask])
      ins.append(fetch_global(batch["image"])[mask])
    if jax.process_index() == 0:
      np.savez(self.outfile, inputs=np.concatenate(ins),
               outputs=np.concatenate(outs) if outs else np.zeros(0))
      yield "saved_examples", sum(x.shape[0] for x in ins)
