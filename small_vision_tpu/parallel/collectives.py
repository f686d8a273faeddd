"""Host-level collectives for metric gathering and broadcast.

Parity target: `gather_metrics` (/root/reference/big_vision/utils.py:47-62),
`multihost_utils.process_allgather` / `broadcast_one_to_all` usage across the
evaluators. Every helper has a single-process fast path so the same code runs
in tests and on pods.
"""

import jax
import numpy as np
from jax.experimental import multihost_utils


def process_allgather(tree, tiled: bool = True):
  """All-gathers per-process values to every host (concat on axis 0)."""
  if jax.process_count() == 1:
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)
  return multihost_utils.process_allgather(tree, tiled=tiled)


def broadcast_one_to_all(tree):
  """Broadcasts process 0's values to all processes."""
  if jax.process_count() == 1:
    return tree
  return multihost_utils.broadcast_one_to_all(tree)


def gather_metrics(value):
  """Gathers a (possibly per-host) metric into host numpy.

  Scalars pass through; device arrays sharded over hosts are allgathered and
  flattened so every process sees identical values for logging.
  """
  if np.isscalar(value) or (hasattr(value, "ndim") and value.ndim == 0):
    return float(jax.device_get(value))
  gathered = process_allgather(value)
  return jax.tree.map(lambda x: np.asarray(x).reshape(-1, *np.shape(x)[2:])
                      if np.ndim(x) > 1 else np.asarray(x), gathered)
