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


def fetch_global(tree):
  """Fetches (possibly non-addressable) global arrays to host numpy.

  `jax.device_get` raises on a multi-process global array whose shards span
  other hosts (every evaluator that pulls per-example outputs — fewshot
  representations, save/sampling images — hits this with process_count>1).
  Fully-replicated and fully-addressable arrays fetch directly; batch-dim-0
  sharded arrays are reassembled by allgathering each host's contiguous
  row block (device order puts each process's shards contiguously on dim 0,
  parallel/mesh.py make_mesh).
  """
  def fetch(x):
    if not isinstance(x, jax.Array):
      return None if x is None else np.asarray(x)
    if x.is_fully_addressable:
      return np.asarray(jax.device_get(x))
    if x.is_fully_replicated:
      return np.asarray(x.addressable_data(0))
    by_start = {}  # dedupe: shards replicated across non-batch axes
    for s in x.addressable_shards:
      for dim_idx in s.index[1:]:
        assert dim_idx == slice(None, None, None), (
            f"fetch_global supports dim-0 (batch) sharding only, got index "
            f"{s.index} for shape {x.shape}")
      by_start.setdefault(s.index[0].start or 0, s)
    local = np.concatenate(
        [np.asarray(by_start[k].data) for k in sorted(by_start)], axis=0)
    return multihost_utils.process_allgather(local, tiled=True)
  return jax.tree.map(fetch, tree, is_leaf=lambda v: v is None)


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
