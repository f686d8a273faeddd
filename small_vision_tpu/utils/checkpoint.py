"""Async sharded checkpointing.

Parity target: the reference's tensorstore protocol
(/root/reference/big_vision/utils.py:886-1016): fully-sharded async saves
that never block the train step, atomic last-checkpoint semantics,
`keep`-forever checkpoints alongside a rolling latest, and restore that
deserializes straight into the target NamedShardings (no host staging).

Implementation: orbax `CheckpointManager` (async + atomic commit via tmp-dir
rename — the same -tmp/-LAST discipline the reference hand-rolled), with a
`StandardRestore` against an abstract pytree carrying shardings so arrays
land on device pre-sharded.
"""

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def make_manager(workdir: str, *, keep_period: Optional[int] = None,
                 max_to_keep: int = 1) -> ocp.CheckpointManager:
  """A manager writing under `{workdir}/checkpoints`.

  `keep_period`: steps multiple to retain forever (reference keep_ckpt_steps);
  others roll with `max_to_keep`.
  """
  directory = os.path.join(os.path.abspath(workdir), "checkpoints")
  options = ocp.CheckpointManagerOptions(
      max_to_keep=max_to_keep,
      keep_period=keep_period,
      enable_async_checkpointing=True,
      create=True)
  return ocp.CheckpointManager(directory, options=options)


def save(mngr: ocp.CheckpointManager, state: Any, step: int):
  """Starts an async save; returns immediately (train loop keeps going)."""
  mngr.save(step, args=ocp.args.StandardSave(state))


def abstract_like(state: Any, shardings: Any = None):
  """Builds the abstract restore target: shapes+dtypes (+shardings)."""
  def absify(x, s=None):
    if hasattr(x, "shape"):
      return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s)
    return x
  if shardings is None:
    return jax.tree.map(absify, state)
  return jax.tree.map(absify, state, shardings)


def restore(mngr: ocp.CheckpointManager, abstract_state: Any,
            step: Optional[int] = None):
  """Restores `step` (default: latest). Returns None if no checkpoint."""
  step = step if step is not None else mngr.latest_step()
  if step is None:
    return None
  return mngr.restore(step, args=ocp.args.StandardRestore(abstract_state))


def restore_subtree(mngr: ocp.CheckpointManager, key: str, abstract_subtree,
                    step: Optional[int] = None):
  """Restores one top-level entry (e.g. just "params") from a full-state
  checkpoint onto the shardings carried by `abstract_subtree`.

  Restores the full tree to host numpy first (no abstract target needed),
  then device_puts only the wanted subtree. Fine at ViT-L scale; a
  metadata-driven partial restore can replace this if states outgrow host
  RAM.
  """
  step = step if step is not None else mngr.latest_step()
  if step is None:
    return None
  restored = mngr.restore(step, args=ocp.args.StandardRestore())
  sub = restored[key]
  if key == "params":
    # Checkpoints from scan-stacked models load into unrolled models and
    # vice versa (reference parity: vit.py pyloop_to_scan converter).
    from small_vision_tpu.models.common import adapt_block_layout
    sub = adapt_block_layout(sub, abstract_subtree)
  shardings = jax.tree.map(
      lambda a: a.sharding if hasattr(a, "sharding") else None,
      abstract_subtree)
  return jax.device_put(sub, shardings)


def latest_step(mngr: ocp.CheckpointManager) -> Optional[int]:
  return mngr.latest_step()


def wait_until_finished(mngr: ocp.CheckpointManager):
  mngr.wait_until_finished()


def save_params_npz(path: str, params: Any, cast_floating=None):
  """Legacy flat-npz export (reference utils.py:200-287 zoo format).

  `cast_floating`: optional dtype (e.g. jnp.bfloat16) applied to floating
  leaves before writing — halves the weights sidecar for serving. numpy's
  npz cannot represent bfloat16 (it degrades to a void dtype on load), so
  bf16 leaves are stored as uint16 bit-views under `{key}::bf16`;
  `load_params_npz` reverses this.
  """
  import ml_dtypes
  from small_vision_tpu.utils.trees import tree_flatten_with_names
  pairs, _ = tree_flatten_with_names(params)
  out = {}
  for k, v in pairs:
    a = np.asarray(jax.device_get(v))
    if cast_floating is not None and np.issubdtype(a.dtype, np.floating):
      a = a.astype(cast_floating)
    if a.dtype == ml_dtypes.bfloat16:
      out[k + "::bf16"] = a.view(np.uint16)
    else:
      out[k] = a
  np.savez(path, **out)


def load_params_npz(path: str):
  import ml_dtypes
  from small_vision_tpu.utils.trees import recover_tree
  keys, values = [], []
  with np.load(path) as data:
    for k, v in data.items():
      if k.endswith("::bf16"):
        k, v = k[:-len("::bf16")], v.view(ml_dtypes.bfloat16)
      keys.append(k)
      values.append(v)
  return recover_tree(keys, values)
