"""Pytree utilities keyed by human-readable slash-paths.

Parity target: the tree helpers in the reference's utility substrate
(/root/reference/big_vision/utils.py:650-883) — reimplemented on top of
`jax.tree_util` key-paths instead of a hand-rolled traversal.

Names are slash-joined key paths, e.g. ``"encoder/block/kernel"``; leading
slashes are never produced.  Dict keys are sorted by JAX's registered pytree
order, so names line up with flattened leaves.
"""

import re
from typing import Any, Callable, Mapping, Sequence

import jax
import numpy as np


def _key_to_str(k) -> str:
  """Renders one tree_util KeyEntry as a path segment."""
  if isinstance(k, jax.tree_util.DictKey):
    return str(k.key)
  if isinstance(k, jax.tree_util.SequenceKey):
    return str(k.idx)
  if isinstance(k, jax.tree_util.GetAttrKey):
    return str(k.name)
  if isinstance(k, jax.tree_util.FlattenedIndexKey):
    return str(k.key)
  return str(k)


def path_to_name(path) -> str:
  return "/".join(_key_to_str(k) for k in path)


def tree_flatten_with_names(tree):
  """Flattens a pytree into (name, leaf) pairs plus the treedef.

  Returns:
    A list of ``(name, leaf)`` tuples in flatten order, and the treedef.
  """
  pairs, treedef = jax.tree_util.tree_flatten_with_path(tree)
  return [(path_to_name(p), v) for p, v in pairs], treedef


def tree_map_with_names(f: Callable, tree, *rest):
  """Like tree_map but ``f`` receives the leaf name as first argument."""
  pairs, treedef = jax.tree_util.tree_flatten_with_path(tree)
  names = [path_to_name(p) for p, _ in pairs]
  leaves = [v for _, v in pairs]
  rest_leaves = [treedef.flatten_up_to(r) for r in rest]
  out = [f(name, leaf, *extra)
         for name, leaf, *extra in zip(names, leaves, *rest_leaves)]
  return treedef.unflatten(out)


def tree_map_with_regex(f: Callable, tree, regexes: Sequence[str], *rest,
                        not_f: Callable = lambda v, *_: v):
  """Applies ``f`` only to leaves whose name fully matches any regex."""
  compiled = [re.compile(p) for p in regexes]

  def _maybe(name, leaf, *extra):
    if any(p.fullmatch(name) for p in compiled):
      return f(leaf, *extra)
    return not_f(leaf, *extra)

  return tree_map_with_names(_maybe, tree, *rest)


def make_mask_trees(tree, patterns: Sequence[str]):
  """One boolean mask tree per pattern; each leaf True in at most one mask.

  Earlier patterns win, matching the reference's regex-mask semantics
  (/root/reference/big_vision/utils.py:1173-1216).
  """
  compiled = [re.compile(p) for p in patterns]

  def which(name):
    for i, p in enumerate(compiled):
      if p.fullmatch(name):
        return i
    return -1

  masks = []
  for i in range(len(patterns)):
    masks.append(tree_map_with_names(
        lambda name, _, i=i: which(name) == i, tree))
  return masks


def tree_get(tree, name: str):
  """Fetches a subtree/leaf by slash-path name."""
  node = tree
  for part in name.split("/"):
    if isinstance(node, Mapping):
      node = node[part]
    elif isinstance(node, (list, tuple)):
      node = node[int(part)]
    else:
      node = getattr(node, part)
  return node


def recover_tree(keys: Sequence[str], values: Sequence[Any]):
  """Rebuilds a nested dict from slash-path keys (inverse of flatten)."""
  tree = {}
  for k, v in zip(keys, values):
    parts = k.split("/")
    node = tree
    for p in parts[:-1]:
      node = node.setdefault(p, {})
    node[parts[-1]] = v
  return tree


def tree_broadcast(prefix, target):
  """Broadcasts a prefix-tree over a full tree (leaf of prefix → subtree)."""
  def _broadcast(p, t):
    return jax.tree.map(lambda _: p, t)
  return jax.tree.map(_broadcast, prefix, target,
                      is_leaf=lambda x: x is None or not isinstance(x, dict))


def tree_size(tree) -> int:
  """Total number of scalar elements across all leaves."""
  return sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(tree))
