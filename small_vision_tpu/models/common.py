"""Model-common utilities: checkpoint↔init reconciliation, posemb module.

Parity target: /root/reference/big_vision/models/common.py —
`merge_params(loaded, inited, dont_load)` (:24-89) reconciles a restored
parameter tree with a freshly initialized one (regex-named exceptions keep
their fresh init — e.g. a new classification head), and `AddPositionEmbs`
with a decode-time cache (:92-130).
"""

import re
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from small_vision_tpu.utils.trees import (recover_tree,
                                          tree_flatten_with_names)


def merge_params(loaded, inited, dont_load: Sequence[str] = ()):
  """Merges a restored tree into an init tree.

  Rules (reference semantics):
    - names matching any `dont_load` regex keep their fresh init value;
    - names present in both must agree (shape-checked) and take the loaded
      value;
    - names only in `inited` keep init IF matched by dont_load, else error;
    - names only in `loaded` are dropped IF matched by dont_load, else error.
  """
  patterns = [re.compile(p) for p in dont_load]

  def skip(name):
    return any(p.fullmatch(name) for p in patterns)

  loaded_flat = dict(tree_flatten_with_names(loaded)[0])
  inited_flat = dict(tree_flatten_with_names(inited)[0]) if inited else {}

  merged = {}
  for name, init_val in inited_flat.items():
    if skip(name) or name not in loaded_flat:
      if name not in loaded_flat and not skip(name):
        raise ValueError(
            f"Param {name} not found in checkpoint and not in dont_load.")
      merged[name] = init_val
    else:
      load_val = loaded_flat[name]
      if tuple(jnp.shape(load_val)) != tuple(jnp.shape(init_val)):
        raise ValueError(
            f"Shape mismatch for {name}: ckpt {jnp.shape(load_val)} vs "
            f"init {jnp.shape(init_val)}")
      merged[name] = load_val

  for name, load_val in loaded_flat.items():
    if name not in merged:
      if not skip(name) and inited_flat:
        raise ValueError(
            f"Checkpoint param {name} has no target and isn't in dont_load.")
      if not inited_flat:
        merged[name] = load_val

  return recover_tree(*zip(*merged.items())) if merged else {}


def pyloop_to_scan(params):
  """Converts unrolled block params (blocks_00..blocks_NN) to the
  scan-stacked layout (one 'blocks' subtree with a leading depth dim).

  Reference parity: big_vision/models/vit.py:356-379 (opposite naming).
  Applied recursively so Encoder and Decoder both convert.
  """

  def convert(node):
    if not isinstance(node, dict):
      return node
    node = {k: convert(v) for k, v in node.items()}
    block_keys = sorted(k for k in node
                        if re.fullmatch(r"blocks_\d+", k))
    if block_keys:
      stacked = jax.tree.map(
          lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
          *[node[k] for k in block_keys])
      node = {k: v for k, v in node.items() if k not in block_keys}
      node["blocks"] = stacked
    return node
  return convert(params)


def scan_to_pyloop(params):
  """Inverse of pyloop_to_scan: splits 'blocks' stacks into blocks_NN."""

  def convert(node):
    if not isinstance(node, dict):
      return node
    node = {k: convert(v) for k, v in node.items()}
    if "blocks" in node and isinstance(node["blocks"], dict):
      depth = jnp.shape(jax.tree.leaves(node["blocks"])[0])[0]
      stacked = node.pop("blocks")
      for i in range(depth):
        node[f"blocks_{i:02d}"] = jax.tree.map(lambda x: x[i], stacked)
    return node
  return convert(params)


def adapt_block_layout(params, target_structure):
  """Converts params between scan/pyloop layouts to match a target tree."""
  from small_vision_tpu.utils.trees import tree_flatten_with_names
  have = {n for n, _ in tree_flatten_with_names(params)[0]}
  want = {n for n, _ in tree_flatten_with_names(target_structure)[0]}
  if have == want:
    return params
  if any("/blocks_" in n for n in have) and any(
      "/blocks/" in n for n in want):
    return pyloop_to_scan(params)
  if any("/blocks/" in n for n in have) and any(
      "/blocks_" in n for n in want):
    return scan_to_pyloop(params)
  return params


class AddPositionEmbs(nn.Module):
  """Learned position embeddings with an autoregressive-decode cache."""
  decode: bool = False

  @nn.compact
  def __call__(self, inputs):
    assert inputs.ndim == 3, f"Expected (B, L, D), got {inputs.shape}"
    posemb = self.param(
        "pos_embedding", nn.initializers.normal(stddev=0.02),
        (1, inputs.shape[1], inputs.shape[2]))

    if self.decode:
      is_initialized = self.has_variable("cache", "cache_index")
      cache_index = self.variable(
          "cache", "cache_index", lambda: jnp.array(0, jnp.uint32))
      if is_initialized:
        i = cache_index.value
        cache_index.value = i + 1
        _, _, df = posemb.shape
        posemb = jax.lax.dynamic_slice(posemb, (0, i, 0), (1, 1, df))
    return inputs + posemb
