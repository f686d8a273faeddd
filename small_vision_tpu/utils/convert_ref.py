"""Bidirectional UMD checkpoint conversion: reference <-> small_vision_tpu.

The reference (/root/reference/big_vision/models/ae.py) and this framework
define the same UMD architecture with diverged param names/layouts:

  reference                                  this framework
  -----------------------------------------  ----------------------------
  {Enc,Dec}oder/ScanCheckpointEncoder1DBlock_0/  {Enc,Dec}oder/blocks/
  {Enc,Dec}oder/encoderblock_{i}/ (pyloop)       same path via scan<->pyloop
  MultiHeadDotProductAttention_0             MultiHeadAttention_0
  image_mask_embedding                       mask_token
  label_emb/                                 label_embed/
  final_conv (ConvTranspose k=(p,p,W,2c))    head (Dense (W, p*p*2c), no bias)
  final_conv/bias (2c,)                      head_bias (2c, per-channel)

The final_conv<->head mapping is exact BOTH ways: a stride-p VALID
ConvTranspose whose kernel equals the patch size computes
out[gp+i, gq+j, c] = sum_d x[g,h,d] * K[i,j,d,c] + b[c], which is the
Dense-unpatchify with W[d, (i*p+j)*C + c] = K[i,j,d,c] (models/ae.py decode
rearranges '(ph pw c)'). The bias is per-channel on both sides (the model
ties it across patch positions precisely so conversion and training
dynamics match the reference — see models/ae.py head_bias).
"""

from typing import Tuple

import numpy as np

_SCAN_BLOCK_REF = "ScanCheckpointEncoder1DBlock_0"
_SCAN_BLOCK_OURS = "blocks"
_NAME_MAP_REF_TO_OURS = {
    "image_mask_embedding": "mask_token",
    "label_emb": "label_embed",
}


def _flatten(tree, prefix=()):
  if isinstance(tree, dict):
    out = {}
    for k, v in tree.items():
      out.update(_flatten(v, prefix + (k,)))
    return out
  return {"/".join(prefix): np.asarray(tree)}


def _unflatten(flat):
  tree = {}
  for path, leaf in flat.items():
    node = tree
    keys = path.split("/")
    for k in keys[:-1]:
      node = node.setdefault(k, {})
    node[keys[-1]] = leaf
  return tree


def _rename(path: str, mapping, scan_from: str, scan_to: str) -> str:
  parts = path.split("/")
  parts = [mapping.get(p, p) for p in parts]
  parts = [scan_to if p == scan_from else p for p in parts]
  return "/".join(parts)


def head_from_final_conv(kernel: np.ndarray) -> np.ndarray:
  """ConvTranspose (p, p, width, C) kernel -> Dense (width, p*p*C).

  flax.linen.ConvTranspose (transpose_kernel=False) spatially FLIPS the
  kernel: output pixel (i, j) of a patch reads K[p-1-i, p-1-j, :, :]
  (verified empirically with one-hot kernels), so the Dense weight for
  output slot (i, j, c) is the flipped tap. The bias converts as identity
  (per-channel on both sides).
  """
  p, p2, width, c = kernel.shape
  assert p == p2, kernel.shape
  return kernel[::-1, ::-1].transpose(2, 0, 1, 3).reshape(width, p * p * c)


def final_conv_from_head(kernel: np.ndarray, patch: int) -> np.ndarray:
  """Dense (width, p*p*C) -> ConvTranspose (p, p, width, C). Exact."""
  width, pc = kernel.shape
  c = pc // (patch * patch)
  k = kernel.reshape(width, patch, patch, c).transpose(1, 2, 0, 3)
  return k[::-1, ::-1]  # Undo the ConvTranspose spatial flip (see above).


def ref_to_ours(ref_params, patch_size: int):
  """Converts a reference _ViTAE param tree to this framework's layout.

  Handles both scan and pyloop reference layouts into OUR scan layout for
  the block stacks; use models/common.py scan_to_pyloop afterwards if a
  pyloop layout is needed.
  """
  flat = _flatten(_to_pure_dict(ref_params))
  out = {}
  conv_kernel = conv_bias = None
  for path, leaf in flat.items():
    if path.startswith("final_conv/"):
      if path.endswith("kernel"):
        conv_kernel = leaf
      else:
        conv_bias = leaf
      continue
    new = _rename(path, _NAME_MAP_REF_TO_OURS, _SCAN_BLOCK_REF,
                  _SCAN_BLOCK_OURS)
    new = new.replace("MultiHeadDotProductAttention_0",
                      "MultiHeadAttention_0")
    out[new] = leaf
  assert conv_kernel is not None and conv_bias is not None, (
      "reference checkpoint lacks final_conv")
  out["head/kernel"] = head_from_final_conv(conv_kernel)
  out["head_bias"] = np.asarray(conv_bias)
  return _unflatten(out)


def ours_to_ref(params, patch_size: int):
  """Converts this framework's param tree back to the reference layout.

  Exact (lossless) both ways: the head bias is per-channel on both sides.
  """
  flat = _flatten(_to_pure_dict(params))
  inv = {v: k for k, v in _NAME_MAP_REF_TO_OURS.items()}
  out = {}
  head_kernel = head_bias = None
  for path, leaf in flat.items():
    if path == "head_bias":
      head_bias = leaf
      continue
    if path.startswith("head/"):
      head_kernel = leaf
      continue
    new = _rename(path, inv, _SCAN_BLOCK_OURS, _SCAN_BLOCK_REF)
    new = new.replace("MultiHeadAttention_0",
                      "MultiHeadDotProductAttention_0")
    out[new] = leaf
  assert head_kernel is not None and head_bias is not None, (
      "checkpoint lacks the Dense head")
  out["final_conv/kernel"] = final_conv_from_head(head_kernel, patch_size)
  out["final_conv/bias"] = np.asarray(head_bias)
  return _unflatten(out)


def _to_pure_dict(tree):
  unfreeze = getattr(tree, "unfreeze", None)
  tree = unfreeze() if unfreeze else tree
  if isinstance(tree, dict):
    return {k: _to_pure_dict(v) for k, v in tree.items()}
  return tree
