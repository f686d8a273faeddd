"""Random token masking (MAE-style) — gather/scatter with static shapes.

Parity target: /root/reference/big_vision/models/ae.py:9-36. The keep-count
is static per mask ratio (`len_keep = int(L*(1-ratio))`), so everything jits
with fixed shapes; the shuffle is argsort-of-uniform (a random permutation
per row), the restore-scatter is a take_along_axis on the inverse
permutation — both map to TPU sort/gather units without one-hot
materialization.
"""

import jax
import jax.numpy as jnp


def random_masking(x, mask_ratio: float, rng):
  """Keeps a random `1-mask_ratio` fraction of tokens per sequence.

  Args:
    x: (B, L, D) token sequence.
    mask_ratio: static float in [0, 1).
    rng: PRNG key (the "mae_noise" stream).

  Returns:
    x_kept: (B, len_keep, D) the kept tokens, in shuffled order.
    mask: (B, L) float; 1 where the token was masked (removed), 0 kept.
    ids_restore: (B, L) inverse permutation for the decoder scatter.
  """
  b, l, _ = x.shape
  len_keep = int(l * (1.0 - mask_ratio))

  noise = jax.random.uniform(rng, (b, l))
  ids_shuffle = jnp.argsort(noise, axis=1)       # random permutation per row
  ids_restore = jnp.argsort(ids_shuffle, axis=1)  # its inverse

  ids_keep = ids_shuffle[:, :len_keep]
  x_kept = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)

  # mask in shuffled order: first len_keep are kept → unshuffle it.
  mask_shuffled = (jnp.arange(l)[None, :] >= len_keep).astype(x.dtype)
  mask = jnp.take_along_axis(
      jnp.broadcast_to(mask_shuffled, (b, l)), ids_restore, axis=1)
  return x_kept, mask, ids_restore


def restore_masked(x_kept, mask_token, ids_restore):
  """Decoder-side inverse: scatter kept tokens + mask tokens back to order.

  Args:
    x_kept: (B, len_keep, D) encoder outputs for kept tokens.
    mask_token: (1, 1, D) learned embedding for masked positions.
    ids_restore: (B, L) inverse permutation from `random_masking`.

  Returns:
    (B, L, D) full-length sequence in original patch order.
  """
  b, len_keep, d = x_kept.shape
  l = ids_restore.shape[1]
  mask_tokens = jnp.broadcast_to(mask_token, (b, l - len_keep, d))
  x_full = jnp.concatenate([x_kept, mask_tokens.astype(x_kept.dtype)], axis=1)
  return jnp.take_along_axis(x_full, ids_restore[:, :, None], axis=1)


def sequence_mask_to_image_mask(mask, patch_size: int, img_size: int):
  """Expands a (B, L) patch mask to a (B, H, W, 1) pixel mask."""
  g = img_size // patch_size
  m = mask.reshape(-1, g, g)
  m = jnp.repeat(jnp.repeat(m, patch_size, axis=1), patch_size, axis=2)
  return m[..., None]
