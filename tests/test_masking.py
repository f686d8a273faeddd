"""Tests for MAE random masking: gather/scatter inverse property."""

import jax
import jax.numpy as jnp
import numpy as np

from small_vision_tpu.ops.masking import (random_masking, restore_masked,
                                          sequence_mask_to_image_mask)


def test_masking_shapes_and_ratio():
  x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 8))
  x_kept, mask, ids_restore = random_masking(x, 0.75, jax.random.PRNGKey(1))
  assert x_kept.shape == (4, 4, 8)
  assert mask.shape == (4, 16) and ids_restore.shape == (4, 16)
  np.testing.assert_array_equal(np.asarray(mask.sum(1)), 12.0)


def test_gather_scatter_inverse():
  """Kept tokens scattered back land at their original positions, and masked
  positions receive the mask token."""
  x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 4))
  x_kept, mask, ids_restore = random_masking(x, 0.5, jax.random.PRNGKey(1))
  mask_token = jnp.full((1, 1, 4), -777.0)
  restored = restore_masked(x_kept, mask_token, ids_restore)

  mask_np = np.asarray(mask)
  x_np, r_np = np.asarray(x), np.asarray(restored)
  kept = mask_np == 0
  np.testing.assert_allclose(r_np[kept], x_np[kept], rtol=1e-6)
  assert (r_np[~kept] == -777.0).all()


def test_mask_is_random_per_batch_row():
  x = jnp.zeros((8, 16, 2))
  _, mask, _ = random_masking(x, 0.5, jax.random.PRNGKey(3))
  assert len({tuple(r) for r in np.asarray(mask)}) > 1


def test_zero_ratio_keeps_everything():
  x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 4))
  x_kept, mask, _ = random_masking(x, 0.0, jax.random.PRNGKey(1))
  assert x_kept.shape == x.shape
  assert float(mask.sum()) == 0.0


def test_sequence_mask_to_image_mask():
  mask = jnp.asarray([[0., 1., 1., 0.]])  # 2x2 grid of patches
  img_mask = sequence_mask_to_image_mask(mask, patch_size=2, img_size=4)
  assert img_mask.shape == (1, 4, 4, 1)
  expected = np.array([[0, 0, 1, 1], [0, 0, 1, 1],
                       [1, 1, 0, 0], [1, 1, 0, 0]], np.float32)
  np.testing.assert_array_equal(np.asarray(img_mask)[0, :, :, 0], expected)
