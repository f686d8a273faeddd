"""scan↔pyloop block-layout conversion (checkpoint compatibility)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from small_vision_tpu.models import ae as ae_mod
from small_vision_tpu.models.common import (adapt_block_layout,
                                            pyloop_to_scan, scan_to_pyloop)

pytestmark = pytest.mark.slow

TINY = dict(width=32, depth=3, dec_depth=2, num_heads=4, img_size=16,
            patch_size=(4, 4), adaln=True, dtype_mm="float32")


def _init(scan):
  model = ae_mod._ViTAE(scan=scan, **TINY)
  x = jnp.zeros((2, 16, 16, 3))
  rngs = {"params": jax.random.PRNGKey(0),
          "mae_noise": jax.random.PRNGKey(1)}
  params = model.init(rngs, x, t=jnp.zeros((2,), jnp.int32), train=False,
                      mask=0.0)["params"]
  return model, params


def test_roundtrip_and_forward_equivalence():
  """Unrolled params converted to scan layout produce the SAME outputs."""
  model_loop, params_loop = _init(scan=False)
  model_scan, params_scan = _init(scan=True)

  converted = pyloop_to_scan(params_loop)
  # Structure matches the scan init.
  assert jax.tree.structure(converted) == jax.tree.structure(params_scan)

  x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
  t = jnp.zeros((2,), jnp.int32)
  out_loop, _ = model_loop.apply({"params": params_loop}, x, t=t)
  out_scan, _ = model_scan.apply({"params": converted}, x, t=t)
  np.testing.assert_allclose(np.asarray(out_loop), np.asarray(out_scan),
                             rtol=1e-5, atol=1e-6)

  # Full roundtrip is the identity.
  back = scan_to_pyloop(converted)
  for (n1, a), (n2, b) in zip(
      *(__import__("small_vision_tpu.utils.trees",
                   fromlist=["tree_flatten_with_names"])
        .tree_flatten_with_names(t)[0] for t in (params_loop, back))):
    assert n1 == n2
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_adapt_block_layout_dispatch():
  _, params_loop = _init(scan=False)
  _, params_scan = _init(scan=True)
  out = adapt_block_layout(params_loop, params_scan)
  assert jax.tree.structure(out) == jax.tree.structure(params_scan)
  out2 = adapt_block_layout(params_scan, params_loop)
  assert jax.tree.structure(out2) == jax.tree.structure(params_loop)
  # Matching structures pass through untouched.
  assert adapt_block_layout(params_loop, params_loop) is params_loop
