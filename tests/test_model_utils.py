"""Model-util coverage: posemb resampling, sincos posemb, MAPHead,
model_init warm-start."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from small_vision_tpu.models import vit as vit_mod


def test_resample_posemb():
  old = jnp.arange(1 * 16 * 8, dtype=jnp.float32).reshape(1, 16, 8)  # 4x4
  new = jnp.zeros((1, 64, 8))                                        # 8x8
  out = vit_mod.resample_posemb(old, new)
  assert out.shape == (1, 64, 8)
  # Same-shape passes through untouched.
  assert vit_mod.resample_posemb(old, old) is old
  # Corner values survive interpolation approximately.
  grid_old = np.asarray(old).reshape(4, 4, 8)
  grid_new = np.asarray(out).reshape(8, 8, 8)
  np.testing.assert_allclose(grid_new[0, 0], grid_old[0, 0], atol=1e-5)


def test_posemb_sincos_2d_properties():
  pe = vit_mod.posemb_sincos_2d(4, 4, 64)
  assert pe.shape == (1, 16, 64)
  arr = np.asarray(pe)
  assert np.isfinite(arr).all()
  # Distinct positions get distinct embeddings.
  assert len({tuple(np.round(r, 5)) for r in arr[0]}) == 16


def test_map_head_pooling():
  head = vit_mod.MAPHead(num_heads=4)
  x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 32))
  params = head.init(jax.random.PRNGKey(1), x)
  out = head.apply(params, x)
  assert out.shape == (2, 32)


@pytest.mark.slow
def test_model_init_warm_start(tmp_path):
  """train_ae warm-starts from a flat npz of params (zoo format)."""
  import ml_collections as mlc
  from small_vision_tpu.train import train_ae
  from small_vision_tpu.utils.checkpoint import save_params_npz
  from tests.test_train import smoke_config

  # 1) Short pretrain; export flat npz.
  cfg = smoke_config()
  cfg.total_steps = 2
  state, _ = train_ae.train_and_evaluate(cfg, str(tmp_path / "a"))
  npz = tmp_path / "zoo.npz"
  save_params_npz(str(npz), state["params"])

  # 2) Fresh run warm-started from the npz: initial params must match.
  cfg2 = smoke_config()
  cfg2.total_steps = 2
  cfg2.model_init = str(npz)
  state2, _ = train_ae.train_and_evaluate(cfg2, str(tmp_path / "b"))
  # After 2 tiny steps, embedding kernel stays close to the warm-start value
  # and far from a fresh random init.
  a = np.asarray(jax.device_get(state["params"]["embedding"]["kernel"]))
  b = np.asarray(jax.device_get(state2["params"]["embedding"]["kernel"]))
  assert np.abs(a - b).max() < 0.05 * np.abs(a).max()
