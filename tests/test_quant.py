"""Dynamic int8 matmul path (ops/quant.py, model.quant="int8_mlp")."""

import jax
import jax.numpy as jnp
import numpy as np

from small_vision_tpu.ops import quant


def test_int8_dot_error_bounded():
  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.normal(size=(64, 128)), jnp.float32)
  w = jnp.asarray(rng.normal(size=(128, 256)), jnp.float32)
  err = float(quant.quant_error(x, w))
  assert err < 0.02, err  # ~1% for gaussian operands
  # Outlier robustness: per-row/per-col scales localize a single huge entry.
  x = x.at[3, 7].set(1000.0)
  err = float(quant.quant_error(x, w))
  assert err < 0.05, err


def test_int8_dot_backward_is_straight_through():
  rng = np.random.default_rng(1)
  x = jnp.asarray(rng.normal(size=(8, 16)), jnp.bfloat16)
  w = jnp.asarray(rng.normal(size=(16, 32)), jnp.bfloat16)
  g = jnp.ones((8, 32), jnp.bfloat16)
  _, vjp = jax.vjp(quant.int8_dot, x, w)
  dx, dw = vjp(g)
  np.testing.assert_allclose(
      np.asarray(dx, np.float32), np.asarray(g @ w.T, np.float32),
      rtol=1e-2, atol=1e-2)
  np.testing.assert_allclose(
      np.asarray(dw, np.float32), np.asarray(x.T @ g, np.float32),
      rtol=1e-2, atol=1e-2)


def test_model_int8_mlp_close_to_exact():
  from small_vision_tpu.models import ae as ae_mod
  kw = dict(width=64, depth=2, dec_depth=1, num_heads=4, img_size=16,
            patch_size=(4, 4), dtype_mm="float32", scan=True, adaln=True)
  r = jax.random.PRNGKey(0)
  rngs = {"params": r, "dropout": r, "mae_noise": r, "cfg": r}
  x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 3)),
                  jnp.float32)
  t = jnp.ones((2,), jnp.int32)
  exact_m = ae_mod._ViTAE(**kw)
  params = exact_m.init(rngs, x, t=t)["params"]
  exact, _ = exact_m.apply({"params": params}, x, t=t, train=False)
  q_m = ae_mod._ViTAE(**kw, quant="int8_mlp")
  approx, _ = q_m.apply({"params": params}, x, t=t, train=False)
  # Same params, quantized MLP matmuls: small relative output deviation.
  rel = float(jnp.linalg.norm(approx - exact) / jnp.linalg.norm(exact))
  assert rel < 0.05, rel
