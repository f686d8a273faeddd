"""Gradient parity: Pallas fused attention VJP vs XLA autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from small_vision_tpu.ops.attention import fused_attention, xla_attention

pytestmark = pytest.mark.slow


def _qkv(b=2, l=37, h=4, d=16, seed=0):
  ks = jax.random.split(jax.random.PRNGKey(seed), 3)
  return tuple(jax.random.normal(k, (b, l, h, d), jnp.float32) for k in ks)


@pytest.mark.parametrize("l", [16, 37, 130])
def test_fused_attention_grads_match_xla(l):
  q, k, v = _qkv(l=l)

  def loss_pallas(q, k, v):
    o = fused_attention(q, k, v, True)  # interpret mode on CPU
    return jnp.sum(jnp.sin(o))

  def loss_xla(q, k, v):
    return jnp.sum(jnp.sin(xla_attention(q, k, v)))

  gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
  gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
  for a, b, name in zip(gp, gx, "qkv"):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-3, atol=2e-4,
                               err_msg=f"d{name} mismatch")


def test_fused_attention_value_matches():
  q, k, v = _qkv(l=61)
  np.testing.assert_allclose(
      np.asarray(fused_attention(q, k, v, True)),
      np.asarray(xla_attention(q, k, v)), rtol=1e-4, atol=1e-5)


def test_model_trains_with_pallas_attention():
  """The AE model end-to-end with attn_impl=pallas_interpret on CPU."""
  from small_vision_tpu.models import ae as ae_mod
  model = ae_mod._ViTAE(width=64, depth=1, dec_depth=1, num_heads=4,
                        img_size=16, patch_size=(4, 4), scan=False,
                        adaln=True, dtype_mm="float32",
                        attn_impl="pallas_interpret")
  x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
  t = jnp.zeros((2,), jnp.int32)
  rngs = {"params": jax.random.PRNGKey(0),
          "mae_noise": jax.random.PRNGKey(1)}
  params = model.init(rngs, x, t=t, train=False, mask=0.5)["params"]

  def loss(p):
    pred, _ = model.apply({"params": p}, x, t=t, train=False, mask=0.5,
                          rngs={"mae_noise": jax.random.PRNGKey(1)})
    return jnp.mean(pred ** 2)

  g = jax.grad(loss)(params)
  assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))
