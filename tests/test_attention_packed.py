"""Packed-layout fused attention: value and gradient parity vs XLA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from small_vision_tpu.ops.attention import (fused_attention_packed,
                                            xla_attention)


def _qkv(b=2, l=37, h=4, d=16, seed=0):
  ks = jax.random.split(jax.random.PRNGKey(seed), 3)
  return tuple(jax.random.normal(k, (b, l, h, d), jnp.float32) for k in ks)


@pytest.mark.parametrize("l", [16, 37, 130])
def test_packed_value_and_grads(l):
  q, k, v = _qkv(l=l)
  b, _, h, d = q.shape
  pack = lambda x: x.reshape(b, l, h * d)

  ref = xla_attention(q, k, v)
  out = fused_attention_packed(pack(q), pack(k), pack(v), h, True)
  np.testing.assert_allclose(np.asarray(out.reshape(ref.shape)),
                             np.asarray(ref), rtol=1e-4, atol=1e-5)

  def loss_packed(q, k, v):
    o = fused_attention_packed(pack(q), pack(k), pack(v), h, True)
    return jnp.sum(jnp.sin(o))

  def loss_xla(q, k, v):
    return jnp.sum(jnp.sin(xla_attention(q, k, v).reshape(b, l, h * d)))

  gp = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
  gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
  for a, bb, name in zip(gp, gx, "qkv"):
    np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                               rtol=2e-3, atol=2e-4,
                               err_msg=f"d{name} mismatch")


def test_packed_large_logit_parity():
  """Below the kernel's ±80 log2-clamp the UNSHIFTED exp2 softmax is exact:
  3x-scaled N(0,1) inputs give logit std ~9 (5-sigma tails ~±65 in log2
  units, inside the clamp), and the packed kernel must still match XLA's
  max-shifted softmax (values + grads).
  """
  q, k, v = _qkv(l=37, seed=3)
  q, k = 3.0 * q, 3.0 * k
  b, l, h, d = q.shape
  pack = lambda x: x.reshape(b, l, h * d)
  ref = xla_attention(q, k, v)
  out = fused_attention_packed(pack(q), pack(k), pack(v), h, True)
  np.testing.assert_allclose(np.asarray(out.reshape(ref.shape)),
                             np.asarray(ref), rtol=1e-4, atol=1e-5)
  gp = jax.grad(lambda *a: jnp.sum(jnp.sin(
      fused_attention_packed(*map(pack, a), h, True))))(q, k, v)
  gx = jax.grad(lambda *a: jnp.sum(jnp.sin(
      xla_attention(*a).reshape(b, l, h * d))))(q, k, v)
  np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                             rtol=2e-3, atol=2e-4)


def test_packed_insane_logit_finite():
  """Past the clamp the softmax degrades gracefully (uniform over clamped),
  never to inf/NaN — 100x inputs push logits to ~±2e4 in log2 units."""
  q, k, v = _qkv(l=37, seed=4)
  b, l, h, d = q.shape
  pack = lambda x: x.reshape(b, l, h * d)
  out = fused_attention_packed(pack(100.0 * q), pack(100.0 * k), pack(v),
                               h, True)
  assert np.isfinite(np.asarray(out, np.float32)).all()
  g = jax.grad(lambda *a: jnp.sum(fused_attention_packed(
      pack(100.0 * a[0]), pack(100.0 * a[1]), pack(a[2]), h, True)))(q, k, v)
  assert all(np.isfinite(np.asarray(x, np.float32)).all() for x in g)
