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
