"""Attention: XLA path numerics + Pallas kernel parity (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from small_vision_tpu.ops.attention import (attention, pallas_attention,
                                            xla_attention)


def _qkv(b=2, l=37, h=4, d=16, dtype=jnp.float32, seed=0):
  ks = jax.random.split(jax.random.PRNGKey(seed), 3)
  return tuple(jax.random.normal(k, (b, l, h, d), dtype) for k in ks)


def test_xla_attention_matches_naive():
  q, k, v = _qkv()
  out = xla_attention(q, k, v)
  # Naive per-head loop.
  scale = 1 / np.sqrt(q.shape[-1])
  q_, k_, v_ = (np.asarray(t, np.float32) for t in (q, k, v))
  expected = np.zeros_like(q_)
  for b in range(q_.shape[0]):
    for h in range(q_.shape[2]):
      s = q_[b, :, h] @ k_[b, :, h].T * scale
      p = np.exp(s - s.max(-1, keepdims=True))
      p /= p.sum(-1, keepdims=True)
      expected[b, :, h] = p @ v_[b, :, h]
  np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_attention_softmax_rows_bounded():
  q, k, v = _qkv(l=5)
  out = xla_attention(q, k, 0 * v + 1.0)  # constant V → output exactly 1
  np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)


@pytest.mark.parametrize("l", [37, 128, 261])
def test_pallas_attention_parity_interpret(l):
  """The fused kernel (interpret mode on CPU) matches the XLA path,
  including non-aligned sequence lengths that exercise the padding mask."""
  q, k, v = _qkv(b=2, l=l, h=4, d=16)
  ref = xla_attention(q, k, v)
  out = pallas_attention(q, k, v, interpret=True)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             rtol=1e-4, atol=1e-5)


def test_attention_dispatch():
  q, k, v = _qkv(l=8)
  np.testing.assert_allclose(
      np.asarray(attention(q, k, v, use_pallas=False)),
      np.asarray(attention(q, k, v, use_pallas=True, interpret=True)),
      rtol=1e-4, atol=1e-5)


def test_attention_bf16_stability():
  q, k, v = _qkv(dtype=jnp.bfloat16)
  out = xla_attention(10.0 * q, 10.0 * k, v)  # large logits, fp32 softmax
  assert out.dtype == jnp.bfloat16
  assert np.isfinite(np.asarray(out, np.float32)).all()
