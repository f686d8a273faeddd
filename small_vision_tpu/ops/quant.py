"""Dynamic int8 matmul for the MXU (experimental, behind a model flag).

v5e MXU int8 throughput is 2x bf16 (394 vs 197 TOPS), and int8 operands
halve matmul HBM bytes — both levers on a step that sits between its
compute and bandwidth floors (STATUS.md roofline). This implements the
standard dynamic-quantization recipe:

  - activations: per-row (token) symmetric scale, absmax / 127
  - weights:     per-column symmetric scale, absmax / 127
  - accumulate in int32 on the MXU, rescale to the compute dtype

Backward is straight-through: the custom VJP differentiates the UNquantized
matmul from the saved bf16 operands (the quantizer's rounding has zero
gradient almost everywhere), so only the forward pays quantization error.
The reference has no quantized path — this is a TPU-native addition gated
off by default (`model.quant="int8_mlp"`), with the loss-curve deviation
measured in STATUS.md before any production use.
"""

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _quantize(v, axis):
  """Symmetric absmax int8 quantization along `axis` (reduced)."""
  scale = jnp.max(jnp.abs(v).astype(jnp.float32), axis=axis,
                  keepdims=True) / 127.0
  scale = jnp.maximum(scale, _EPS)
  q = jnp.clip(jnp.round(v.astype(jnp.float32) / scale), -127, 127)
  return q.astype(jnp.int8), scale


def _int8_matmul(x, w):
  """y = x @ w via int8 MXU dot; x: (..., K), w: (K, N)."""
  xq, sx = _quantize(x, axis=-1)          # sx: (..., 1)
  wq, sw = _quantize(w, axis=0)           # sw: (1, N)
  acc = jax.lax.dot_general(
      xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
      preferred_element_type=jnp.int32)
  return (acc.astype(jnp.float32) * sx * sw).astype(x.dtype)


@jax.custom_vjp
def int8_dot(x, w):
  """Quantized forward, straight-through full-precision backward."""
  return _int8_matmul(x, w)


def _fwd(x, w):
  return _int8_matmul(x, w), (x, w)


def _bwd(res, g):
  x, w = res
  g = g.astype(x.dtype)
  dx = jax.lax.dot_general(g, w, (((g.ndim - 1,), (1,)), ((), ())))
  x2 = x.reshape(-1, x.shape[-1])
  g2 = g.reshape(-1, g.shape[-1])
  dw = jax.lax.dot_general(x2, g2, (((0,), (0,)), ((), ())))
  return dx, dw.astype(w.dtype)


int8_dot.defvjp(_fwd, _bwd)


def quant_error(x, w):
  """Relative Frobenius error of the int8 fwd vs the exact matmul (for
  tests/diagnostics)."""
  exact = jnp.dot(x.astype(jnp.float32), w.astype(jnp.float32))
  approx = _int8_matmul(x, w).astype(jnp.float32)
  return jnp.linalg.norm(approx - exact) / jnp.maximum(
      jnp.linalg.norm(exact), _EPS)
