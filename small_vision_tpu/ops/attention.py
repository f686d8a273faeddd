"""Multi-head attention: XLA einsum path + fused Pallas TPU kernel.

The model's sequences are short (≈101–261 tokens for 64px/p4 UMD — reference
ae.py:68-69,139,162), so attention is bandwidth-bound, not memory-bound: the
win is fusing QK^T → softmax → PV into one VMEM-resident kernel per
(batch, head-block) so the (L,L) score matrix never touches HBM. No causal
mask, no KV cache (bidirectional encoder).

`attention(q, k, v, use_pallas=...)` picks the path; both compute softmax in
float32 regardless of input dtype (bf16-safe).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
  return ((x + m - 1) // m) * m


def xla_attention(q, k, v):
  """Reference path: einsum attention, fp32 softmax. Shapes [B,L,H,D]."""
  depth = q.shape[-1]
  scale = 1.0 / np.sqrt(depth)
  logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                      preferred_element_type=jnp.float32) * scale
  probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
  return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
                    preferred_element_type=jnp.float32).astype(q.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, seq_len):
  """One (batch, head-block) tile: full-sequence fused attention in VMEM.

  Block shapes: q/k/v/o = [HB, Lp, D] with Lp = padded seq len. Padded key
  positions are masked to -inf before the softmax; padded query rows compute
  garbage that the caller slices off.
  """
  q = q_ref[:].astype(jnp.float32)
  k = k_ref[:].astype(jnp.float32)
  v = v_ref[:].astype(jnp.float32)

  # scores[h, i, j] over the head block; batch dim of dot_general = heads.
  scores = jax.lax.dot_general(
      q, k, (((2,), (2,)), ((0,), (0,))),
      preferred_element_type=jnp.float32) * scale

  lp = q_ref.shape[1]
  key_pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lp), dimension=2)
  scores = jnp.where(key_pos < seq_len, scores, -jnp.inf)

  m = jnp.max(scores, axis=-1, keepdims=True)
  e = jnp.exp(scores - m)
  probs = e / jnp.sum(e, axis=-1, keepdims=True)

  out = jax.lax.dot_general(
      probs, v, (((2,), (1,)), ((0,), (0,))),
      preferred_element_type=jnp.float32)
  o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_attention(q, k, v, interpret=False):
  """Fused TPU attention for short sequences. Shapes [B,L,H,D].

  Pads L up to a lane multiple and D to 128, runs one grid step per
  (batch, head-block), then slices the padding back off.
  """
  b, l, h, d = q.shape
  lp = _round_up(l, 128)
  dp = _round_up(d, 128)
  scale = 1.0 / np.sqrt(d)

  # Heads per block: keep the block's VMEM footprint modest
  # (3 inputs + out + scores ≈ hb*(4*lp*dp + lp*lp) * 4B).
  hb = 1
  while h % (hb * 2) == 0 and hb * 2 * (4 * lp * dp + lp * lp) * 4 < 2**22:
    hb *= 2

  def pad(x):
    x = jnp.transpose(x, (0, 2, 1, 3))  # [B,H,L,D]
    return jnp.pad(x, ((0, 0), (0, 0), (0, lp - l), (0, dp - d)))

  qp, kp, vp = pad(q), pad(k), pad(v)

  grid = (b, h // hb)
  spec = pl.BlockSpec((1, hb, lp, dp), lambda i, j: (i, j, 0, 0),
                      memory_space=pltpu.VMEM)
  # Squeeze the leading batch block dim inside the kernel via index 0.
  def kernel(q_ref, k_ref, v_ref, o_ref):
    _attn_kernel(q_ref.at[0], k_ref.at[0], v_ref.at[0], o_ref.at[0],
                 scale=scale, seq_len=l)

  out = pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=[spec, spec, spec],
      out_specs=spec,
      out_shape=jax.ShapeDtypeStruct((b, h, lp, dp), q.dtype),
      interpret=interpret,
  )(qp, kp, vp)

  out = out[:, :, :l, :d]
  return jnp.transpose(out, (0, 2, 1, 3))  # back to [B,L,H,D]


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     *, scale, seq_len):
  """Fused attention backward for one (batch, head-block) tile.

  Recomputes S/P in VMEM (flash-style), then
    dV = Pᵀ dO;  dP = dO Vᵀ;  dS = P ∘ (dP − rowsum(dP∘P));
    dQ = dS K·scale;  dK = dSᵀ Q·scale.
  Nothing of size (L,L) ever touches HBM.
  """
  q = q_ref[:].astype(jnp.float32)
  k = k_ref[:].astype(jnp.float32)
  v = v_ref[:].astype(jnp.float32)
  do = do_ref[:].astype(jnp.float32)

  bd = (((2,), (2,)), ((0,), (0,)))          # contract D, batch over heads
  scores = jax.lax.dot_general(q, k, bd,
                               preferred_element_type=jnp.float32) * scale
  lp = q_ref.shape[1]
  key_pos = jax.lax.broadcasted_iota(jnp.int32, (1, 1, lp), dimension=2)
  scores = jnp.where(key_pos < seq_len, scores, -jnp.inf)
  m = jnp.max(scores, axis=-1, keepdims=True)
  e = jnp.exp(scores - m)
  p = e / jnp.sum(e, axis=-1, keepdims=True)        # (H, L, L)

  # dV[h] = P[h]ᵀ @ dO[h] → contract over query dim (axis 1 of both).
  dv = jax.lax.dot_general(p, do, (((1,), (1,)), ((0,), (0,))),
                           preferred_element_type=jnp.float32)
  # dP[h] = dO[h] @ V[h]ᵀ → contract over D.
  dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                           preferred_element_type=jnp.float32)
  ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
  # dQ[h] = dS[h] @ K[h] → contract over key dim.
  dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                           preferred_element_type=jnp.float32) * scale
  # dK[h] = dS[h]ᵀ @ Q[h] → contract over query dim.
  dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                           preferred_element_type=jnp.float32) * scale

  dq_ref[:] = dq.astype(dq_ref.dtype)
  dk_ref[:] = dk.astype(dk_ref.dtype)
  dv_ref[:] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_attention_bwd_impl(q, k, v, do, interpret=False):
  b, l, h, d = q.shape
  lp = _round_up(l, 128)
  dp_ = _round_up(d, 128)
  scale = 1.0 / np.sqrt(d)
  hb = 1
  while h % (hb * 2) == 0 and hb * 2 * (6 * lp * dp_ + 3 * lp * lp) * 4 < 2**22:
    hb *= 2

  def pad(x):
    x = jnp.transpose(x, (0, 2, 1, 3))
    return jnp.pad(x, ((0, 0), (0, 0), (0, lp - l), (0, dp_ - d)))

  qp, kp, vp, dop = pad(q), pad(k), pad(v), pad(do)
  grid = (b, h // hb)
  spec = pl.BlockSpec((1, hb, lp, dp_), lambda i, j: (i, j, 0, 0),
                      memory_space=pltpu.VMEM)

  def kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
    _attn_bwd_kernel(q_ref.at[0], k_ref.at[0], v_ref.at[0], do_ref.at[0],
                     dq_ref.at[0], dk_ref.at[0], dv_ref.at[0],
                     scale=scale, seq_len=l)

  shp = jax.ShapeDtypeStruct((b, h, lp, dp_), q.dtype)
  dq, dk, dv = pl.pallas_call(
      kernel, grid=grid,
      in_specs=[spec, spec, spec, spec],
      out_specs=(spec, spec, spec),
      out_shape=(shp, shp, shp),
      interpret=interpret,
  )(qp, kp, vp, dop)

  unpad = lambda x: jnp.transpose(x[:, :, :l, :d], (0, 2, 1, 3))
  return unpad(dq), unpad(dk), unpad(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, interpret=False):
  """Differentiable fused attention: Pallas fwd + Pallas bwd (recompute)."""
  return pallas_attention(q, k, v, interpret=interpret)


def _fused_attention_fwd(q, k, v, interpret):
  return pallas_attention(q, k, v, interpret=interpret), (q, k, v)


def _fused_attention_bwd(interpret, residuals, g):
  q, k, v = residuals
  return _pallas_attention_bwd_impl(q, k, v, g, interpret=interpret)


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def attention(q, k, v, use_pallas=False, interpret=False):
  if use_pallas:
    return fused_attention(q, k, v, interpret)
  return xla_attention(q, k, v)
