"""Module-granular fused Pallas TPU kernels: MHA-with-projections and MLP.

The training/sampling step at UMD-B/4 shapes is HBM-bandwidth bound (xprof:
~92% duty cycle, ~168 GB touched per step vs 819 GB/s on v5e). Per block the
forward makes ~12 HBM passes over the (B, L, D) stream: q/k/v/out projections
and the two MLP matmuls each read and write their operands. These kernels
collapse that to 2 passes per module:

  fused_mha:  o = (attention(x@Wq, x@Wk, x@Wv)) @ Wo + bo   — one x read,
              one o write; q/k/v/scores/head-outs never leave VMEM.
  fused_mlp:  y = gelu(x@W1 + b1) @ W2 + b2                 — one x read,
              one y write; the (L, 4D) hidden never leaves VMEM.

Weights ride as VMEM blocks (QKV+out ≈ 4.7 MB, MLP ≈ 9.4 MB bf16 — far under
the 128 MB VMEM), revisited across grid steps.

Backward is a custom VJP that recomputes through a reference composition in
which the attention core uses the existing packed Pallas attention VJP
(ops/attention.py) — the big matmul-grad work stays on the MXU via XLA while
the fused forward keeps its 2-pass HBM profile.

Parity anchor: computes exactly MultiHeadAttention/MlpBlock of
models/vit.py (reference models/vit.py:39-113) with flax's default
approximate (tanh) gelu.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from small_vision_tpu.ops.attention import fused_attention_packed


def _round_up(x, m):
  return ((x + m - 1) // m) * m


def _pick_bb(b, stack_bytes_per_row, weight_bytes=0, budget=11 * 2**20):
  """Rows per grid step bounded by the 16 MB scoped-VMEM stack limit.

  `weight_bytes` counts the weight blocks also resident in VMEM (MLP is
  ~9.4 MB bf16 at width 768, growing quadratically) — they share the same
  budget, so larger variants (L/H widths) must shrink bb or fail loudly
  here rather than with an opaque Mosaic VMEM-exhaustion compile error.
  """
  avail = budget - weight_bytes
  for bb in (8, 4, 2, 1):
    if b % bb == 0 and bb * stack_bytes_per_row <= avail:
      return bb
  if stack_bytes_per_row > avail:
    raise ValueError(
        f"fused block kernel cannot fit in VMEM: {weight_bytes/2**20:.1f} MB "
        f"weights + {stack_bytes_per_row/2**20:.1f} MB/row of stack exceeds "
        f"the {budget/2**20:.0f} MB scoped-VMEM budget even at bb=1; use the "
        "unfused path (attn_impl='pallas') for this width.")
  return 1


# ---------------------------------------------------------------------------
# Fused MHA: projections + attention + out-projection
# ---------------------------------------------------------------------------


def _mha_kernel(x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                wo_ref, bo_ref, o_ref, *, scale, seq_len, bb, num_heads,
                head_dim):
  lp = x_ref.shape[1]
  key_pos = jax.lax.broadcasted_iota(jnp.int32, (1, lp), dimension=1)
  key_mask = key_pos < seq_len
  row_mask = jax.lax.broadcasted_iota(
      jnp.int32, (1, lp, 1), dimension=1) < seq_len
  # OOB block rows are garbage HBM reads (may be NaN/Inf): zero at the source.
  x_all = jnp.where(row_mask, x_ref[...], jnp.zeros((), x_ref.dtype))

  wq, wk, wv, wo = wq_ref[...], wk_ref[...], wv_ref[...], wo_ref[...]
  bq, bk, bv = bq_ref[...], bk_ref[...], bv_ref[...]

  for i in range(bb):
    xi = x_all[i]  # (lp, HD)
    # Mosaic requires 32-bit matmul accumulators; cast back to the compute
    # dtype so the attention dots see bf16 operands.
    f32 = jnp.float32
    dot = lambda a, w: jnp.dot(a, w, preferred_element_type=f32)
    q = (dot(xi, wq) + bq).astype(xi.dtype)
    k = (dot(xi, wk) + bk).astype(xi.dtype)
    v = (dot(xi, wv) + bv).astype(xi.dtype)
    head_outs = []
    for h in range(num_heads):
      sl = slice(h * head_dim, (h + 1) * head_dim)
      scores = jax.lax.dot_general(
          q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
          preferred_element_type=jnp.float32) * scale
      scores = jnp.where(key_mask, scores, -jnp.inf)
      m = jnp.max(scores, axis=-1, keepdims=True)
      e = jnp.exp(scores - m)
      probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(xi.dtype)
      head_outs.append(jax.lax.dot_general(
          probs, v[:, sl], (((1,), (0,)), ((), ())),
          preferred_element_type=jnp.float32).astype(xi.dtype))
    attn = jnp.concatenate(head_outs, axis=-1)  # (lp, HD)
    o_ref[i] = (dot(attn, wo) + bo_ref[...]).astype(o_ref.dtype)


def _mha_pallas(x, wq, bq, wk, bk, wv, bv, wo, bo, num_heads, interpret):
  b, l, hd = x.shape
  d = hd // num_heads
  lp = _round_up(l, 16)
  scale = 1.0 / np.sqrt(d)
  # Stack per row: x + q/k/v + attn + out bf16 (6·lp·hd·2) + f32 score
  # buffers (~3·lp·lp·4). Weight blocks (4 hd×hd mats + biases, bf16) are
  # co-resident and counted against the same budget.
  bb = _pick_bb(b, 12 * lp * hd + 12 * lp * lp, weight_bytes=8 * hd * hd + 8 * hd)

  row_spec = pl.BlockSpec((bb, lp, hd), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
  w_spec = pl.BlockSpec((hd, hd), lambda i: (0, 0), memory_space=pltpu.VMEM)
  b_spec = pl.BlockSpec((hd,), lambda i: (0,), memory_space=pltpu.VMEM)

  kernel = functools.partial(_mha_kernel, scale=scale, seq_len=l, bb=bb,
                             num_heads=num_heads, head_dim=d)
  return pl.pallas_call(
      kernel, grid=(b // bb,),
      in_specs=[row_spec, w_spec, b_spec, w_spec, b_spec, w_spec, b_spec,
                w_spec, b_spec],
      out_specs=row_spec,
      out_shape=jax.ShapeDtypeStruct((b, l, hd), x.dtype),
      cost_estimate=pl.CostEstimate(
          flops=(4 * 2 * lp * hd * hd + 2 * 2 * num_heads * lp * lp * d) * b,
          bytes_accessed=2 * b * lp * hd * 2 + 4 * hd * hd * 2,
          transcendentals=b * num_heads * lp * lp),
      interpret=interpret,
  )(x, wq, bq, wk, bk, wv, bv, wo, bo)


def _mha_reference(x, wq, bq, wk, bk, wv, bv, wo, bo, num_heads, interpret):
  """Same math via the packed attention kernel (used for the backward)."""
  q = jnp.dot(x, wq) + bq
  k = jnp.dot(x, wk) + bk
  v = jnp.dot(x, wv) + bv
  if interpret is None:  # pure-XLA path (non-TPU backends)
    b, l, hd = x.shape
    d = hd // num_heads
    qh = q.reshape(b, l, num_heads, d)
    kh = k.reshape(b, l, num_heads, d)
    vh = v.reshape(b, l, num_heads, d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(d)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(b, l, hd)
  else:
    o = fused_attention_packed(q, k, v, num_heads, interpret)
  return jnp.dot(o, wo) + bo


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def fused_mha(x, wq, bq, wk, bk, wv, bv, wo, bo, num_heads, interpret=False):
  """One-kernel MHA forward on packed (B, L, H*D) tensors; VJP recomputes."""
  return _mha_pallas(x, wq, bq, wk, bk, wv, bv, wo, bo, num_heads, interpret)


def _fused_mha_fwd(x, wq, bq, wk, bk, wv, bv, wo, bo, num_heads, interpret):
  out = _mha_pallas(x, wq, bq, wk, bk, wv, bv, wo, bo, num_heads, interpret)
  return out, (x, wq, bq, wk, bk, wv, bv, wo, bo)


def _fused_mha_bwd(num_heads, interpret, res, g):
  x, wq, bq, wk, bk, wv, bv, wo, bo = res
  _, vjp = jax.vjp(
      lambda *a: _mha_reference(*a, num_heads, interpret),
      x, wq, bq, wk, bk, wv, bv, wo, bo)
  return vjp(g)


fused_mha.defvjp(_fused_mha_fwd, _fused_mha_bwd)


# ---------------------------------------------------------------------------
# Fused MLP: up-projection + gelu + down-projection
# ---------------------------------------------------------------------------


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, seq_len, bb):
  lp = x_ref.shape[1]
  row_mask = jax.lax.broadcasted_iota(
      jnp.int32, (1, lp, 1), dimension=1) < seq_len
  x_all = jnp.where(row_mask, x_ref[...], jnp.zeros((), x_ref.dtype))
  w1, w2 = w1_ref[...], w2_ref[...]
  b1, b2 = b1_ref[...], b2_ref[...]
  for i in range(bb):
    # 32-bit accumulators (Mosaic requirement); gelu runs in f32 anyway.
    h = jnp.dot(x_all[i], w1, preferred_element_type=jnp.float32) + b1
    h = jax.nn.gelu(h).astype(x_all.dtype)
    o_ref[i] = (jnp.dot(h, w2, preferred_element_type=jnp.float32)
                + b2).astype(o_ref.dtype)


def _mlp_pallas(x, w1, b1, w2, b2, interpret):
  b, l, d = x.shape
  dh = w1.shape[-1]
  lp = _round_up(l, 16)
  # Stack per row: x/out bf16 + hidden bf16 + f32 gelu temps ≈
  # 4·lp·d + (2+8)·lp·dh bytes. W1/W2 (bf16) are co-resident in VMEM.
  bb = _pick_bb(b, 4 * lp * d + 10 * lp * dh,
                weight_bytes=4 * d * dh + 2 * (d + dh))

  row_spec = pl.BlockSpec((bb, lp, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
  return pl.pallas_call(
      functools.partial(_mlp_kernel, seq_len=l, bb=bb),
      grid=(b // bb,),
      in_specs=[
          row_spec,
          pl.BlockSpec((d, dh), lambda i: (0, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((dh,), lambda i: (0,), memory_space=pltpu.VMEM),
          pl.BlockSpec((dh, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
      ],
      out_specs=row_spec,
      out_shape=jax.ShapeDtypeStruct((b, l, d), x.dtype),
      cost_estimate=pl.CostEstimate(
          flops=2 * 2 * lp * d * dh * b,
          bytes_accessed=2 * b * lp * d * 2 + 2 * d * dh * 2,
          transcendentals=b * lp * dh),
      interpret=interpret,
  )(x, w1, b1, w2, b2)


def _mlp_reference(x, w1, b1, w2, b2):
  h = jax.nn.gelu((jnp.dot(x, w1) + b1).astype(jnp.float32)).astype(x.dtype)
  return jnp.dot(h, w2) + b2


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_mlp(x, w1, b1, w2, b2, interpret=False):
  """One-kernel Dense→gelu→Dense; the (L, 4D) hidden never touches HBM."""
  return _mlp_pallas(x, w1, b1, w2, b2, interpret)


def _fused_mlp_fwd(x, w1, b1, w2, b2, interpret):
  return _mlp_pallas(x, w1, b1, w2, b2, interpret), (x, w1, b1, w2, b2)


def _fused_mlp_bwd(interpret, res, g):
  del interpret
  _, vjp = jax.vjp(_mlp_reference, *res)
  return vjp(g)


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)
