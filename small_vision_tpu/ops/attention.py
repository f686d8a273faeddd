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
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
  return ((x + m - 1) // m) * m


# Softmax stability clamp, in log2 units (see _attn_kernel_packed): ±80 ⇒
# exp2 spans 1e±24, safely inside f32/bf16 range even after a 272-term sum.
_CLAMP = np.float32(80.0)


def _block_dims(b, h, lp, dp, n_io_blocks, n_score_bufs, budget=None):
  """Picks (batch_rows, heads) per block to fit VMEM while keeping DMAs fat.

  Mosaic's stack allocator does NOT reuse buffers across unrolled loop
  iterations, so the (Lp, Lp) fp32 softmax scratch scales with bb·hb:
    stack ≈ io (double-buffered bf16 blocks)
          + bb·hb · (n_score_bufs · Lp² · 4 + ~3 · Lp · Dp · 4).
  Larger bb·hb amortizes per-grid-step DMA setup (tiny blocks ran the
  kernels at ~1/8 of HBM bandwidth), so maximize it under the budget,
  preferring more batch rows.
  """
  if budget is None:
    # 11 MB default leaves slack under the ~16 MB/core VMEM for Mosaic's own
    # temporaries; SV_ATTN_VMEM_MB is the measured-experiment override.
    budget = int(float(os.environ.get("SV_ATTN_VMEM_MB", "11")) * 2**20)
  best = (1, 1)
  for bb in (8, 4, 2, 1):
    if b % bb:
      continue
    for hb in range(h, 0, -1):
      if h % hb:
        continue
      io = n_io_blocks * bb * hb * lp * dp * 2 * 2
      per_iter = n_score_bufs * lp * lp * 4 + 3 * lp * dp * 4
      if io + bb * hb * per_iter <= budget:
        if bb * hb > best[0] * best[1] or (
            bb * hb == best[0] * best[1] and bb > best[0]):
          best = (bb, hb)
        break
  return best


def xla_attention(q, k, v):
  """Reference path: einsum attention, fp32 softmax. Shapes [B,L,H,D].

  The 1/sqrt(d) scale folds into q BEFORE the einsum: scaling the (B,L,H,D)
  operand is 4·L/L² times cheaper than scaling the (B,H,L,L) logits.
  """
  depth = q.shape[-1]
  q = q * jnp.asarray(1.0 / np.sqrt(depth), q.dtype)
  logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                      preferred_element_type=jnp.float32)
  probs = jax.nn.softmax(logits, axis=-1)
  return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                    preferred_element_type=jnp.float32).astype(v.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, seq_len, bb, hb):
  """One (batch-rows, head-block) tile: fused attention fully in VMEM.

  Block shapes: q/k/v/o = [bb, hb, Lp, Dp] (bf16). Per (row, head): scores +
  softmax in fp32, probs cast to bf16 for the PV matmul. Padded key
  positions are masked to -inf; padded query rows compute garbage the caller
  slices off. Nothing of size (L, L) ever touches HBM.

  Mosaic constraints shaping this code: ref slices at the 64-wide minor dim
  violate 128-lane tiling (so blocks load/store as whole values), and
  dynamic_slice on values isn't lowerable (so the loops are static).
  """
  lp = q_ref.shape[2]
  key_pos = jax.lax.broadcasted_iota(jnp.int32, (1, lp), dimension=1)
  key_mask = key_pos < seq_len

  q_all, k_all, v_all = q_ref[...], k_ref[...], v_ref[...]

  outs = []
  for i in range(bb):
    for head in range(hb):
      q = q_all[i, head]
      k = k_all[i, head]
      v = v_all[i, head]
      scores = jax.lax.dot_general(
          q, k, (((1,), (1,)), ((), ())),
          preferred_element_type=jnp.float32) * scale
      scores = jnp.where(key_mask, scores, -jnp.inf)
      m = jnp.max(scores, axis=-1, keepdims=True)
      e = jnp.exp(scores - m)
      probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q_all.dtype)
      outs.append(jax.lax.dot_general(
          probs, v, (((1,), (0,)), ((), ())),
          preferred_element_type=jnp.float32).astype(o_ref.dtype))
  o_ref[...] = jnp.stack(outs, axis=0).reshape(o_ref.shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_attention(q, k, v, interpret=False):
  """Fused TPU attention for short sequences. Shapes [B,L,H,D].

  Pads L and D up to lane multiples, runs one grid step per batch row with
  all heads resident in VMEM, then slices the padding back off.
  """
  b, l, h, d = q.shape
  # Pad L only to the bf16 sublane multiple; leave D logical — Mosaic pads
  # sub-128 minor dims in VMEM for free, while HBM-materialized padding
  # (L→128-mult, D→128) tripled the tensor traffic around the kernel.
  lp = _round_up(l, 16)
  dp = d
  scale = 1.0 / np.sqrt(d)

  def pad(x):
    x = jnp.transpose(x, (0, 2, 1, 3))  # [B,H,L,D]
    return jnp.pad(x, ((0, 0), (0, 0), (0, lp - l), (0, dp - d)))

  qp, kp, vp = pad(q), pad(k), pad(v)

  bb, hb = _block_dims(b, h, lp, dp, n_io_blocks=4, n_score_bufs=2)
  spec = pl.BlockSpec((bb, hb, lp, dp), lambda i, j: (i, j, 0, 0),
                      memory_space=pltpu.VMEM)

  def kernel(q_ref, k_ref, v_ref, o_ref):
    _attn_kernel(q_ref, k_ref, v_ref, o_ref,
                 scale=scale, seq_len=l, bb=bb, hb=hb)

  flops = 2 * 2 * h * lp * lp * dp * b
  out = pl.pallas_call(
      kernel,
      grid=(b // bb, h // hb),
      in_specs=[spec, spec, spec],
      out_specs=spec,
      out_shape=jax.ShapeDtypeStruct((b, h, lp, dp), q.dtype),
      cost_estimate=pl.CostEstimate(
          flops=flops, bytes_accessed=4 * b * h * lp * dp * 2,
          transcendentals=b * h * lp * lp),
      interpret=interpret,
  )(qp, kp, vp)

  out = out[:, :, :l, :d]
  return jnp.transpose(out, (0, 2, 1, 3))  # back to [B,L,H,D]


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     *, scale, seq_len, bb, hb):
  """Fused attention backward for one (batch-rows, head-block) tile.

  Recomputes S/P flash-style, then
    dV = Pᵀ dO;  dP = dO Vᵀ;  dS = P ∘ (dP − rowsum(dP∘P));
    dQ = dS K·scale;  dK = dSᵀ Q·scale.
  Nothing of size (L,L) ever touches HBM. See _attn_kernel for the Mosaic
  constraints shaping the value loads / static loops / stacked stores.
  """
  lp = q_ref.shape[2]
  key_pos = jax.lax.broadcasted_iota(jnp.int32, (1, lp), dimension=1)
  key_mask = key_pos < seq_len
  f32 = jnp.float32

  q_all, k_all, v_all, do_all = (q_ref[...], k_ref[...], v_ref[...],
                                 do_ref[...])

  dqs, dks, dvs = [], [], []
  for i in range(bb):
   for head in range(hb):
    q, k, v, do = (q_all[i, head], k_all[i, head], v_all[i, head],
                   do_all[i, head])
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=f32) * scale
    scores = jnp.where(key_mask, scores, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)       # (L, L) fp32
    pb = p.astype(q_ref.dtype)

    # dV = Pᵀ @ dO (contract query dim).
    dv = jax.lax.dot_general(pb, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=f32)
    # dP = dO @ Vᵀ (contract D).
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
          ).astype(q_ref.dtype)
    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=f32) * scale
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=f32) * scale

    dqs.append(dq.astype(dq_ref.dtype))
    dks.append(dk.astype(dk_ref.dtype))
    dvs.append(dv.astype(dv_ref.dtype))
  dq_ref[...] = jnp.stack(dqs, axis=0).reshape(dq_ref.shape)
  dk_ref[...] = jnp.stack(dks, axis=0).reshape(dk_ref.shape)
  dv_ref[...] = jnp.stack(dvs, axis=0).reshape(dv_ref.shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_attention_bwd_impl(q, k, v, do, interpret=False):
  b, l, h, d = q.shape
  lp = _round_up(l, 16)
  dp_ = d
  scale = 1.0 / np.sqrt(d)

  def pad(x):
    x = jnp.transpose(x, (0, 2, 1, 3))
    return jnp.pad(x, ((0, 0), (0, 0), (0, lp - l), (0, dp_ - d)))

  qp, kp, vp, dop = pad(q), pad(k), pad(v), pad(do)
  bb, hb = _block_dims(b, h, lp, dp_, n_io_blocks=7, n_score_bufs=4)
  spec = pl.BlockSpec((bb, hb, lp, dp_), lambda i, j: (i, j, 0, 0),
                      memory_space=pltpu.VMEM)

  def kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
    _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                     scale=scale, seq_len=l, bb=bb, hb=hb)

  shp = jax.ShapeDtypeStruct((b, h, lp, dp_), q.dtype)
  flops = 5 * 2 * h * lp * lp * dp_ * b
  dq, dk, dv = pl.pallas_call(
      kernel, grid=(b // bb, h // hb),
      in_specs=[spec, spec, spec, spec],
      out_specs=(spec, spec, spec),
      out_shape=(shp, shp, shp),
      cost_estimate=pl.CostEstimate(
          flops=flops, bytes_accessed=7 * b * h * lp * dp_ * 2,
          transcendentals=b * h * lp * lp),
      interpret=interpret,
  )(qp, kp, vp, dop)

  unpad = lambda x: jnp.transpose(x[:, :, :l, :d], (0, 2, 1, 3))
  return unpad(dq), unpad(dk), unpad(dv)


# ---------------------------------------------------------------------------
# Packed-layout variant: kernel I/O stays (B, L, H*D) — the model's natural
# layout — so NO transpose/pad passes run in HBM; heads are sliced from
# values inside VMEM (static 64-lane slices → cheap register shuffles).
# ---------------------------------------------------------------------------


def _attn_kernel_packed(q_ref, k_ref, v_ref, o_ref, *, scale, seq_len,
                        bb, num_heads, head_dim):
  lp = q_ref.shape[1]
  # VPU-lean softmax (measured in scripts/ablate_attention_kernel.py):
  #  - exp(x) = exp2(x·log2 e): log2e folds into the score scale, saving a
  #    multiply inside every transcendental;
  #  - the key mask is applied by a 0/1 MULTIPLY after the exp instead of a
  #    where(-inf) pass before it. Padded-key scores are exactly 0 (k rows
  #    zeroed at the source below), so m = max over ALL columns ≥ max over
  #    real ones — still a valid stability shift, and masked e-terms
  #    (≤ exp2(0−m) ≤ 1) are finite before the multiply kills them.
  key_pos = jax.lax.broadcasted_iota(jnp.int32, (1, lp), dimension=1)
  key_maskf = (key_pos < seq_len).astype(jnp.float32)
  scale2 = scale * np.float32(np.log2(np.e))
  # Unpadded inputs: rows past seq_len are garbage HBM reads and may hold
  # NaN/Inf bit patterns, which survive 0-multiplication inside dots — zero
  # them at the source (select, not multiply).
  row_mask = jax.lax.broadcasted_iota(
      jnp.int32, (1, lp, 1), dimension=1) < seq_len
  zero = lambda x: jnp.where(row_mask, x, jnp.zeros((), x.dtype))
  q_all, k_all, v_all = zero(q_ref[...]), zero(k_ref[...]), zero(v_ref[...])

  outs = []
  for i in range(bb):
    head_outs = []
    for h in range(num_heads):
      sl = slice(h * head_dim, (h + 1) * head_dim)
      q = q_all[i, :, sl]
      k = k_all[i, :, sl]
      v = v_all[i, :, sl]
      scores = jax.lax.dot_general(
          q, k, (((1,), (1,)), ((), ())),
          preferred_element_type=jnp.float32) * scale2
      # Clamp replaces the classic max-subtraction stabilizer: for any row
      # whose logits stay in ±_CLAMP (raw logits ±55 — far beyond trained
      # attention), exp2 of the UNSHIFTED scores is exact in f32
      # (exp2(±80) ≈ 1e±24, and a 272-term sum stays ≪ f32 max), so the
      # softmax is bit-comparable while the (L,L) max-reduce pass and its
      # broadcast subtract disappear. Out-of-range logits clamp, degrading
      # gracefully toward uniform-over-clamped instead of overflowing.
      e = jnp.exp2(jnp.clip(scores, -_CLAMP, _CLAMP)) * key_maskf
      # Fold the 1/sum normalization OUT of the (L,L) matrix into a row
      # scaling of the (L,D) output: o = (e·V)/s. Replaces lp² divides
      # (slow multi-cycle VPU op) with lp reciprocals + lp·D multiplies.
      s = jnp.sum(e, axis=-1, keepdims=True)
      o = jax.lax.dot_general(
          e.astype(q_all.dtype), v, (((1,), (0,)), ((), ())),
          preferred_element_type=jnp.float32)
      head_outs.append((o / s).astype(o_ref.dtype))
    outs.append(jnp.concatenate(head_outs, axis=-1))
  o_ref[...] = jnp.stack(outs, axis=0).reshape(o_ref.shape)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def pallas_attention_packed(q, k, v, num_heads, interpret=False):
  """Fused attention on packed (B, L, H*D) tensors — zero layout passes."""
  b, l, hd = q.shape
  d = hd // num_heads
  lp = _round_up(l, 16)
  scale = 1.0 / np.sqrt(d)

  # No explicit padding: Pallas masks out-of-bounds block rows itself
  # (garbage key rows are −inf-masked in-kernel; garbage query rows are
  # dropped on the store), so no pad/slice/reshape passes run in HBM.
  bb, _ = _block_dims(b, 1, lp, hd, n_io_blocks=4, n_score_bufs=2)
  spec = pl.BlockSpec((bb, lp, hd), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)

  def kernel(q_ref, k_ref, v_ref, o_ref):
    _attn_kernel_packed(q_ref, k_ref, v_ref, o_ref, scale=scale,
                        seq_len=l, bb=bb, num_heads=num_heads, head_dim=d)

  return pl.pallas_call(
      kernel, grid=(b // bb,),
      in_specs=[spec, spec, spec],
      out_specs=spec,
      out_shape=jax.ShapeDtypeStruct((b, l, hd), q.dtype),
      cost_estimate=pl.CostEstimate(
          flops=2 * 2 * num_heads * lp * lp * d * b,
          bytes_accessed=4 * b * lp * hd * 2,
          transcendentals=b * num_heads * lp * lp),
      interpret=interpret,
  )(q, k, v)


def _attn_bwd_kernel_packed(q_ref, k_ref, v_ref, do_ref,
                            dq_ref, dk_ref, dv_ref, *, scale, seq_len,
                            bb, num_heads, head_dim):
  lp = q_ref.shape[1]
  # Same VPU-lean softmax recompute as the forward kernel (exp2 with folded
  # log2e, multiply-mask after the exp) — see _attn_kernel_packed.
  key_pos = jax.lax.broadcasted_iota(jnp.int32, (1, lp), dimension=1)
  key_maskf = (key_pos < seq_len).astype(jnp.float32)
  scale2 = scale * np.float32(np.log2(np.e))
  # With unpadded inputs, rows beyond seq_len are GARBAGE HBM reads (possibly
  # NaN/Inf). Zero every input's OOB rows at the source (select, not
  # multiply), AND zero P's garbage query rows so they can't reach the dK/dV
  # sums, which contract over queries.
  row_pos = jax.lax.broadcasted_iota(jnp.int32, (lp, 1), dimension=0)
  row_maskf = (row_pos < seq_len).astype(jnp.float32)
  block_mask = jax.lax.broadcasted_iota(
      jnp.int32, (1, lp, 1), dimension=1) < seq_len
  zero = lambda x: jnp.where(block_mask, x, jnp.zeros((), x.dtype))
  f32 = jnp.float32
  q_all, k_all, v_all, do_all = (zero(q_ref[...]), zero(k_ref[...]),
                                 zero(v_ref[...]), zero(do_ref[...]))

  dqs, dks, dvs = [], [], []
  for i in range(bb):
    dq_h, dk_h, dv_h = [], [], []
    for h in range(num_heads):
      sl = slice(h * head_dim, (h + 1) * head_dim)
      q, k, v, do = (q_all[i, :, sl], k_all[i, :, sl], v_all[i, :, sl],
                     do_all[i, :, sl])
      scores = jax.lax.dot_general(
          q, k, (((1,), (1,)), ((), ())),
          preferred_element_type=f32) * scale2
      # Clamp-stabilized unshifted exp2 — see _attn_kernel_packed for the
      # range argument (the forward and this recompute MUST use the same
      # stabilizer so P matches bit-for-bit).
      e = jnp.exp2(jnp.clip(scores, -_CLAMP, _CLAMP)) * key_maskf
      # Fold 1/s = 1/rowsum(e) out of every (L,L) matrix into (L,D)/(L,1)
      # row scalings (P = diag(r)·e, so r commutes through each dot):
      #   dV = eᵀ·(dO·r);   c = rowsum(dP∘e)·r;   dS_raw = e∘(dP−c);
      #   dQ = (dS_raw·K)·r·scale;   dK = dS_rawᵀ·(Q·r)·scale.
      # r also carries the garbage-query-row mask (rows past seq_len), which
      # kills their contributions to the dV/dK query contractions.
      r = row_maskf / jnp.sum(e, axis=-1, keepdims=True)   # (lp, 1)
      eb = e.astype(q_all.dtype)
      dv = jax.lax.dot_general(eb, (do * r).astype(q_all.dtype),
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=f32)
      dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                               preferred_element_type=f32)
      c = jnp.sum(dp * e, axis=-1, keepdims=True) * r
      ds_raw = (e * (dp - c)).astype(q_all.dtype)
      dq = jax.lax.dot_general(ds_raw, k, (((1,), (0,)), ((), ())),
                               preferred_element_type=f32) * (r * scale)
      dk = jax.lax.dot_general(ds_raw, (q * (r * scale)).astype(q_all.dtype),
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=f32)
      dq_h.append(dq.astype(dq_ref.dtype))
      dk_h.append(dk.astype(dk_ref.dtype))
      dv_h.append(dv.astype(dv_ref.dtype))
    dqs.append(jnp.concatenate(dq_h, axis=-1))
    dks.append(jnp.concatenate(dk_h, axis=-1))
    dvs.append(jnp.concatenate(dv_h, axis=-1))
  dq_ref[...] = jnp.stack(dqs, axis=0).reshape(dq_ref.shape)
  dk_ref[...] = jnp.stack(dks, axis=0).reshape(dk_ref.shape)
  dv_ref[...] = jnp.stack(dvs, axis=0).reshape(dv_ref.shape)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _pallas_attention_packed_bwd_impl(q, k, v, do, num_heads,
                                      interpret=False):
  b, l, hd = q.shape
  d = hd // num_heads
  lp = _round_up(l, 16)
  scale = 1.0 / np.sqrt(d)

  # No explicit padding — see _pallas_attention_packed. The masked softmax
  # zeroes the OOB-key columns of P and dS, so dq/dk/dv contributions from
  # garbage rows never reach real positions; OOB query rows drop on store.
  bb, _ = _block_dims(b, 1, lp, hd, n_io_blocks=7, n_score_bufs=4)
  spec = pl.BlockSpec((bb, lp, hd), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)

  def kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
    _attn_bwd_kernel_packed(q_ref, k_ref, v_ref, do_ref,
                            dq_ref, dk_ref, dv_ref, scale=scale, seq_len=l,
                            bb=bb, num_heads=num_heads, head_dim=d)

  shp = jax.ShapeDtypeStruct((b, l, hd), q.dtype)
  return pl.pallas_call(
      kernel, grid=(b // bb,),
      in_specs=[spec, spec, spec, spec],
      out_specs=(spec, spec, spec),
      out_shape=(shp, shp, shp),
      cost_estimate=pl.CostEstimate(
          flops=5 * 2 * num_heads * lp * lp * d * b,
          bytes_accessed=7 * b * lp * hd * 2,
          transcendentals=b * num_heads * lp * lp),
      interpret=interpret,
  )(q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention_packed(q, k, v, num_heads, interpret=False):
  """Differentiable packed fused attention on (B, L, H*D) tensors."""
  return pallas_attention_packed(q, k, v, num_heads, interpret=interpret)


def _fused_packed_fwd(q, k, v, num_heads, interpret):
  return (pallas_attention_packed(q, k, v, num_heads, interpret=interpret),
          (q, k, v))


def _fused_packed_bwd(num_heads, interpret, residuals, g):
  q, k, v = residuals
  return _pallas_attention_packed_bwd_impl(q, k, v, g, num_heads,
                                           interpret=interpret)


fused_attention_packed.defvjp(_fused_packed_fwd, _fused_packed_bwd)


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


def attention_packed(q, k, v, num_heads, use_pallas=False, interpret=False):
  """Dispatch on packed (B, L, H*D) tensors — the model's native layout.

  The packed form never materializes 4-D (B, L, H, D) activations, so XLA
  keeps everything row-major and no layout copies appear at the Pallas
  boundary (they cost ~30 ms/step at UMD-B/4 bs256 when the 4-D form leaks
  into the graph). On non-TPU backends falls back to the einsum path.
  """
  if use_pallas and not interpret and jax.default_backend() not in (
      "tpu", "axon"):
    use_pallas = False
  if use_pallas:
    return fused_attention_packed(q, k, v, num_heads, interpret)
  b, l, hd = q.shape
  d = hd // num_heads
  unpack = lambda x: x.reshape(b, l, num_heads, d)
  return xla_attention(unpack(q), unpack(k), unpack(v)).reshape(b, l, hd)


def attention(q, k, v, use_pallas=False, interpret=False):
  """Dispatch: packed Pallas path (zero layout passes) or XLA einsums.

  Shapes [B, L, H, D] in and out; the packed reshapes are free (contiguous).
  On non-TPU backends the Pallas request silently falls back to XLA (unless
  interpret mode was asked for explicitly, e.g. in tests).
  """
  if use_pallas and not interpret and jax.default_backend() not in (
      "tpu", "axon"):
    use_pallas = False
  if use_pallas:
    b, l, h, d = q.shape
    out = fused_attention_packed(
        q.reshape(b, l, h * d), k.reshape(b, l, h * d),
        v.reshape(b, l, h * d), h, interpret)
    return out.reshape(b, l, h, d)
  return xla_attention(q, k, v)
