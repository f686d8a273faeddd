"""Fused LayerNorm(+AdaLN modulate) Pallas TPU kernel with custom VJP.

In the unrolled bf16 transformer block, XLA emits LayerNorm as a multi-output
fusion (stats + normalized + modulated tensors, each a full HBM round trip):
~0.9 ms per LN at UMD-B/4 bs256 shapes, ~21 ms/step forward plus ~15 ms/step
backward (measured via xprof, see STATUS.md). This kernel computes
    y = modulate(LN(x) * gamma + beta, shift, scale)
      = (x_hat * gamma + beta) * (1 + scale) + shift
in one VMEM-resident pass per (batch, seq)-block — one read of x, one write
of y, and two tiny (B, L) f32 stats tensors saved for the backward.

The modulate term is DiT's AdaLN conditioning (reference models/vit.py:13
`modulate`); shift/scale are per-(batch, feature) vectors. Passing
shift=scale=None gives a plain fused LayerNorm (the non-AdaLN blocks and the
encoder_norm).

Backward recomputes x_hat from (x, mean, rstd) flash-style and accumulates
dgamma/dbeta (and dshift/dscale) across grid steps in revisited output
blocks — the TPU grid is sequential, so read-modify-write accumulation is
race-free.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
  return ((x + m - 1) // m) * m


def _pick_bb(b, lp, d, bytes_per_elem, budget=13 * 2**20):
  """Largest batch-rows-per-block fitting the 16 MB scoped-VMEM limit.

  bytes_per_elem counts, per (lp, d) element of one batch row: the
  double-buffered bf16 I/O blocks (4 bytes per block) PLUS the f32
  intermediates the kernel keeps live on the VMEM stack (4 bytes each) —
  undercounting the latter is a compile-time `Ran out of memory in memory
  space vmem ... on stack` error on real TPUs.
  """
  for bb in (16, 8, 4, 2, 1):
    if b % bb:
      continue
    if bytes_per_elem * bb * lp * d <= budget:
      return bb
  return 1


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _ln_fwd_kernel(x_ref, gamma_ref, beta_ref, shift_ref, scale_ref,
                   y_ref, mean_ref, rstd_ref, *, eps, seq_len, modulate):
  xf = x_ref[...].astype(jnp.float32)  # (bb, lp, d)
  mean = jnp.mean(xf, axis=-1, keepdims=True)
  xc = xf - mean
  var = jnp.mean(xc * xc, axis=-1, keepdims=True)
  rstd = jax.lax.rsqrt(var + eps)
  xhat = xc * rstd
  y = xhat * gamma_ref[...].astype(jnp.float32) + beta_ref[...].astype(
      jnp.float32)
  if modulate:
    # shift/scale: (bb, 1, d) → broadcast over the seq dim.
    y = (y * (1.0 + scale_ref[...].astype(jnp.float32))
         + shift_ref[...].astype(jnp.float32))
  y_ref[...] = y.astype(y_ref.dtype)
  mean_ref[...] = mean  # (bb, lp, 1)
  rstd_ref[...] = rstd
  del seq_len


def _ln_fwd(x, gamma, beta, shift, scale, eps, interpret=False):
  b, l, d = x.shape
  lp = _round_up(l, 16)
  modulate = shift is not None
  # 2 io blocks (x, y) double-buffered bf16 = 8 B + ~4 live f32 temps = 16 B.
  bb = _pick_bb(b, lp, d, bytes_per_elem=24)

  # TPU lowering constrains a block's LAST TWO dims (divisible by (8, 128) or
  # equal to the array dims). All small per-batch tensors therefore ride in
  # 3-D shapes whose trailing dims trivially comply: shift/scale as
  # (b, 1, d), the saved stats as (b, lp, 1) (lp-padded: rows ≥ l hold
  # garbage from OOB x reads; the backward masks them). This leaves the
  # batch-block size bb unconstrained.
  row_spec = pl.BlockSpec((bb, lp, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
  vec_spec = pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)
  bvec_spec = pl.BlockSpec((bb, 1, d), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
  stat_spec = pl.BlockSpec((bb, lp, 1), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)

  if modulate:
    shift = shift.reshape(b, 1, d)
    scale = scale.reshape(b, 1, d)
  else:
    # Feed dummy zeros so the kernel signature stays uniform.
    shift = jnp.zeros((b, 1, d), x.dtype)
    scale = jnp.zeros((b, 1, d), x.dtype)

  kernel = functools.partial(_ln_fwd_kernel, eps=eps, seq_len=l,
                             modulate=modulate)
  y, mean, rstd = pl.pallas_call(
      kernel,
      grid=(b // bb,),
      in_specs=[row_spec, vec_spec, vec_spec, bvec_spec, bvec_spec],
      out_specs=(row_spec, stat_spec, stat_spec),
      out_shape=(jax.ShapeDtypeStruct((b, l, d), x.dtype),
                 jax.ShapeDtypeStruct((b, lp, 1), jnp.float32),
                 jax.ShapeDtypeStruct((b, lp, 1), jnp.float32)),
      cost_estimate=pl.CostEstimate(
          flops=9 * b * lp * d, bytes_accessed=4 * b * lp * d,
          transcendentals=b * lp),
      interpret=interpret,
  )(x, gamma, beta, shift, scale)
  return y, mean, rstd


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _ln_bwd_kernel(x_ref, dy_ref, mean_ref, rstd_ref, gamma_ref, beta_ref,
                   scale_ref, dx_ref, dgamma_ref, dbeta_ref, dshift_ref,
                   dscale_ref, *, seq_len, modulate):
  i = pl.program_id(0)
  f32 = jnp.float32
  lp = x_ref.shape[1]
  d = x_ref.shape[2]

  xf = x_ref[...].astype(f32)
  dy = dy_ref[...].astype(f32)
  # Zero garbage rows past seq_len: they'd otherwise pollute the dgamma/dbeta
  # cross-row sums (dx garbage rows are dropped on store, so dx needs none).
  row_mask = jax.lax.broadcasted_iota(jnp.int32, (1, lp, 1), 1) < seq_len
  dy = jnp.where(row_mask, dy, 0.0)

  mean = mean_ref[...]  # (bb, lp, 1)
  rstd = rstd_ref[...]
  xhat = (xf - mean) * rstd
  # Garbage rows carry garbage stats (OOB block reads) → NaN xhat, which
  # survives the zeroed-dy product (0·NaN) into the dgamma sum. Select, not
  # multiply.
  xhat = jnp.where(row_mask, xhat, 0.0)
  gamma = gamma_ref[...].astype(f32)

  if modulate:
    one_plus_s = 1.0 + scale_ref[...].astype(f32)  # (bb, 1, d)
    d_ln = dy * one_plus_s  # grad wrt (xhat*gamma + beta)
    ln_out = xhat * gamma + beta_ref[...].astype(f32)
    # Each grid step owns its (bb, 1, d) block outright (index map
    # i→(i, 0, 0)), so plain assignment — `+=` would read uninitialized
    # output memory.
    dscale_ref[...] = jnp.sum(dy * ln_out, axis=1,
                              keepdims=True).astype(dscale_ref.dtype)
    dshift_ref[...] = jnp.sum(dy, axis=1,
                              keepdims=True).astype(dshift_ref.dtype)
  else:
    d_ln = dy

  @pl.when(i == 0)
  def _():
    dgamma_ref[...] = jnp.zeros_like(dgamma_ref)
    dbeta_ref[...] = jnp.zeros_like(dbeta_ref)

  dgamma_ref[...] += jnp.sum(
      (d_ln * xhat).reshape(-1, d), axis=0).astype(dgamma_ref.dtype)
  dbeta_ref[...] += jnp.sum(
      d_ln.reshape(-1, d), axis=0).astype(dbeta_ref.dtype)

  dxhat = d_ln * gamma
  m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
  m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
  dx = rstd * (dxhat - m1 - xhat * m2)
  dx_ref[...] = dx.astype(dx_ref.dtype)


def _ln_bwd(x, dy, mean, rstd, gamma, beta, scale, eps, modulate,
            interpret=False):
  del eps
  b, l, d = x.shape
  lp = _round_up(l, 16)
  # 3 io blocks (x, dy, dx) double-buffered bf16 = 12 B + ~5 live f32 = 32 B.
  bb = _pick_bb(b, lp, d, bytes_per_elem=32)

  row_spec = pl.BlockSpec((bb, lp, d), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
  vec_spec = pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)
  bvec_spec = pl.BlockSpec((bb, 1, d), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
  stat_spec = pl.BlockSpec((bb, lp, 1), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
  acc_spec = pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM)

  if scale is None:
    scale = jnp.zeros((b, 1, d), x.dtype)
  else:
    scale = scale.reshape(b, 1, d)

  kernel = functools.partial(_ln_bwd_kernel, seq_len=l, modulate=modulate)
  dx, dgamma, dbeta, dshift, dscale = pl.pallas_call(
      kernel,
      grid=(b // bb,),
      in_specs=[row_spec, row_spec, stat_spec, stat_spec, vec_spec, vec_spec,
                bvec_spec],
      out_specs=(row_spec, acc_spec, acc_spec, bvec_spec, bvec_spec),
      out_shape=(jax.ShapeDtypeStruct((b, l, d), x.dtype),
                 jax.ShapeDtypeStruct((d,), jnp.float32),
                 jax.ShapeDtypeStruct((d,), jnp.float32),
                 jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
                 jax.ShapeDtypeStruct((b, 1, d), jnp.float32)),
      cost_estimate=pl.CostEstimate(
          flops=14 * b * lp * d, bytes_accessed=6 * b * lp * d,
          transcendentals=0),
      interpret=interpret,
  )(x, dy, mean, rstd, gamma, beta, scale)
  return dx, dgamma, dbeta, dshift.reshape(b, d), dscale.reshape(b, d)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_ln_modulate(x, gamma, beta, shift, scale, eps=1e-6,
                      interpret=False):
  """modulate(LayerNorm(x)*gamma+beta, shift, scale) in one fused kernel.

  x: (B, L, D) (any float dtype; stats in f32); gamma/beta: (D,);
  shift/scale: (B, D) or both None for a plain LayerNorm. Output dtype
  follows x.
  """
  y, _, _ = _ln_fwd(x, gamma, beta, shift, scale, eps, interpret)
  return y


def _fused_ln_fwd_rule(x, gamma, beta, shift, scale, eps, interpret):
  y, mean, rstd = _ln_fwd(x, gamma, beta, shift, scale, eps, interpret)
  return y, (x, mean, rstd, gamma, beta, scale, shift is not None)


def _fused_ln_bwd_rule(eps, interpret, res, dy):
  x, mean, rstd, gamma, beta, scale, modulate = res
  dx, dgamma, dbeta, dshift, dscale = _ln_bwd(
      x, dy, mean, rstd, gamma, beta, scale, eps, modulate, interpret)
  if not modulate:
    dshift = dscale = None
  else:
    # Cotangents must match the primal dtype (shift/scale come out of the
    # AdaLN Dense in bf16; the kernel accumulates them in f32) — a dtype
    # mismatch breaks the concatenate in the modulation-split backward.
    dshift = dshift.astype(scale.dtype)
    dscale = dscale.astype(scale.dtype)
  return dx, dgamma, dbeta, dshift, dscale


fused_ln_modulate.defvjp(_fused_ln_fwd_rule, _fused_ln_bwd_rule)


def ln_modulate_reference(x, gamma, beta, shift, scale, eps=1e-6):
  """Pure-XLA reference used by tests and non-TPU backends."""
  xf = x.astype(jnp.float32)
  mean = jnp.mean(xf, axis=-1, keepdims=True)
  var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
  y = (xf - mean) * jax.lax.rsqrt(var + eps)
  y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
  if shift is not None:
    y = y * (1.0 + scale[:, None, :].astype(jnp.float32)) + shift[
        :, None, :].astype(jnp.float32)
  return y.astype(x.dtype)
