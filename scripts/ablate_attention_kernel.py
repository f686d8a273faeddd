"""Diagnose where the packed attention kernel's time goes.

Variants (perf-only; V0 is the production kernel, others are ablations):
  V0 prod      — current _attn_kernel_packed
  V1 nosoftmax — softmax replaced by a scalar multiply (isolates MXU+shuffle)
  V2 nomm      — matmuls replaced by cheap slices (isolates VPU softmax)
  V3 bf16exp   — exp computed on bf16 scores (half the VPU vector width)

python scripts/ablate_attention_kernel.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from small_vision_tpu.ops import attention as attn

N = 20


def dev_time(body, x0, n=N):
  @jax.jit
  def run(x):
    return jax.lax.fori_loop(0, n, lambda i, x: body(x), x)
  out = run(x0)
  float(jax.device_get(jnp.sum(out[..., :1, :1]).astype(jnp.float32)))
  t0 = time.perf_counter()
  out = run(x0)
  float(jax.device_get(jnp.sum(out[..., :1, :1]).astype(jnp.float32)))
  return (time.perf_counter() - t0) / n


def _kernel_variant(q_ref, k_ref, v_ref, o_ref, *, scale, seq_len, bb,
                    num_heads, head_dim, variant):
  lp = q_ref.shape[1]
  key_pos = jax.lax.broadcasted_iota(jnp.int32, (1, lp), dimension=1)
  key_mask = key_pos < seq_len
  row_mask = jax.lax.broadcasted_iota(
      jnp.int32, (1, lp, 1), dimension=1) < seq_len
  zero = lambda x: jnp.where(row_mask, x, jnp.zeros((), x.dtype))
  q_all, k_all, v_all = zero(q_ref[...]), zero(k_ref[...]), zero(v_ref[...])

  outs = []
  for i in range(bb):
    head_outs = []
    for h in range(num_heads):
      sl = slice(h * head_dim, (h + 1) * head_dim)
      q, k, v = q_all[i, :, sl], k_all[i, :, sl], v_all[i, :, sl]
      if variant == "nomm":
        probs = (q[:, :1] * jnp.float32(scale)).astype(q_all.dtype)
        scores = jax.lax.broadcast_in_dim(
            probs.astype(jnp.float32), (lp, lp), (0, 1))
      else:
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
      if variant == "nosoftmax":
        probs = (scores * 0.001).astype(q_all.dtype)
      elif variant == "bf16exp":
        scores = jnp.where(key_mask, scores, -jnp.inf)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp((scores - m).astype(jnp.bfloat16))
        s = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        probs = (e.astype(jnp.float32) / s).astype(q_all.dtype)
      elif variant == "exp2":
        # exp(x) = exp2(x * log2 e): folds log2e into the already-needed
        # scale multiply, saving one VPU multiply inside every exp.
        scores = scores * np.float32(np.log2(np.e))
        scores = jnp.where(key_mask, scores, -jnp.inf)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp2(scores - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q_all.dtype)
      elif variant == "mulmask":
        # Mask AFTER exp by multiply (0/1) instead of the where(-inf) pass;
        # max over unmasked scores is still a valid stability shift since
        # padded-key scores are exactly 0 (k rows zeroed at source).
        maskf = key_mask.astype(jnp.float32)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m) * maskf
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q_all.dtype)
      elif variant == "nomax":
        # UNSAFE numerically — measures the cost of the max pass alone.
        maskf = key_mask.astype(jnp.float32)
        e = jnp.exp(scores) * maskf
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q_all.dtype)
      else:
        scores = jnp.where(key_mask, scores, -jnp.inf)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q_all.dtype)
      if variant == "nomm":
        head_outs.append(
            (probs[:, :head_dim * 0 + 1] * v[:, :1]).astype(o_ref.dtype)
            * jnp.ones((1, head_dim), o_ref.dtype))
      else:
        head_outs.append(jax.lax.dot_general(
            probs, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype))
    outs.append(jnp.concatenate(head_outs, axis=-1))
  o_ref[...] = jnp.stack(outs, axis=0).reshape(o_ref.shape)


@functools.partial(jax.jit, static_argnames=("num_heads", "variant"))
def run_variant(q, k, v, num_heads, variant):
  b, l, hd = q.shape
  d = hd // num_heads
  lp = attn._round_up(l, 16)
  scale = 1.0 / np.sqrt(d)
  bb, _ = attn._block_dims(b, 1, lp, hd, n_io_blocks=4, n_score_bufs=2)
  spec = pl.BlockSpec((bb, lp, hd), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
  kern = functools.partial(_kernel_variant, scale=scale, seq_len=l, bb=bb,
                           num_heads=num_heads, head_dim=d, variant=variant)
  return pl.pallas_call(
      kern, grid=(b // bb,),
      in_specs=[spec, spec, spec], out_specs=spec,
      out_shape=jax.ShapeDtypeStruct((b, l, hd), q.dtype),
      cost_estimate=pl.CostEstimate(
          flops=2 * 2 * num_heads * lp * lp * d * b,
          bytes_accessed=4 * b * lp * hd * 2,
          transcendentals=b * num_heads * lp * lp),
  )(q, k, v)


def main():
  for (b, l, h, d) in [(128, 257, 12, 64), (128, 164, 12, 64)]:
    hd = h * d
    k, v = (jax.random.normal(kk, (b, l, hd), jnp.bfloat16)
            for kk in jax.random.split(jax.random.PRNGKey(0), 2))
    q0 = jax.random.normal(jax.random.PRNGKey(2), (b, l, hd), jnp.bfloat16)
    flops = 2 * 2 * h * l * l * d * b
    variants = ("prod", "nosoftmax", "nomm", "bf16exp", "exp2", "mulmask",
                "nomax")
    if os.environ.get("SV_ABLATE_VARIANTS"):
      variants = os.environ["SV_ABLATE_VARIANTS"].split(",")
    for variant in variants:
      t = dev_time(lambda q, vv=variant: run_variant(q, k, v, h, vv), q0)
      print(f"B{b} L{l}: {variant:10s} {t*1e3:6.2f} ms "
            f"({flops/t/1e12:5.1f} TF/s-equiv)", flush=True)


if __name__ == "__main__":
  main()
