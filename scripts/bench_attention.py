"""Micro-bench: attention implementations at UMD-B/4 shapes on the chip.

python scripts/bench_attention.py

Measurement notes (this box reaches the TPU through a tunnel):
  - device→host transfers run at ~11 MB/s, so NEVER device_get a tensor —
    reduce to a scalar on device and fetch that;
  - per-dispatch latency is ~0.7 ms, so the op under test runs inside a
    device-side fori_loop (one dispatch, N iterations, loop-carried data
    dependency so iterations can't be elided or overlapped).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from small_vision_tpu.ops import attention as attn

N = 20


def dev_time(body, x0, n=N):
  """Per-iteration device time of body (x -> same-shaped x) via fori_loop."""
  @jax.jit
  def run(x):
    return jax.lax.fori_loop(0, n, lambda i, x: body(x), x)

  out = run(x0)
  float(jax.device_get(jnp.sum(out[..., :1, :1]).astype(jnp.float32)))
  t0 = time.perf_counter()
  out = run(x0)
  float(jax.device_get(jnp.sum(out[..., :1, :1]).astype(jnp.float32)))
  return (time.perf_counter() - t0) / n


def main():
  for (b, l, h, d) in [(128, 164, 12, 64), (128, 257, 12, 64)]:
    hd = h * d
    k, v = (jax.random.normal(kk, (b, l, hd), jnp.bfloat16)
            for kk in jax.random.split(jax.random.PRNGKey(0), 2))
    q0 = jax.random.normal(jax.random.PRNGKey(2), (b, l, hd), jnp.bfloat16)

    unpack = lambda x: x.reshape(b, l, h, d)
    t_xla = dev_time(
        lambda q: attn.xla_attention(unpack(q), unpack(k), unpack(v))
        .reshape(b, l, hd), q0)
    t_pal = dev_time(
        lambda q: attn.pallas_attention_packed(q, k, v, h), q0)

    def gx(q):
      return jax.grad(lambda q: jnp.sum(
          attn.xla_attention(unpack(q), unpack(k), unpack(v))
          .astype(jnp.float32)))(q)

    def gp(q):
      return jax.grad(lambda q: jnp.sum(
          attn.fused_attention_packed(q, k, v, h).astype(jnp.float32)))(q)

    t_gx, t_gp = dev_time(gx, q0), dev_time(gp, q0)
    flops = 2 * 2 * h * l * l * d * b
    print(f"B{b} L{l} H{h} D{d}: fwd xla {t_xla*1e3:6.2f}ms "
          f"({flops/t_xla/1e12:5.1f} TF/s) "
          f"pallas {t_pal*1e3:6.2f}ms ({flops/t_pal/1e12:5.1f} TF/s) | "
          f"fwd+bwd xla {t_gx*1e3:6.2f}ms pallas {t_gp*1e3:6.2f}ms",
          flush=True)


if __name__ == "__main__":
  main()
