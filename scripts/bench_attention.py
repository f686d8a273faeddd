"""Micro-bench: attention implementations at UMD-B/4 shapes on the chip.

python scripts/bench_attention.py
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


def timeit(fn, *args, n=20):
  out = fn(*args)
  float(np.asarray(jax.device_get(out)).reshape(-1)[0])
  t0 = time.perf_counter()
  for _ in range(n):
    out = fn(*args)
  float(np.asarray(jax.device_get(out)).reshape(-1)[0])
  return (time.perf_counter() - t0) / n


def main():
  for (b, l, h, d) in [(256, 168, 12, 64), (256, 261, 12, 64)]:
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, l, h, d), jnp.bfloat16)
               for kk in ks)

    t_xla = timeit(jax.jit(attn.xla_attention), q, k, v)
    t_pal = timeit(jax.jit(lambda q, k, v: attn.pallas_attention(q, k, v)),
                   q, k, v)
    # fwd+bwd comparison
    def loss_x(q, k, v):
      return jnp.sum(attn.xla_attention(q, k, v).astype(jnp.float32))
    def loss_p(q, k, v):
      return jnp.sum(attn.fused_attention(q, k, v, False).astype(jnp.float32))
    gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))
    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))
    t_gx = timeit(lambda q, k, v: gx(q, k, v)[0], q, k, v)
    t_gp = timeit(lambda q, k, v: gp(q, k, v)[0], q, k, v)
    print(f"B{b} L{l} H{h} D{d}: fwd xla {t_xla*1e3:6.2f}ms "
          f"pallas {t_pal*1e3:6.2f}ms | bwd xla {t_gx*1e3:6.2f}ms "
          f"pallas {t_gp*1e3:6.2f}ms", flush=True)


if __name__ == "__main__":
  main()
