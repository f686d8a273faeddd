"""On-chip numerical verification of the packed fused-attention kernels.

Interpret mode (CPU tests) zero-fills out-of-bounds block reads, but real
hardware reads garbage HBM — this script verifies values AND gradients
against the XLA path on the actual TPU at the model's sequence lengths.

python scripts/verify_attention_chip.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from small_vision_tpu.ops import attention as attn


def main():
  ok = True
  for (b, l, h, d) in [(16, 164, 12, 64), (16, 261, 12, 64),
                       (16, 80, 12, 64)]:
    ks = jax.random.split(jax.random.PRNGKey(l), 3)
    q, k, v = (jax.random.normal(kk, (b, l, h, d), jnp.float32)
               for kk in ks)
    pack = lambda x: x.reshape(b, l, h * d)

    ref = attn.xla_attention(q, k, v)
    out = attn.fused_attention_packed(pack(q), pack(k), pack(v), h, False)
    err = float(jnp.max(jnp.abs(out.reshape(ref.shape) - ref)))

    def loss_p(q, k, v):
      return jnp.sum(jnp.sin(
          attn.fused_attention_packed(pack(q), pack(k), pack(v), h, False)))

    def loss_x(q, k, v):
      return jnp.sum(jnp.sin(attn.xla_attention(q, k, v)))

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))(q, k, v)
    gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))(q, k, v)
    gerr = max(float(jnp.max(jnp.abs(a - bb))) for a, bb in zip(gp, gx))
    status = "OK" if err < 5e-3 and gerr < 5e-3 else "FAIL"
    ok &= status == "OK"
    print(f"L={l}: fwd_err={err:.2e} grad_err={gerr:.2e} {status}",
          flush=True)
  print("ALL OK" if ok else "FAILURES PRESENT")


if __name__ == "__main__":
  main()
