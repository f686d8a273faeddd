"""One-off ablation: where does the train-step time go on the real chip?

Usage: python scripts/ablate_step.py <config_name>
Configs: base | dots | noremat | nomask | fwdonly | noargsort
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

from small_vision_tpu.models import ae as ae_mod

NAME = sys.argv[1] if len(sys.argv) > 1 else "base"
BS = 256

x = jnp.zeros((BS, 64, 64, 3), jnp.float32)
t = jnp.ones((BS,), jnp.int32)
rng = jax.random.PRNGKey(0)
rngs = {"params": rng, "dropout": rng, "mae_noise": rng}

cfg = dict(
    base=dict(scan=True, policy="nothing_saveable", mask=0.375, grad=True),
    dots=dict(scan=True, policy="dots_saveable", mask=0.375, grad=True),
    noremat=dict(scan=False, policy="nothing_saveable", mask=0.375,
                 grad=True),
    nomask=dict(scan=True, policy="nothing_saveable", mask=0.0, grad=True),
    fwdonly=dict(scan=True, policy="nothing_saveable", mask=0.375,
                 grad=False),
    pallas=dict(scan=True, policy="nothing_saveable", mask=0.375, grad=True,
                attn="pallas"),
    pallas_fwd=dict(scan=True, policy="nothing_saveable", mask=0.375,
                    grad=False, attn="pallas"),
    pallas_noremat=dict(scan=False, policy="nothing_saveable", mask=0.375,
                        grad=True, attn="pallas"),
    pallas_saveattn=dict(scan=True, policy="save_attn", mask=0.375,
                         grad=True, attn="pallas"),
    pallas_scan_noremat=dict(scan=True, policy="none", mask=0.375,
                             grad=True, attn="pallas"),
)[NAME]

model = ae_mod.Model(variant="B/4", img_size=64, scan=cfg["scan"],
                     adaln=True, dtype_mm="bfloat16",
                     attn_impl=cfg.get("attn", "xla"),
                     remat_policy=cfg["policy"])
params = model.init(rngs, x[:2], t=t[:2], train=True, mask=0.375)["params"]


def loss_fn(p):
  pred, _ = model.apply({"params": p}, x, t=t, train=True, mask=cfg["mask"],
                        rngs={"dropout": rng, "mae_noise": rng})
  return jnp.mean(pred ** 2)


fn = jax.jit(jax.value_and_grad(loss_fn) if cfg["grad"] else loss_fn)

t0 = time.perf_counter()
out = fn(params)
first = jax.tree.leaves(out)[0]
float(np.asarray(jax.device_get(first)).reshape(-1)[0])
compile_s = time.perf_counter() - t0

t0 = time.perf_counter()
N = 5
for _ in range(N):
  out = fn(params)
first = jax.tree.leaves(out)[0]
float(np.asarray(jax.device_get(first)).reshape(-1)[0])
dt = (time.perf_counter() - t0) / N
print(f"ABLATE {NAME}: {dt * 1000:.1f} ms/call (compile {compile_s:.0f}s)",
      flush=True)
