"""Fused LayerNorm(+modulate) Pallas kernel vs the XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from small_vision_tpu.ops import layernorm as ln


def _rand(key, shape, dtype=jnp.float32):
  return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


@pytest.mark.parametrize("l", [7, 16, 257])
@pytest.mark.parametrize("modulate", [False, True])
def test_fused_ln_forward_matches_reference(l, modulate):
  b, d = 4, 256
  x = _rand(0, (b, l, d), jnp.float32)
  gamma = 1.0 + 0.1 * _rand(1, (d,))
  beta = 0.1 * _rand(2, (d,))
  shift = 0.2 * _rand(3, (b, d)) if modulate else None
  scale = 0.2 * _rand(4, (b, d)) if modulate else None

  got = ln.fused_ln_modulate(x, gamma, beta, shift, scale, 1e-6, True)
  want = ln.ln_modulate_reference(x, gamma, beta, shift, scale)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("modulate", [False, True])
def test_fused_ln_grads_match_reference(modulate):
  b, l, d = 4, 37, 256
  x = _rand(0, (b, l, d), jnp.float32)
  gamma = 1.0 + 0.1 * _rand(1, (d,))
  beta = 0.1 * _rand(2, (d,))
  shift = 0.2 * _rand(3, (b, d)) if modulate else None
  scale = 0.2 * _rand(4, (b, d)) if modulate else None
  co = _rand(5, (b, l, d))

  args = (x, gamma, beta, shift, scale)

  def loss_fused(*a):
    return jnp.sum(ln.fused_ln_modulate(*a, 1e-6, True) * co)

  def loss_ref(*a):
    return jnp.sum(ln.ln_modulate_reference(*a).astype(jnp.float32) * co)

  idx = (0, 1, 2, 3, 4) if modulate else (0, 1, 2)
  g_fused = jax.grad(loss_fused, argnums=idx)(*args)
  g_ref = jax.grad(loss_ref, argnums=idx)(*args)
  for gf, gr in zip(g_fused, g_ref):
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=2e-4, atol=2e-4)


def test_fused_ln_bf16_stays_fp32_accurate():
  b, l, d = 4, 16, 256
  x = _rand(0, (b, l, d), jnp.float32)
  gamma, beta = jnp.ones((d,)), jnp.zeros((d,))
  got = ln.fused_ln_modulate(x.astype(jnp.bfloat16), gamma, beta,
                             None, None, 1e-6, True)
  want = ln.ln_modulate_reference(x, gamma, beta, None, None)
  assert got.dtype == jnp.bfloat16
  np.testing.assert_allclose(
      np.asarray(got, np.float32), np.asarray(want), rtol=0.02, atol=0.02)


def test_block_pallas_interpret_matches_xla():
  """Full Block (fused LN+modulate+attention) pallas vs XLA path."""
  import jax
  from small_vision_tpu.models import vit

  x = _rand(0, (4, 37, 128), jnp.float32)
  cond = _rand(1, (4, 128), jnp.float32)
  outs = {}
  for impl in ("xla", "pallas_interpret"):
    m = vit.Block(num_heads=2, adaln=True, dtype_mm="float32",
                  attn_impl=impl)
    p = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x, cond, True)
    y, _ = m.apply(p, x, cond, True)
    outs[impl] = np.asarray(y)
  np.testing.assert_allclose(outs["xla"], outs["pallas_interpret"],
                             rtol=2e-4, atol=2e-4)


def test_block_bf16_pallas_grads_dtype_consistent():
  """bf16 AdaLN: dshift/dscale cotangents must match the primal bf16 dtype.

  Regression: on-chip this surfaced as `lax.concatenate requires arguments to
  have the same dtypes (f32, f32, bf16, ...)` in the modulation-split
  backward, because the fused-LN VJP returned f32 cotangents for the bf16
  AdaLN shift/scale.
  """
  import jax
  from small_vision_tpu.models import vit

  x = _rand(0, (4, 24, 128), jnp.float32)
  cond = _rand(1, (4, 128), jnp.float32)
  m = vit.Block(num_heads=2, adaln=True, dtype_mm="bfloat16",
                attn_impl="pallas_interpret")
  p = m.init({"params": jax.random.PRNGKey(0),
              "dropout": jax.random.PRNGKey(1)}, x, cond, True)

  def loss(params):
    y, _ = m.apply({"params": params}, x, cond, True)
    return jnp.sum(y.astype(jnp.float32) ** 2)

  g = jax.grad(loss)(p["params"])
  assert all(np.isfinite(np.asarray(x, np.float32)).all()
             for x in jax.tree_util.tree_leaves(g))


def test_block_pallas_interpret_grads_match_xla():
  import jax
  from small_vision_tpu.models import vit

  x = _rand(0, (4, 24, 128), jnp.float32)
  cond = _rand(1, (4, 128), jnp.float32)
  grads = {}
  for impl in ("xla", "pallas_interpret"):
    m = vit.Block(num_heads=2, adaln=True, dtype_mm="float32",
                  attn_impl=impl)
    p = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x, cond, True)

    def loss(params, m=m):
      y, _ = m.apply({"params": params}, x, cond, True)
      return jnp.sum(y ** 2)

    grads[impl] = jax.grad(loss)(p["params"])
  flat_x = jax.tree_util.tree_leaves_with_path(grads["xla"])
  flat_p = dict(jax.tree_util.tree_leaves_with_path(grads["pallas_interpret"]))
  for path, gx in flat_x:
    gp = flat_p[path]
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gp),
                               rtol=5e-4, atol=5e-4,
                               err_msg=jax.tree_util.keystr(path))
