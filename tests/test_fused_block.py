"""Fused MHA / MLP Pallas kernels vs pure-XLA references (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from small_vision_tpu.ops import fused_block as fb


def _rand(key, shape, dtype=jnp.float32):
  return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


def _mha_args(b=4, l=37, d=128, dtype=jnp.float32):
  x = _rand(0, (b, l, d), dtype)
  ws = [(_rand(10 + i, (d, d), dtype) * 0.08) for i in range(4)]
  bs = [(_rand(20 + i, (d,), dtype) * 0.02) for i in range(4)]
  wq, wk, wv, wo = ws
  bq, bk, bv, bo = bs
  return x, wq, bq, wk, bk, wv, bv, wo, bo


@pytest.mark.parametrize("l", [16, 37])
def test_fused_mha_forward_matches_reference(l):
  args = _mha_args(l=l)
  got = fb.fused_mha(*args, 2, True)
  want = fb._mha_reference(*args, 2, None)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=2e-4, atol=2e-4)


def test_fused_mha_grads_match_reference():
  args = _mha_args()
  co = _rand(5, (4, 37, 128))

  def loss_fused(*a):
    return jnp.sum(fb.fused_mha(*a, 2, True) * co)

  def loss_ref(*a):
    return jnp.sum(fb._mha_reference(*a, 2, None) * co)

  idx = tuple(range(9))
  gf = jax.grad(loss_fused, argnums=idx)(*args)
  gr = jax.grad(loss_ref, argnums=idx)(*args)
  for f, r in zip(gf, gr):
    np.testing.assert_allclose(np.asarray(f), np.asarray(r),
                               rtol=5e-4, atol=5e-4)


def test_fused_mha_bf16_output_and_cotangents():
  args = _mha_args(dtype=jnp.bfloat16)
  out = fb.fused_mha(*args, 2, True)
  assert out.dtype == jnp.bfloat16

  def loss(*a):
    return jnp.sum(fb.fused_mha(*a, 2, True).astype(jnp.float32))

  g = jax.grad(loss, argnums=tuple(range(9)))(*args)
  for gi, ai in zip(g, args):
    assert gi.dtype == ai.dtype
    assert np.isfinite(np.asarray(gi, np.float32)).all()


@pytest.mark.parametrize("l", [16, 37])
def test_fused_mlp_forward_matches_reference(l):
  b, d, dh = 4, 128, 512
  x = _rand(0, (b, l, d))
  w1, b1 = _rand(1, (d, dh)) * 0.08, _rand(2, (dh,)) * 0.02
  w2, b2 = _rand(3, (dh, d)) * 0.08, _rand(4, (d,)) * 0.02
  got = fb.fused_mlp(x, w1, b1, w2, b2, True)
  want = fb._mlp_reference(x, w1, b1, w2, b2)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=2e-4, atol=2e-4)


def test_fused_mlp_grads_match_reference():
  b, l, d, dh = 4, 24, 128, 512
  x = _rand(0, (b, l, d))
  w1, b1 = _rand(1, (d, dh)) * 0.08, _rand(2, (dh,)) * 0.02
  w2, b2 = _rand(3, (dh, d)) * 0.08, _rand(4, (d,)) * 0.02
  co = _rand(5, (b, l, d))

  def loss_fused(*a):
    return jnp.sum(fb.fused_mlp(*a, True) * co)

  def loss_ref(*a):
    return jnp.sum(fb._mlp_reference(*a) * co)

  idx = tuple(range(5))
  gf = jax.grad(loss_fused, argnums=idx)(x, w1, b1, w2, b2)
  gr = jax.grad(loss_ref, argnums=idx)(x, w1, b1, w2, b2)
  for f, r in zip(gf, gr):
    np.testing.assert_allclose(np.asarray(f), np.asarray(r),
                               rtol=5e-4, atol=5e-4)


def test_block_fused_impl_matches_xla():
  """Full Block under attn_impl=pallas_fused_interpret == the XLA path,
  with an IDENTICAL param tree (same init values from the same rng)."""
  from small_vision_tpu.models import vit

  x = _rand(0, (4, 37, 128), jnp.float32)
  cond = _rand(1, (4, 128), jnp.float32)
  outs, trees = {}, {}
  for impl in ("xla", "pallas_fused_interpret"):
    m = vit.Block(num_heads=2, adaln=True, dtype_mm="float32",
                  attn_impl=impl)
    p = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x, cond, True)
    y, _ = m.apply(p, x, cond, True)
    outs[impl] = np.asarray(y)
    trees[impl] = jax.tree.map(np.asarray, p["params"])
  # Identical param trees (paths AND values).
  fx = jax.tree_util.tree_flatten_with_path(trees["xla"])
  fp = dict(jax.tree_util.tree_flatten_with_path(
      trees["pallas_fused_interpret"])[0])
  for path, vx in fx[0]:
    np.testing.assert_array_equal(vx, fp[path],
                                  err_msg=jax.tree_util.keystr(path))
  np.testing.assert_allclose(outs["xla"], outs["pallas_fused_interpret"],
                             rtol=2e-4, atol=2e-4)


def test_block_fused_impl_grads_match_xla():
  from small_vision_tpu.models import vit

  x = _rand(0, (4, 24, 128), jnp.float32)
  cond = _rand(1, (4, 128), jnp.float32)
  grads = {}
  for impl in ("xla", "pallas_fused_interpret"):
    m = vit.Block(num_heads=2, adaln=True, dtype_mm="float32",
                  attn_impl=impl)
    p = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x, cond, True)

    def loss(params, m=m):
      y, _ = m.apply({"params": params}, x, cond, True)
      return jnp.sum(y ** 2)

    grads[impl] = jax.grad(loss)(p["params"])
  flat_x = jax.tree_util.tree_leaves_with_path(grads["xla"])
  flat_p = dict(jax.tree_util.tree_leaves_with_path(
      grads["pallas_fused_interpret"]))
  for path, gx in flat_x:
    np.testing.assert_allclose(np.asarray(gx), np.asarray(flat_p[path]),
                               rtol=5e-4, atol=5e-4,
                               err_msg=jax.tree_util.keystr(path))


def test_fused_mha_matches_module_math():
  """fused_mha == the unfused MultiHeadAttention module on the same params."""
  from small_vision_tpu.models import vit

  b, l, d, h = 2, 20, 128, 2
  x = _rand(0, (b, l, d))
  m = vit.MultiHeadAttention(num_heads=h, dtype_mm="float32", attn_impl="xla")
  params = m.init(jax.random.PRNGKey(0), x)["params"]
  want = m.apply({"params": params}, x)

  p = params
  flat = lambda t: np.asarray(t).reshape(t.shape[0], -1) \
      if t.ndim == 3 else np.asarray(t).reshape(-1)
  got = fb.fused_mha(
      x,
      jnp.asarray(flat(p["query"]["kernel"])),
      jnp.asarray(flat(p["query"]["bias"])),
      jnp.asarray(flat(p["key"]["kernel"])),
      jnp.asarray(flat(p["key"]["bias"])),
      jnp.asarray(flat(p["value"]["kernel"])),
      jnp.asarray(flat(p["value"]["bias"])),
      jnp.asarray(np.asarray(p["out"]["kernel"]).reshape(d, d)),
      jnp.asarray(flat(p["out"]["bias"])),
      h, True)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=2e-4, atol=2e-4)
