"""Pipeline parallelism (parallel/pipeline.py) vs the sequential stack.

Exactness contract: the GPipe schedule reorders WHICH device computes which
(layer, microbatch) pair but not the math — outputs and gradients must match
running the same stacked blocks with a plain lax.scan on one logical device
to float32 kernel-choice tolerance (XLA compiles different-but-equivalent
gemms for microbatch-sized shapes; psum reduction order differs for grads).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from small_vision_tpu.parallel import mesh as mesh_lib
from small_vision_tpu.parallel import pipeline as pl

D = 16
L_LAYERS = 8


def _block_fn(layer_params, x):
  # A residual tanh MLP block: enough structure for nontrivial grads.
  w, b, v = layer_params["w"], layer_params["b"], layer_params["v"]
  return x + jnp.tanh(x @ w + b) @ v


def _stacked_params(key):
  kw, kv = jax.random.split(key)
  return {
      "w": jax.random.normal(kw, (L_LAYERS, D, D)) * 0.3,
      "b": jnp.zeros((L_LAYERS, D)),
      "v": jax.random.normal(kv, (L_LAYERS, D, D)) * 0.3,
  }


def _sequential(stacked, x):
  def body(h, layer_params):
    return _block_fn(layer_params, h), None

  out, _ = jax.lax.scan(body, x, stacked)
  return out


@pytest.mark.parametrize("mesh_kw,batch_axes,n_mb", [
    (dict(data=1, pipe=8), (), 4),
    (dict(data=2, pipe=4), ("data",), 8),
    (dict(data=1, pipe=2, fsdp=4), (), 2),  # pipe composed with unused fsdp
])
def test_pipeline_forward_matches_sequential(mesh_kw, batch_axes, n_mb):
  mesh = mesh_lib.make_mesh(**mesh_kw)
  stacked = _stacked_params(jax.random.PRNGKey(0))
  x = jax.random.normal(jax.random.PRNGKey(1), (16, D))

  ref = _sequential(stacked, x)
  staged = pl.stage_params(stacked, mesh.shape["pipe"])
  got = jax.jit(lambda p, x: pl.pipeline_apply(
      _block_fn, p, x, mesh=mesh, n_microbatches=n_mb,
      batch_axes=batch_axes))(staged, x)

  np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                             rtol=3e-5, atol=3e-5)


def test_stage_roundtrip():
  stacked = _stacked_params(jax.random.PRNGKey(2))
  staged = pl.stage_params(stacked, 4)
  assert staged["w"].shape == (4, 2, D, D)
  back = pl.unstage_params(staged)
  jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
               stacked, back)


def test_pipeline_grads_match_sequential():
  mesh = mesh_lib.make_mesh(data=2, pipe=4)
  stacked = _stacked_params(jax.random.PRNGKey(3))
  x = jax.random.normal(jax.random.PRNGKey(4), (8, D))
  tgt = jax.random.normal(jax.random.PRNGKey(5), (8, D))

  def loss_seq(p, x):
    return jnp.mean((_sequential(p, x) - tgt) ** 2)

  def loss_pipe(staged, x):
    out = pl.pipeline_apply(_block_fn, staged, x, mesh=mesh,
                            n_microbatches=4, batch_axes=("data",))
    return jnp.mean((out - tgt) ** 2)

  g_ref_p, g_ref_x = jax.grad(loss_seq, argnums=(0, 1))(stacked, x)
  staged = pl.stage_params(stacked, 4)
  g_p, g_x = jax.jit(jax.grad(loss_pipe, argnums=(0, 1)))(staged, x)
  g_p = pl.unstage_params(g_p)

  jax.tree.map(
      lambda a, b: np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
      g_p, g_ref_p)
  np.testing.assert_allclose(np.asarray(g_x), np.asarray(g_ref_x),
                             rtol=2e-4, atol=1e-6)


def test_bubble_fraction():
  assert pl.bubble_fraction(1, 4) == 0.0
  assert pl.bubble_fraction(4, 13) == pytest.approx(3 / 16)


@pytest.mark.slow  # 46 s — heaviest fast test; device-pp equality also
# runs every round in the driver dryrun + 2-process suite (test_multihost).
def test_model_pipeline_equals_scan():
  """The FULL flagship model with pipe_stages=4 (enc 8 layers, dec 4) on a
  data=2 x pipe=4 mesh matches the plain scanned model, fwd and grads."""
  from small_vision_tpu.models import ae
  from small_vision_tpu.parallel import ctx

  kw = dict(width=32, depth=8, dec_depth=4, num_heads=4, img_size=16,
            patch_size=(4, 4), scan=True, adaln=True, dtype_mm="float32",
            attn_impl="xla")
  m_scan = ae.Model(**kw)
  m_pipe = ae.Model(**kw, pipe_stages=4, pipe_microbatches=2)

  rng = jax.random.PRNGKey(0)
  x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3))
  t = jnp.arange(8, dtype=jnp.int32) % 5 + 1
  rngs = {"params": rng, "dropout": rng, "mae_noise": rng, "cfg": rng}
  params = m_scan.init(rngs, x, t=t, train=False)["params"]

  def fwd(model, params, x):
    pred, _ = model.apply({"params": params}, x, t=t, train=False)
    return pred

  ref = fwd(m_scan, params, x)
  mesh = mesh_lib.make_mesh(data=2, pipe=4)
  with ctx.activate_mesh(mesh):
    got = jax.jit(lambda p, x: fwd(m_pipe, p, x))(params, x)
  np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                             rtol=3e-5, atol=3e-5)

  def loss(model):
    def f(params, x):
      return jnp.mean(fwd(model, params, x) ** 2)
    return f

  g_ref = jax.grad(loss(m_scan))(params, x)
  with ctx.activate_mesh(mesh):
    g_pipe = jax.jit(jax.grad(loss(m_pipe)))(params, x)
  jax.tree.map(
      lambda a, b: np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5),
      g_pipe, g_ref)


def test_pipeline_sharding_strategy():
  """'pipeline' infer_sharding places block stacks on 'pipe', rest repl."""
  from small_vision_tpu.parallel.sharding import infer_sharding
  from jax.sharding import PartitionSpec as P

  mesh = mesh_lib.make_mesh(data=2, pipe=4)
  tree = {
      "Encoder": {"blocks": {"Dense_0": {
          "kernel": jnp.zeros((8, 16, 16))}}},
      "embedding": {"kernel": jnp.zeros((4, 4, 3, 16))},
  }
  sh = infer_sharding(tree, mesh, "pipeline")
  assert sh["Encoder"]["blocks"]["Dense_0"]["kernel"].spec == \
      P("pipe", None, None)
  assert sh["embedding"]["kernel"].spec == P()


def test_pipeline_real_vit_blocks():
  """The model's own transformer Block, pipelined over 4 stages + DP=2."""
  from small_vision_tpu.models import vit

  depth, width, heads, seq = 8, 32, 4, 10
  block = vit.Block(mlp_dim=2 * width, num_heads=heads, adaln=False,
                    dtype_mm="float32", attn_impl="xla")
  enc = vit.Encoder(depth=depth, mlp_dim=2 * width, num_heads=heads,
                    scan=True, adaln=False, dtype_mm="float32",
                    attn_impl="xla", remat_policy="none")
  x = jax.random.normal(jax.random.PRNGKey(0), (8, seq, width))
  params = enc.init(jax.random.PRNGKey(1), x)["params"]
  stacked = params["blocks"]  # leaves: [depth, ...]

  def block_fn(layer_params, h):
    h, _ = block.apply({"params": layer_params}, h, None, True)
    return h

  def seq_apply(stacked, h):
    def body(h, lp):
      return block_fn(lp, h), None
    out, _ = jax.lax.scan(body, h, stacked)
    return out

  ref = seq_apply(stacked, x)
  mesh = mesh_lib.make_mesh(data=2, pipe=4)
  staged = pl.stage_params(stacked, 4)
  got = jax.jit(lambda p, h: pl.pipeline_apply(
      block_fn, p, h, mesh=mesh, n_microbatches=4,
      batch_axes=("data",)))(staged, x)
  np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                             rtol=3e-5, atol=3e-5)
