"""shard_map explicit-collective step vs the GSPMD-sharded step.

Runs on the virtual 8-device CPU mesh (conftest). The loss is the unmasked
diffusion branch with injected (t, noise), so every path is deterministic
and the comparisons are exact to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

pytestmark = pytest.mark.slow  # FSDP-class integration tests

from small_vision_tpu import parallel
from small_vision_tpu.models import ae as ae_mod
from small_vision_tpu.ops import diffusion as gd_lib
from small_vision_tpu.parallel import explicit_step
from small_vision_tpu.parallel.sharding import infer_sharding, reshard

TINY = dict(width=64, depth=2, dec_depth=1, num_heads=4, img_size=16,
            patch_size=(4, 4), dtype_mm="float32", scan=False)
B = 16


def _setup(mesh, strategy, min_shard=2**18):
  model = ae_mod._ViTAE(adaln=True, **TINY)
  rngs = {"params": jax.random.PRNGKey(0)}
  x = jnp.zeros((2, 16, 16, 3))
  params = model.init(rngs, x, t=jnp.zeros((2,), jnp.int32))["params"]
  tx = optax.adamw(1e-3)
  opt = tx.init(params)
  gd = gd_lib.GaussianDiffusion.create("cosine", 50)

  pstrat = "fully_sharded" if strategy == "zero3" else "replicated"
  kw = dict(min_size_to_shard=min_shard) if strategy == "zero3" else {}
  p_shard = infer_sharding(jax.eval_shape(lambda: params), mesh, pstrat, **kw)
  o_shard = infer_sharding(jax.eval_shape(lambda: opt), mesh, pstrat, **kw)
  repl = parallel.replicated_sharding(mesh)
  train_state = {
      "params": jax.tree.map(lambda x, s: jax.device_put(x, s),
                             params, p_shard),
      "opt": jax.tree.map(lambda x, s: jax.device_put(x, s), opt, o_shard),
      "gd": reshard(gd, repl),
  }

  rng = np.random.default_rng(0)
  batch = {
      "image": jnp.asarray(rng.normal(size=(B, 16, 16, 3)), jnp.float32),
      "t": jnp.asarray(rng.integers(0, 50, B), jnp.int32),
      "noise": jnp.asarray(rng.normal(size=(B, 16, 16, 3)), jnp.float32),
  }
  bs = parallel.batch_sharding(mesh)
  batch = jax.tree.map(lambda x: jax.device_put(x, bs), batch)
  return model, tx, train_state, batch


def _gspmd_step(model, tx, mesh, train_state, batch):
  """The GSPMD analogue: plain jit + shardings, XLA inserts collectives."""

  @jax.jit
  def update(ts, b):
    def loss_fn(p):
      return explicit_step._diffusion_loss(
          model, p, ts["gd"], b["image"], b["t"], b["noise"], 3)
    loss, grads = jax.value_and_grad(loss_fn)(ts["params"])
    updates, opt = tx.update(grads, ts["opt"], ts["params"])
    params = optax.apply_updates(ts["params"], updates)
    return {"params": params, "opt": opt, "gd": ts["gd"]}, loss

  return update(train_state, batch)


@pytest.mark.parametrize("mesh_kw,strategy", [
    (dict(), "dp"),
    (dict(fsdp=4), "zero3"),
    (dict(data=2, fsdp=4), "zero3"),
])
def test_explicit_step_matches_gspmd(mesh_kw, strategy):
  mesh = parallel.make_mesh(**mesh_kw)
  model, tx, train_state, batch = _setup(mesh, strategy, min_shard=1024)

  make = explicit_step.make_explicit_update_fn(
      model, tx, mesh, strategy=strategy, channels=3, min_size_to_shard=1024)
  update = make(train_state, batch)
  new_state, loss = update(train_state, batch)
  loss = float(jax.device_get(loss))

  # GSPMD reference on a replicated copy of the same state.
  repl_mesh = parallel.make_mesh()
  model2, tx2, ts2, batch2 = _setup(repl_mesh, "dp")
  ref_state, ref_loss = _gspmd_step(model2, tx2, repl_mesh, ts2, batch2)
  ref_loss = float(jax.device_get(ref_loss))

  assert np.isfinite(loss)
  np.testing.assert_allclose(loss, ref_loss, rtol=1e-5, atol=1e-6)
  got = jax.tree.leaves(jax.tree.map(
      lambda x: np.asarray(jax.device_get(x)), new_state["params"]))
  want = jax.tree.leaves(jax.tree.map(
      lambda x: np.asarray(jax.device_get(x)), ref_state["params"]))
  for g, w in zip(got, want):
    np.testing.assert_allclose(g, w, rtol=2e-4, atol=2e-5)


def test_zero3_grad_clip_matches_gspmd_global_norm():
  """ADVICE r2: clip_by_global_norm inside the zero3 shard_map would use
  per-shard norms; the `grad_clip_norm` arg psums the norm across 'fsdp'.
  Pin it against the GSPMD step with optax.clip_by_global_norm in the chain
  (the production recipe's grad_clip_norm=1.0 path)."""
  clip = 0.05  # small enough that the clip actually triggers
  mesh = parallel.make_mesh(fsdp=4)
  tx_plain = optax.adamw(1e-3)
  model, _, train_state, batch = _setup(mesh, "zero3", min_shard=1024)
  make = explicit_step.make_explicit_update_fn(
      model, tx_plain, mesh, strategy="zero3", channels=3,
      min_size_to_shard=1024, grad_clip_norm=clip)
  update = make(train_state, batch)
  new_state, loss = update(train_state, batch)

  repl_mesh = parallel.make_mesh()
  model2, _, ts2, batch2 = _setup(repl_mesh, "dp")
  tx_ref = optax.chain(optax.clip_by_global_norm(clip), optax.adamw(1e-3))
  ts2["opt"] = tx_ref.init(ts2["params"])
  ref_state, ref_loss = _gspmd_step(model2, tx_ref, repl_mesh, ts2, batch2)

  np.testing.assert_allclose(float(jax.device_get(loss)),
                             float(jax.device_get(ref_loss)),
                             rtol=1e-5, atol=1e-6)
  got = jax.tree.leaves(jax.tree.map(
      lambda x: np.asarray(jax.device_get(x)), new_state["params"]))
  want = jax.tree.leaves(jax.tree.map(
      lambda x: np.asarray(jax.device_get(x)), ref_state["params"]))
  for g, w in zip(got, want):
    np.testing.assert_allclose(g, w, rtol=2e-4, atol=2e-5)


def test_zero3_step_emits_explicit_collectives():
  """The compiled zero3 step contains the hand-placed collectives."""
  mesh = parallel.make_mesh(fsdp=8)
  model, tx, train_state, batch = _setup(mesh, "zero3", min_shard=1024)
  make = explicit_step.make_explicit_update_fn(
      model, tx, mesh, strategy="zero3", channels=3, min_size_to_shard=1024)
  update = make(train_state, batch)
  hlo = update.lower(train_state, batch).compile().as_text()
  assert "all-gather" in hlo
  assert "reduce-scatter" in hlo


def test_zero3_params_stay_sharded():
  mesh = parallel.make_mesh(fsdp=8)
  model, tx, train_state, batch = _setup(mesh, "zero3", min_shard=1024)
  make = explicit_step.make_explicit_update_fn(
      model, tx, mesh, strategy="zero3", channels=3, min_size_to_shard=1024)
  update = make(train_state, batch)
  new_state, _ = update(train_state, batch)
  # Big leaves keep their fsdp sharding after the update.
  shardings = infer_sharding(
      jax.eval_shape(lambda: new_state["params"]), mesh, "fully_sharded",
      min_size_to_shard=1024)
  flat_new = jax.tree_util.tree_leaves_with_path(new_state["params"])
  flat_spec = dict(jax.tree_util.tree_leaves_with_path(
      jax.tree.map(lambda s: s.spec, shardings)))
  def norm(spec):  # P("fsdp") == P("fsdp", None): strip trailing Nones
    t = tuple(spec)
    while t and t[-1] is None:
      t = t[:-1]
    return t

  checked = 0
  for path, leaf in flat_new:
    spec = flat_spec[path]
    if any(e == "fsdp" for e in spec):
      assert norm(leaf.sharding.spec) == norm(spec), (
          path, leaf.sharding.spec, spec)
      checked += 1
  assert checked > 0
