"""Model tests: UMD AE forward shapes, conditioning modes, CFG, variants."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from small_vision_tpu.models import ae as ae_mod
from small_vision_tpu.models import vit as vit_mod

TINY = dict(width=64, depth=2, dec_depth=1, num_heads=4, img_size=16,
            patch_size=(4, 4), dtype_mm="float32")


def _init_and_apply(model, rng=0, bs=2, img=16, ch=3, **apply_kw):
  x = jax.random.normal(jax.random.PRNGKey(rng), (bs, img, img, ch))
  t = jnp.zeros((bs,), jnp.int32)
  rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
          "mae_noise": jax.random.PRNGKey(2), "cfg": jax.random.PRNGKey(3)}
  params = model.init(rngs, x, t=t, train=True, mask=0.5)["params"]
  out = model.apply({"params": params}, x, t=t,
                    rngs={k: v for k, v in rngs.items() if k != "params"},
                    **apply_kw)
  return params, out


@pytest.mark.parametrize("adaln", [False, True])
@pytest.mark.parametrize("scan", [False, True])
def test_ae_forward_shapes(adaln, scan):
  model = ae_mod._ViTAE(adaln=adaln, scan=scan, **TINY)
  params, (pred, out) = _init_and_apply(model, mask=0.5, train=True)
  assert pred.shape == (2, 16, 16, 6)       # [x0 | eps] dual head
  assert out["mask"].shape == (2, 16, 16, 1)
  assert out["pre_logits"].shape == (2, 64)
  assert np.isfinite(np.asarray(pred)).all()


def test_ae_no_mask_path():
  model = ae_mod._ViTAE(adaln=True, scan=False, **TINY)
  _, (pred, out) = _init_and_apply(model, mask=0.0)
  assert out["mask"] is None
  assert pred.shape == (2, 16, 16, 6)


@pytest.mark.slow  # 15 s — CFG double-batch semantics also pinned by
# test_reference_parity.py::test_forward_parity_unconditional_and_cfg.
def test_ae_dual_forward_matches_separate_applies():
  """dual_forward (batched embed/decoder/head) == two __call__s, exactly,
  when no masking is involved (masking draws rngs in a different order)."""
  model = ae_mod._ViTAE(adaln=True, scan=False, num_classes=5, **TINY)
  rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
          "mae_noise": jax.random.PRNGKey(2), "cfg": jax.random.PRNGKey(3)}
  img_a = jax.random.normal(jax.random.PRNGKey(10), (2, 16, 16, 3))
  img_b = jax.random.normal(jax.random.PRNGKey(11), (3, 16, 16, 3))
  t_b = jnp.asarray([3, 7, 1], jnp.int32)
  y_b = jnp.asarray([0, 4, 2], jnp.int32)
  params = model.init(rngs, img_a, t=jnp.zeros((2,), jnp.int32),
                      train=True, mask=0.5)["params"]

  apply_rngs = {k: v for k, v in rngs.items() if k != "params"}
  pred, out_a, out_b = model.apply(
      {"params": params}, img_a, img_b, t_b=t_b, y_b=y_b,
      train=False, method="dual_forward", rngs=apply_rngs)
  pred_a, _ = model.apply({"params": params}, img_a,
                          t=jnp.zeros((2,), jnp.int32),
                          train=False, rngs=apply_rngs)
  pred_b, _ = model.apply({"params": params}, img_b, t=t_b, y=y_b,
                          train=False, rngs=apply_rngs)
  assert out_a["mask"] is None and out_b["mask"] is None
  np.testing.assert_allclose(np.asarray(pred[:2]), np.asarray(pred_a),
                             rtol=1e-5, atol=1e-5)
  np.testing.assert_allclose(np.asarray(pred[2:]), np.asarray(pred_b),
                             rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_ae_dual_forward_masked_shapes_and_grads():
  # Slow: 43 s of pure grad-jaxpr compile on the 1-core CI box, for the
  # opt-in fused_branches path whose numerics are covered by the fast
  # test_ae_dual_forward_matches_separate_applies below.
  # depth=1 keeps the grad jaxpr small (this was the slowest fast test).
  model = ae_mod._ViTAE(adaln=True, scan=False, **{**TINY, "depth": 1})
  rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
          "mae_noise": jax.random.PRNGKey(2), "cfg": jax.random.PRNGKey(3)}
  img = jax.random.normal(jax.random.PRNGKey(10), (2, 16, 16, 3))
  params = model.init(rngs, img, t=jnp.zeros((2,), jnp.int32),
                      train=True, mask=0.5)["params"]
  apply_rngs = {k: v for k, v in rngs.items() if k != "params"}

  def loss(p):
    pred, out_a, out_b = model.apply(
        {"params": p}, img[:1], img[1:],
        t_b=jnp.asarray([3], jnp.int32),
        mask_a=0.75, mask_b=0.5, train=True,
        method="dual_forward", rngs=apply_rngs)
    assert out_a["mask"].shape == (1, 16, 16, 1)
    assert out_b["mask"].shape == (1, 16, 16, 1)
    return jnp.sum(pred.astype(jnp.float32) ** 2)

  g = jax.grad(loss)(params)
  assert all(np.isfinite(np.asarray(x, np.float32)).all()
             for x in jax.tree_util.tree_leaves(g))


@pytest.mark.slow
def test_ae_scan_and_loop_same_param_count():
  def n_params(m):
    x = jnp.zeros((1, 16, 16, 3))
    rngs = {"params": jax.random.PRNGKey(0),
            "mae_noise": jax.random.PRNGKey(1)}
    p = m.init(rngs, x, t=jnp.zeros((1,), jnp.int32), train=False, mask=0.0)
    return sum(x.size for x in jax.tree.leaves(p))
  a = n_params(ae_mod._ViTAE(scan=False, **TINY))
  b = n_params(ae_mod._ViTAE(scan=True, **TINY))
  assert a == b


@pytest.mark.slow
def test_ae_class_conditional_and_cfg():
  model = ae_mod._ViTAE(num_classes=10, adaln=True, scan=False, **TINY)
  bs = 4
  x = jax.random.normal(jax.random.PRNGKey(0), (bs, 16, 16, 3))
  t = jnp.ones((bs,), jnp.int32)
  y = jnp.arange(bs) % 10
  rngs = {"params": jax.random.PRNGKey(0), "cfg": jax.random.PRNGKey(3),
          "mae_noise": jax.random.PRNGKey(2),
          "dropout": jax.random.PRNGKey(1)}
  params = model.init(rngs, x, t=t, y=y, train=True, mask=0.5)["params"]

  # CFG double-batch forward: output batch must be bs (not 2*bs).
  pred, _ = model.apply({"params": params}, x, t=t, y=y, cfg_scale=2.0)
  assert pred.shape == (bs, 16, 16, 6)

  # cfg_scale=1.0 must equal the plain conditional forward.
  pred1, _ = model.apply({"params": params}, x, t=t, y=y, cfg_scale=1.0)
  predc, _ = model.apply({"params": params}, x, t=t, y=y)
  np.testing.assert_allclose(np.asarray(pred1), np.asarray(predc),
                             rtol=2e-4, atol=2e-5)


def test_ae_adaln_zero_init_identity():
  """With AdaLN-zero, gates start at 0: blocks are identity at init, so the
  encoder output equals the LayerNorm of the embedded input."""
  model = ae_mod._ViTAE(adaln=True, scan=False, **TINY)
  params, (pred, _) = _init_and_apply(model, mask=0.0)
  mods = params["Encoder"]["blocks_00"]["Dense_0"]["kernel"]
  assert float(jnp.abs(mods).max()) == 0.0
  # Head is near-zero-init (normal 0.02) but final_modulation is exact zero.
  assert float(jnp.abs(
      params["final_modulation"]["kernel"]).max()) == 0.0


def test_ae_variants():
  assert ae_mod.decode_variant("B/4") == {
      "width": 768, "depth": 12, "dec_depth": 4, "num_heads": 12,
      "patch_size": (4, 4)}
  assert ae_mod.decode_variant("L/2")["dec_depth"] == 8
  m = ae_mod.Model(variant="S/8", img_size=32)
  assert m.width == 384 and m.patch_size == (8, 8)


def test_vit_classifier_forward():
  model = vit_mod._ViT(num_classes=10, width=64, depth=2, num_heads=4,
                       patch_size=(8, 8), pool_type="gap",
                       dtype_mm="float32")
  x = jnp.zeros((2, 32, 32, 3))
  params = model.init(jax.random.PRNGKey(0), x)["params"]
  logits, out = model.apply({"params": params}, x)
  assert logits.shape == (2, 10)
  assert out["pre_logits"].shape == (2, 64)
  # head_zeroinit → logits all zero at init.
  np.testing.assert_array_equal(np.asarray(logits), 0.0)


def test_timestep_embedding_distinct():
  from small_vision_tpu.models.embeddings import TimestepEmbed
  emb = TimestepEmbed(32)
  p = emb.init(jax.random.PRNGKey(0), jnp.zeros((2,), jnp.int32))
  e0 = emb.apply(p, jnp.asarray([0, 0]))
  e5 = emb.apply(p, jnp.asarray([5, 900]))
  assert e0.shape == (2, 32)
  assert not np.allclose(np.asarray(e5)[0], np.asarray(e5)[1])
  np.testing.assert_allclose(np.asarray(e0)[0], np.asarray(e0)[1])


def test_flax_attn_impl_matches_xla_forward():
  """attn_impl="flax" (the bench's reference-mode attention — stock flax
  MHA) produces the same forward as the packed path on the same params."""
  x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 64))
  outs = {}
  for impl in ("xla", "flax"):
    m = vit_mod.MultiHeadAttention(num_heads=4, dtype_mm="float32",
                                   attn_impl=impl)
    p = m.init(jax.random.PRNGKey(1), x)["params"]
    outs[impl] = np.asarray(m.apply({"params": p}, x))
  assert jax.tree.map(lambda a: a.shape, outs["xla"]) is not None
  np.testing.assert_allclose(outs["xla"], outs["flax"],
                             rtol=2e-5, atol=2e-5)
