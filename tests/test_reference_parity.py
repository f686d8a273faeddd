"""Differential parity tests against the reference implementation.

The reference tree at /root/reference (big_vision UMD) is importable from
this repo with TF 2.21 present; these tests compare this framework's output
against the reference's own functions — diffusion tables and math
(gaussian_diffusion.py), pp ops (pp/ops_image.py, ops_general.py via the TF
graph ops), the inception-crop box distribution
(tf.image.sample_distorted_bounding_box), and a same-weights model forward
through the checkpoint converter (utils/convert_ref.py).

Skipped wholesale when /root/reference is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "big_vision")),
    reason="reference tree not present")

if REF_ROOT not in sys.path:
  sys.path.insert(0, REF_ROOT)

# The reference's autoaugment imports tensorflow_addons (not installed); only
# the full AA policy set needs it, which these tests never touch.
for _m in ("tensorflow_addons", "tensorflow_addons.image"):
  sys.modules.setdefault(_m, types.ModuleType(_m))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# The reference predates jax 0.8 (uses the removed jax.tree_map alias);
# restore it so reference modules run unmodified.
if not hasattr(jax, "tree_map"):
  jax.tree_map = jax.tree.map

from small_vision_tpu.ops import diffusion as my_gd  # noqa: E402
# Registration side effects for this framework's pp ops.
import small_vision_tpu.pp.ops_general  # noqa: E402,F401
import small_vision_tpu.pp.ops_image  # noqa: E402,F401


@pytest.fixture(scope="module")
def ref_gd():
  import big_vision.gaussian_diffusion as m
  return m


# ---------------------------------------------------------------------------
# (a) schedule tables — float64-exact for cosine+linear
# ---------------------------------------------------------------------------

_LIVE_TABLES = (
    # Every table a live reference code path reads (q_sample, ddim_sample,
    # q_posterior mean, eps<->x0). posterior_variance is intentionally NOT
    # here: the reference computes it with a non-standard formula
    # (gaussian_diffusion.py:43 divides by 1-acp[-1]) but never uses the
    # value (p_mean_variance discards it) — we keep the standard DDPM
    # posterior instead; see test_posterior_variance_is_standard.
    "betas", "alphas_cumprod", "alphas_cumprod_prev",
    "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod",
    "sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
    "posterior_mean_coef1", "posterior_mean_coef2",
)


@pytest.mark.parametrize("sched", ["cosine", "linear"])
@pytest.mark.parametrize("steps", [1000, 50])
def test_schedule_tables_match_reference(ref_gd, sched, steps):
  ref = ref_gd.create_gaussian_diffusion(sched, steps)
  # The float64 beta table itself must be bit-identical (SURVEY §7 hard part).
  np.testing.assert_array_equal(
      my_gd.make_beta_schedule(sched, steps), ref["betas"])
  mine = my_gd.GaussianDiffusion.create(sched, steps)
  for k in _LIVE_TABLES:
    # Ours are stored float32 (device tables); the reference feeds float64
    # numpy into jit, where XLA casts to f32 at trace time — so f32-cast
    # equality is the operative contract.
    np.testing.assert_array_equal(
        np.asarray(getattr(mine, k)), ref[k].astype(np.float32), err_msg=k)


def test_posterior_variance_is_standard():
  """Our posterior_variance follows DDPM eq. 7 (the reference's own
  q_posterior docstring), not the reference's unused non-standard value."""
  mine = my_gd.GaussianDiffusion.create("cosine", 100)
  betas = my_gd.make_beta_schedule("cosine", 100)
  acp = np.cumprod(1 - betas)
  acp_prev = np.append(1.0, acp[:-1])
  std = betas * (1 - acp_prev) / (1 - acp)
  np.testing.assert_array_equal(
      np.asarray(mine.posterior_variance), std.astype(np.float32))


# ---------------------------------------------------------------------------
# (b) diffusion functions on random tensors
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def gd_pair(ref_gd):
  return (my_gd.GaussianDiffusion.create("cosine", 100),
          ref_gd.create_gaussian_diffusion("cosine", 100))


def _rand(shape, seed):
  return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def test_q_sample_and_conversions_match(ref_gd, gd_pair):
  mine, ref = gd_pair
  x0 = _rand((4, 8, 8, 3), 0)
  noise = _rand((4, 8, 8, 3), 1)
  t = np.array([0, 7, 42, 99], np.int32)
  t_ref = t[:, None]  # reference carries (B, 1)

  np.testing.assert_allclose(
      my_gd.q_sample(mine, x0, t, noise),
      ref_gd.q_sample(gd=ref, x_start=x0, t=t_ref, noise=noise),
      rtol=0, atol=1e-6)

  x_t = np.asarray(my_gd.q_sample(mine, x0, t, noise))
  eps = _rand((4, 8, 8, 3), 2)
  np.testing.assert_allclose(
      my_gd.predict_xstart_from_eps(mine, x_t, t, eps),
      ref_gd._predict_xstart_from_eps(ref, x_t=x_t, t=t_ref, eps=eps),
      rtol=2e-5, atol=1e-5)  # ref runs in f64 numpy; ours f32 on device
  np.testing.assert_allclose(
      my_gd.predict_eps_from_xstart(mine, x_t, t, x0),
      ref_gd._predict_eps_from_xstart(ref, x_t, t_ref, x0),
      rtol=2e-5, atol=1e-5)
  np.testing.assert_allclose(
      my_gd.q_posterior_mean(mine, x0, x_t, t),
      ref_gd.q_posterior_mean_variance(ref, x_start=x0, x_t=x_t,
                                       t=t_ref)[0],
      rtol=0, atol=1e-6)
  np.testing.assert_allclose(
      np.asarray(my_gd.snr(mine, t)).ravel(),
      np.asarray(ref_gd.snr(gd=ref, t=t)).ravel(), rtol=1e-6)


def _fake_eps_model(x_t, t, rng, y=None, cfg_scale=None):
  """Deterministic stand-in eps model used identically on both sides."""
  del rng, y, cfg_scale
  tb = t.reshape(t.shape[0], 1, 1, 1).astype(jnp.float32)
  return jnp.tanh(x_t) * 0.7 + 0.001 * tb


@pytest.mark.parametrize("clip", [False, True])
def test_ddim_step_matches(ref_gd, gd_pair, clip):
  mine, ref = gd_pair
  x = _rand((4, 8, 8, 3), 3)
  t = np.array([5, 17, 55, 99], np.int32)
  t_next = np.array([4, 12, 50, 90], np.int32)
  rng = jax.random.PRNGKey(0)
  # eta=0 → deterministic update; both sides must agree exactly.
  out_mine = my_gd.ddim_step(mine, _fake_eps_model, jnp.asarray(x), t, t_next,
                             rng, eta=0.0, clip_denoised=clip)
  out_ref = ref_gd.ddim_sample(ref, _fake_eps_model, jnp.asarray(x),
                               t[:, None], t_next[:, None], rng,
                               clip_denoised=clip, eta=0.0)
  np.testing.assert_allclose(out_mine["pred_xstart"], out_ref["pred_xstart"],
                             rtol=0, atol=2e-5)
  np.testing.assert_allclose(out_mine["sample"], out_ref["sample"],
                             rtol=0, atol=2e-5)


def test_ddim_sample_loop_matches(ref_gd, gd_pair):
  """Full sampling loop (ladder + scan + final t=0 step) at eta=0."""
  mine, ref = gd_pair
  rng = jax.random.PRNGKey(7)
  shape = (4, 8, 8, 3)
  out_mine = my_gd.ddim_sample_loop(mine, _fake_eps_model, rng, shape,
                                    sampling_steps=10, eta=0.0,
                                    clip_denoised=True)
  # The reference loop scans over gd tables; feed device arrays as its
  # trainer does (train_ae.py:183-185 reshards gd into the train_state).
  ref_dev = jax.tree.map(jnp.asarray, ref)
  out_ref, _ = ref_gd.ddim_sample_loop(ref_dev, _fake_eps_model, rng,
                                       jnp.zeros(shape), sampling_steps=10,
                                       eta=0.0, clip_denoised=True)
  np.testing.assert_allclose(out_mine["sample"], out_ref["sample"],
                             rtol=0, atol=1e-4)


# ---------------------------------------------------------------------------
# (c) pp ops vs the reference TF graph ops
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_pp():
  from big_vision.pp import ops_image as ref_ops_image  # registry side-effect
  from big_vision.pp import ops_general as ref_ops_general  # noqa: F401
  from big_vision.pp import builder as ref_builder
  return ref_builder


def _my_host_pp(spec):
  from small_vision_tpu.pp.builder import get_preprocess_fn
  host_fn, device_fn = get_preprocess_fn(spec)
  assert device_fn is None, f"{spec} unexpectedly has device ops"
  return host_fn


@pytest.mark.parametrize("spec,shape", [
    ("resize(24)", (37, 53, 3)),
    ("resize((16, 28))", (37, 53, 3)),
    ("resize_small(24)", (48, 64, 3)),
    ("resize_small(24)", (64, 48, 3)),
    ("central_crop(24)", (37, 53, 3)),
    ("resize_small(64)|central_crop(64)", (96, 128, 3)),
])
def test_host_pp_ops_exact(ref_pp, spec, shape):
  img = np.random.default_rng(0).integers(0, 256, shape, dtype=np.uint8)
  ref_fn = ref_pp.get_preprocess_fn(spec, log_data=False)
  ref_out = np.asarray(ref_fn({"image": img.copy()})["image"])
  my_out = np.asarray(_my_host_pp(spec)({"image": img.copy()})["image"])
  np.testing.assert_array_equal(my_out, ref_out, err_msg=spec)


def test_value_range_matches(ref_pp):
  img = np.random.default_rng(1).integers(0, 256, (8, 8, 3), dtype=np.uint8)
  ref_fn = ref_pp.get_preprocess_fn("value_range(-1, 1)", log_data=False)
  ref_out = np.asarray(ref_fn({"image": img.astype(np.float32)})["image"])
  from small_vision_tpu.pp.builder import get_preprocess_fn
  host_fn, device_fn = get_preprocess_fn("value_range(-1, 1)")
  batch = {"image": img[None].astype(np.float32)}
  my_out = np.asarray(
      jax.jit(device_fn)(host_fn(batch), jax.random.PRNGKey(0))["image"][0])
  np.testing.assert_allclose(my_out, ref_out, rtol=0, atol=1e-6)


def test_inception_crop_box_distribution_matches_tf():
  """KS-test the (h, w, y0, x0) marginals of our sampler against
  tf.image.sample_distorted_bounding_box (reference ops_image.py:222-235)."""
  import tensorflow as tf
  from scipy import stats
  from small_vision_tpu.pp.ops_image import _sample_inception_box

  H, W, N = 57, 83, 4000
  area_min = 20

  rng = np.random.default_rng(0)
  mine = np.array([_sample_inception_box(rng, H, W, area_min)
                   for _ in range(N)])  # (N, 4): y0, x0, h, w

  tf.random.set_seed(0)
  @tf.function
  def draw():
    begin, size, _ = tf.image.sample_distorted_bounding_box(
        tf.constant([H, W, 3]), tf.zeros([0, 0, 4], tf.float32),
        area_range=(area_min / 100, 1.0), min_object_covered=0,
        aspect_ratio_range=(0.75, 1.33),
        use_image_if_no_bounding_boxes=True)
    return begin, size
  theirs = []
  for _ in range(N):
    begin, size = draw()
    theirs.append([int(begin[0]), int(begin[1]), int(size[0]), int(size[1])])
  theirs = np.array(theirs)

  for i, name in enumerate(["y0", "x0", "h", "w"]):
    p = stats.ks_2samp(mine[:, [2, 3, 0, 1][i] if False else i],
                       theirs[:, i]).pvalue
    assert p > 1e-3, (f"{name} distribution diverges (KS p={p:.2e}); "
                      f"mine mean={mine[:, i].mean():.2f} "
                      f"tf mean={theirs[:, i].mean():.2f}")
  # Joint sanity: crop area distributions.
  p_area = stats.ks_2samp(mine[:, 2] * mine[:, 3],
                          theirs[:, 2] * theirs[:, 3]).pvalue
  assert p_area > 1e-3, f"area distribution diverges (KS p={p_area:.2e})"


# ---------------------------------------------------------------------------
# (d) same-weights model forward through the checkpoint converter
# ---------------------------------------------------------------------------

_TINY = dict(num_classes=10, img_size=16, patch_size=(4, 4), width=32,
             depth=2, dec_depth=1, num_heads=4, scan=True, adaln=True,
             dtype_mm="float32")


@pytest.fixture(scope="module")
def converted_pair():
  from big_vision.models import ae as ref_ae
  from small_vision_tpu.models import ae as my_ae
  from small_vision_tpu.utils import convert_ref

  ref_model = ref_ae.Model(**_TINY)
  my_model = my_ae.Model(**_TINY)
  rng = jax.random.PRNGKey(0)
  rngs = {"params": rng, "dropout": rng, "mae_noise": rng, "cfg": rng}
  x = jnp.zeros((2, 16, 16, 3))
  ref_params = ref_model.init(
      rngs, x, t=jnp.zeros((2, 1), jnp.int32), train=True, mask=0.375
  )["params"]
  my_params = convert_ref.ref_to_ours(ref_params, patch_size=4)
  return ref_model, my_model, ref_params, my_params


def test_converted_tree_structure_matches_init(converted_pair):
  _, my_model, _, my_params = converted_pair
  rng = jax.random.PRNGKey(1)
  rngs = {"params": rng, "dropout": rng, "mae_noise": rng, "cfg": rng}
  native = my_model.init(rngs, jnp.zeros((2, 16, 16, 3)),
                         t=jnp.zeros((2,), jnp.int32), train=True,
                         mask=0.375)["params"]
  native_shapes = jax.tree.map(lambda a: a.shape, native)
  conv_shapes = jax.tree.map(lambda a: a.shape, my_params)
  assert jax.tree_util.tree_structure(native_shapes) == (
      jax.tree_util.tree_structure(conv_shapes))
  assert native_shapes == conv_shapes


def test_forward_parity_with_converted_params(converted_pair):
  """Same weights + same inputs → same prediction (mask=0: deterministic)."""
  ref_model, my_model, ref_params, my_params = converted_pair
  x = _rand((3, 16, 16, 3), 11)
  t = np.array([1, 25, 49], np.int32)
  y = np.array([0, 3, 9], np.int32)

  ref_pred, ref_out = ref_model.apply(
      {"params": ref_params}, x, t=jnp.asarray(t)[:, None], y=jnp.asarray(y),
      train=False, mask=0.0)
  my_pred, my_out = my_model.apply(
      {"params": my_params}, x, t=jnp.asarray(t), y=jnp.asarray(y),
      train=False, mask=0.0)
  np.testing.assert_allclose(my_pred, ref_pred, rtol=0, atol=2e-5)
  np.testing.assert_allclose(my_out["pre_logits"], ref_out["pre_logits"],
                             rtol=0, atol=2e-5)


def test_forward_parity_unconditional_and_cfg(converted_pair):
  ref_model, my_model, ref_params, my_params = converted_pair
  x = _rand((2, 16, 16, 3), 12)
  t = np.array([10, 30], np.int32)
  # y=None → null-class conditioning on both sides.
  ref_pred, _ = ref_model.apply({"params": ref_params}, x,
                                t=jnp.asarray(t)[:, None], train=False)
  my_pred, _ = my_model.apply({"params": my_params}, x, t=jnp.asarray(t),
                              train=False)
  np.testing.assert_allclose(my_pred, ref_pred, rtol=0, atol=2e-5)
  # CFG double-batch extrapolation.
  y = np.array([1, 7], np.int32)
  ref_pred, _ = ref_model.apply(
      {"params": ref_params}, x, t=jnp.asarray(t)[:, None], y=jnp.asarray(y),
      cfg_scale=2.5, train=False)
  my_pred, _ = my_model.apply(
      {"params": my_params}, x, t=jnp.asarray(t), y=jnp.asarray(y),
      cfg_scale=2.5, train=False)
  np.testing.assert_allclose(my_pred, ref_pred, rtol=0, atol=5e-5)


def test_loss_formula_parity_on_same_preds(converted_pair, ref_gd):
  """The diffusion loss (eps+x0 MSE halves, no masking) computed by both
  stacks on the SAME externally drawn batch/t/noise matches ~1e-6."""
  ref_model, my_model, ref_params, my_params = converted_pair
  gd_ref = ref_gd.create_gaussian_diffusion("cosine", 50)
  gd_mine = my_gd.GaussianDiffusion.create("cosine", 50)
  x0 = _rand((4, 16, 16, 3), 13)
  noise = _rand((4, 16, 16, 3), 14)
  t = np.array([0, 9, 23, 49], np.int32)
  y = np.array([2, 4, 6, 8], np.int32)

  x_t_ref = ref_gd.q_sample(gd=gd_ref, x_start=x0, t=t[:, None], noise=noise)
  x_t_mine = my_gd.q_sample(gd_mine, x0, t, noise)
  np.testing.assert_allclose(x_t_mine, x_t_ref, rtol=0, atol=1e-6)

  def loss_of(pred):
    pred_x0, pred_eps = pred[..., :3], pred[..., 3:]
    return (jnp.mean((pred_eps - noise) ** 2)
            + jnp.mean((pred_x0 - x0) ** 2)) / 2

  ref_pred, _ = ref_model.apply(
      {"params": ref_params}, x_t_ref, t=jnp.asarray(t)[:, None] + 1,
      y=jnp.asarray(y), train=False, mask=0.0)
  my_pred, _ = my_model.apply(
      {"params": my_params}, x_t_mine, t=jnp.asarray(t) + 1,
      y=jnp.asarray(y), train=False, mask=0.0)
  np.testing.assert_allclose(float(loss_of(my_pred)),
                             float(loss_of(ref_pred)), rtol=1e-5)


def test_converter_roundtrip_exact(converted_pair):
  from small_vision_tpu.utils import convert_ref
  ref_model, _, ref_params, my_params = converted_pair
  back = convert_ref.ours_to_ref(my_params, patch_size=4)
  flat_a = jax.tree_util.tree_leaves_with_path(
      convert_ref._to_pure_dict(ref_params))
  flat_b = jax.tree_util.tree_leaves_with_path(back)
  assert len(flat_a) == len(flat_b)
  b = dict(("/".join(str(getattr(k, "key", k)) for k in p), v)
           for p, v in flat_b)
  for p, v in flat_a:
    name = "/".join(str(getattr(k, "key", k)) for k in p)
    np.testing.assert_array_equal(np.asarray(v), b[name], err_msg=name)


# ---------------------------------------------------------------------------
# (e) fewshot linear-probe solver vs the reference eigh solver
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n,d", [(120, 32), (24, 64)])  # N>=D and D>N paths
def test_fewshot_solver_matches_reference(n, d):
  import big_vision.evaluators.fewshot_lsr as ref_fs
  from small_vision_tpu.evaluators import fewshot_lsr as my_fs

  assert my_fs.BIAS_CONSTANT == ref_fs.BIAS_CONSTANT
  rng = np.random.default_rng(0)
  ncls = 5
  x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
  y = jnp.asarray(rng.integers(0, ncls, n), jnp.int32)
  xt = jnp.asarray(rng.normal(size=(40, d)), jnp.float32)
  yt = jnp.asarray(rng.integers(0, ncls, 40), jnp.int32)

  ref_cache = ref_fs._precompute_cache(x, y, ncls)
  my_cache = my_fs._precompute_cache(x, y, ncls)
  for k in ("mean", "std", "eigs"):
    np.testing.assert_allclose(np.asarray(my_cache[k]),
                               np.asarray(ref_cache[k]),
                               rtol=1e-4, atol=1e-4, err_msg=k)
  for l2 in (2.0 ** 6, 2.0 ** 10, 2.0 ** 14):
    a_ref = float(ref_fs._eig_fewshot_acc_fn(ref_cache, xt, yt, l2))
    a_my = float(my_fs._eig_fewshot_acc_fn(my_cache, xt, yt, l2))
    assert a_ref == pytest.approx(a_my, abs=1e-6), l2


# ---------------------------------------------------------------------------
# (f) LR schedules + duration resolution vs reference utils
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("decay,kw", [
    ("cosine", {}),
    ("linear", dict(linear_end=0.01)),
    ("rsqrt", dict(timescale=5000)),
    ("stair", dict(steps=[300, 600], mults=[0.5, 0.1])),
])
def test_lr_schedule_matches_reference(decay, kw):
  import big_vision.utils as ref_u
  from small_vision_tpu.utils import schedules as my_s

  common = dict(total_steps=1000, batch_size=512, data_size=50_000,
                base=3e-4, decay_type=decay, warmup_steps=100,
                cooldown_steps=50 if decay in ("cosine", "linear") else 0)
  ref_fn = ref_u.create_learning_rate_schedule(**common, **kw)
  my_fn = my_s.create_learning_rate_schedule(**common, **kw)
  steps = np.asarray([0, 1, 50, 99, 100, 101, 250, 500, 900, 949, 951, 999])
  ref_vals = np.asarray([float(ref_fn(s)) for s in steps])
  my_vals = np.asarray([float(my_fn(s)) for s in steps])
  np.testing.assert_allclose(my_vals, ref_vals, rtol=1e-6, atol=1e-9,
                             err_msg=f"{decay} {list(zip(steps, ref_vals, my_vals))}")


def test_steps_duration_resolution_matches_reference():
  import big_vision.utils as ref_u
  from small_vision_tpu.utils.schedules import steps as my_steps

  data_size, batch_size, total = 1_281_167, 1024, 10_000
  for cfg in (dict(warmup_steps=17), dict(warmup_epochs=3),
              dict(warmup_examples=200_000), dict(warmup_percent=0.05)):
    ref = ref_u.steps("warmup", cfg, data_size, batch_size, total, default=0)
    mine = my_steps("warmup", cfg, data_size, batch_size, total, default=0)
    assert ref == mine, (cfg, ref, mine)


# ---------------------------------------------------------------------------
# (g) the full optimizer chain (bv_optax.make) — update equality
# ---------------------------------------------------------------------------


def test_optimizer_chain_matches_reference():
  """Same config/params/grads → bitwise-equal updates through the whole
  masked adam+wd+clip+schedule chain (the ae_i1k training recipe)."""
  import ml_collections as mlc
  import big_vision.optax as ref_opt
  from small_vision_tpu import optim as my_opt

  def cfg():
    c = mlc.ConfigDict()
    c.lr = 15e-5
    c.wd = 0.05
    c.optax_name = "scale_by_adam"
    c.optax = dict(b2=0.95)
    c.grad_clip_norm = 1.0
    c.schedule = dict(decay_type="cosine", warmup_steps=5)
    return c

  rng = np.random.default_rng(0)
  params = {
      "Dense_0": {"kernel": jnp.asarray(rng.normal(size=(8, 16)), jnp.float32),
                  "bias": jnp.asarray(rng.normal(size=(16,)), jnp.float32)},
      "cls": jnp.asarray(rng.normal(size=(1, 4, 8)), jnp.float32),
  }
  grads = jax.tree.map(
      lambda x: jnp.asarray(rng.normal(size=x.shape), jnp.float32), params)
  sched_kw = dict(total_steps=100, batch_size=256, data_size=10_000)

  ref_tx, _ = ref_opt.make(cfg(), params, sched_kw=sched_kw)
  my_tx, _ = my_opt.make(cfg(), params, sched_kw=sched_kw)

  ref_state = ref_tx.init(params)
  my_state = my_tx.init(params)
  p_ref, p_my = params, params
  for _ in range(3):
    ref_up, ref_state = ref_tx.update(grads, ref_state, p_ref)
    my_up, my_state = my_tx.update(grads, my_state, p_my)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref_up),
        jax.tree_util.tree_leaves_with_path(my_up)):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                 rtol=1e-6, atol=1e-8,
                                 err_msg=jax.tree_util.keystr(kp))
    import optax as _optax
    p_ref = _optax.apply_updates(p_ref, ref_up)
    p_my = _optax.apply_updates(p_my, my_up)
  # Step counter recovery parity.
  assert int(ref_opt.get_count(ref_state)) == int(my_opt.get_count(my_state))


# ---------------------------------------------------------------------------
# (h) random masking — same PRNG key → bitwise-identical gather/scatter
# ---------------------------------------------------------------------------


def test_random_masking_matches_reference_bitwise():
  """Same key → identical permutation, kept tokens, mask, ids_restore, and
  image-mask upsampling (reference models/ae.py:9-36)."""
  import big_vision.models.ae as ref_ae
  from small_vision_tpu.ops import masking as my_m

  key = jax.random.PRNGKey(42)
  x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 16, 8)),
                  jnp.float32)
  ref_x, ref_mask, ref_ids = ref_ae.random_masking(x, 0.75, key)
  my_x, my_mask, my_ids = my_m.random_masking(x, 0.75, key)
  np.testing.assert_array_equal(np.asarray(my_ids), np.asarray(ref_ids))
  np.testing.assert_array_equal(np.asarray(my_x), np.asarray(ref_x))
  np.testing.assert_array_equal(np.asarray(my_mask), np.asarray(ref_mask))

  ref_img = ref_ae.sequence_mask_to_image_mask(ref_mask, 2, 8)
  my_img = my_m.sequence_mask_to_image_mask(my_mask, 2, 8)
  np.testing.assert_array_equal(np.asarray(my_img), np.asarray(ref_img))


# ---------------------------------------------------------------------------
# (i) 50-step TRAINING TRAJECTORY vs the reference update_fn
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_training_trajectory_matches_reference_50_steps(converted_pair,
                                                        ref_gd):
  """Integrated-system differential: 50 update steps of the repo's REAL
  `make_update_fn` (masking on, EMA on, full bv_optax-equivalent chain)
  against a faithful transcription of the reference update_fn
  (trainers/train_ae.py:287-382) driving the REFERENCE model + reference
  `q_sample` + reference `bv_optax.make` — same converted initial params,
  identical injected t/noise/mask/model-rng draws each step. Compares the
  per-step loss curve and the final params/EMA within f32-drift tolerance.
  """
  import ml_collections as mlc
  import optax
  import big_vision.optax as ref_opt
  from small_vision_tpu import optim as my_opt
  from small_vision_tpu import parallel
  from small_vision_tpu.train import train_ae

  ref_model, my_model, ref_params0, my_params0 = converted_pair
  N_STEPS, B, T = 50, 8, 50
  P_NO_NOISE, MASK_DIT, MASK_MAE, EMA = 0.5, 0.375, 0.75, 0.99
  n_no_noise = int(B * P_NO_NOISE)
  n_noise = B - n_no_noise

  # The reference trainer ships gd inside train_state as device arrays
  # (train_ae.py:295); numpy tables would fail tracer-indexing under jit.
  gd_ref = jax.tree.map(jnp.asarray,
                        ref_gd.create_gaussian_diffusion("cosine", T))
  gd_my = my_gd.GaussianDiffusion.create("cosine", T)

  def opt_cfg():
    c = mlc.ConfigDict()
    c.lr = 15e-5
    c.wd = 0.05
    c.optax_name = "scale_by_adam"
    c.optax = dict(b2=0.95)
    c.grad_clip_norm = 1.0
    c.schedule = dict(decay_type="cosine", warmup_steps=5)
    return c

  sched_kw = dict(total_steps=N_STEPS, batch_size=B, data_size=B * N_STEPS)
  tx_ref, _ = ref_opt.make(opt_cfg(), ref_params0, sched_kw=sched_kw)
  tx_my, _ = my_opt.make(opt_cfg(), my_params0, sched_kw=sched_kw)

  # ---- the repo's real update_fn, with draws injected via the batch ----
  mesh = parallel.make_mesh()
  cfg = dict(no_noise_prob=P_NO_NOISE, mask_ratio=MASK_DIT,
             mask_ratio_no_noise=MASK_MAE, use_labels=False,
             ema_decay=EMA, l2_metrics=False, _inject_draws=True,
             diffusion_space=(16, 16, 3))
  my_state = {"params": jax.tree.map(jnp.copy, my_params0),
              "opt": tx_my.init(my_params0),
              "rng": jax.random.PRNGKey(7),
              "gd": gd_my,
              "ema_params": jax.tree.map(jnp.copy, my_params0)}
  sharding = jax.tree.map(
      lambda _: parallel.replicated_sharding(mesh), my_state)
  my_update = train_ae.make_update_fn(
      my_model, tx_my, cfg, None, mesh, sharding)

  # ---- faithful transcription of the reference update_fn ----
  @jax.jit
  def ref_update(params, ema, opt, batch, draws):
    images = batch["image"]
    x_0_noise = images[:n_noise]
    x_0_no_noise = images[n_noise:]
    batched_t = draws["t"][:, None]              # reference uses (n, 1)
    noise = draws["noise"]
    x_t_noise = ref_gd.q_sample(gd=gd_ref, x_start=x_0_noise,
                                t=batched_t, noise=noise)

    def loss_fn(p):
      pred, out = ref_model.apply(
          {"params": p}, x_0_no_noise,
          t=jnp.zeros((n_no_noise, 1), jnp.int32),
          train=True, mask=MASK_MAE,
          rngs={"dropout": draws["rng_mae"], "cfg": draws["cfg_mae"],
                "mae_noise": draws["mae_mae"]})
      pred_x0 = pred[..., :3]
      x0_se = (pred_x0 - x_0_no_noise) ** 2
      mae_loss = jnp.mean(x0_se * out["mask"]) / jnp.mean(out["mask"])

      pred, out = ref_model.apply(
          {"params": p}, x_t_noise, t=batched_t + 1,
          train=True, mask=MASK_DIT,
          rngs={"dropout": draws["rng_dit"], "cfg": draws["cfg_dit"],
                "mae_noise": draws["mae_dit"]})
      pred_x0 = pred[..., :3]
      pred_eps = pred[..., 3:]
      x0_se = (pred_x0 - x_0_noise) ** 2
      eps_se = (pred_eps - noise) ** 2
      eps_loss = (jnp.mean(eps_se * (1 - out["mask"]))
                  / jnp.mean(1 - out["mask"]))
      x0_loss = jnp.mean(x0_se * out["mask"]) / jnp.mean(out["mask"])
      dit_loss = (eps_loss + x0_loss) / 2
      return (dit_loss * (1 - n_no_noise / B)
              + mae_loss * (n_no_noise / B))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt = tx_ref.update(grads, opt, params)
    params = optax.apply_updates(params, updates)
    ema = optax.incremental_update(params, ema, EMA)
    return params, ema, opt, loss

  ref_p = jax.tree.map(jnp.copy, ref_params0)
  ref_ema = jax.tree.map(jnp.copy, ref_params0)
  ref_o = tx_ref.init(ref_params0)

  data_rng = np.random.default_rng(123)
  base = jax.random.PRNGKey(999)
  losses_my, losses_ref = [], []
  for step in range(N_STEPS):
    images = jnp.asarray(
        data_rng.normal(size=(B, 16, 16, 3)) * 0.5, jnp.float32)
    k = jax.random.fold_in(base, step)
    kt, kn, k1, k2, k3, k4, k5, k6 = jax.random.split(k, 8)
    draws = {
        "t": jax.random.randint(kt, (n_noise,), 0, T, jnp.int32),
        "noise": jax.random.normal(kn, (n_noise, 16, 16, 3), jnp.float32),
        "rng_mae": k1, "cfg_mae": k2, "mae_mae": k3,
        "rng_dit": k4, "mae_dit": k5, "cfg_dit": k6,
    }
    batch = {"image": images,
             "_t": draws["t"], "_noise": draws["noise"],
             "_rng_mae": k1, "_cfg_mae": k2, "_mae_mae": k3,
             "_rng_dit": k4, "_mae_dit": k5, "_cfg_dit": k6}
    my_state, meas = my_update(my_state, batch)
    ref_p, ref_ema, ref_o, ref_loss = ref_update(
        ref_p, ref_ema, ref_o, {"image": images}, draws)
    losses_my.append(float(meas["training_loss"]))
    losses_ref.append(float(ref_loss))

  losses_my = np.asarray(losses_my)
  losses_ref = np.asarray(losses_ref)
  # Loss curves track step by step...
  np.testing.assert_allclose(losses_my, losses_ref, rtol=2e-3, atol=2e-4)
  # ...and both actually trained (curve moved).
  assert losses_ref[-5:].mean() < losses_ref[:5].mean()

  # Final params/EMA within f32 drift (per-apply parity is ~2e-5; adam
  # normalization amplifies, bounded by lr * steps).
  from small_vision_tpu.utils import convert_ref
  final_ref_as_my = convert_ref.ref_to_ours(ref_p, patch_size=4)
  final_ema_as_my = convert_ref.ref_to_ours(ref_ema, patch_size=4)
  for mine, ref, tag in ((my_state["params"], final_ref_as_my, "params"),
                         (my_state["ema_params"], final_ema_as_my, "ema")):
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(mine),
        jax.tree_util.tree_leaves_with_path(ref)):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=0, atol=2e-4,
          err_msg=f"{tag}:{jax.tree_util.keystr(kp)}")


# ---------------------------------------------------------------------------
# (j) JPEG decode pixels vs TF INTEGER_ACCURATE (the FID-parity hard part)
# ---------------------------------------------------------------------------


def _jpeg_corpus():
  """JPEGs at several quality factors / sizes / content types."""
  import io as iolib
  from PIL import Image
  rng = np.random.default_rng(7)
  corpus = []
  for q in (50, 75, 90, 95):
    for shape in ((64, 64), (97, 123)):  # odd dims exercise MCU edges
      noise = rng.integers(0, 256, shape + (3,), dtype=np.uint8)
      yy, xx = np.mgrid[:shape[0], :shape[1]]
      smooth = np.stack([(yy * 255 / shape[0]), (xx * 255 / shape[1]),
                         ((yy + xx) % 256)], -1).astype(np.uint8)
      for img in (noise, smooth):
        buf = iolib.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=q)
        corpus.append((f"q{q}_{shape[0]}x{shape[1]}", buf.getvalue()))
  return corpus


def test_jpeg_decode_pixels_match_tf_integer_accurate():
  """The reference decodes with tf.io.decode_jpeg(dct_method=
  "INTEGER_ACCURATE") (reference pp/ops_image.py:48-49) = libjpeg JDCT_ISLOW.
  Both our decode paths — the native C++ loader and the PIL fallback — must
  produce the same pixels within a 1-level tolerance (identical IDCT, but
  potentially different libjpeg builds), else FID features drift.

  Measured on this corpus (PARITY.md): native and PIL are BITWISE equal to
  TF across every quality/size/content combination.
  """
  import io as iolib
  import tensorflow as tf
  from PIL import Image
  from small_vision_tpu.data import native_jpeg

  have_native = native_jpeg.available()
  worst = {}
  for name, raw in _jpeg_corpus():
    want = tf.io.decode_jpeg(raw, channels=3,
                             dct_method="INTEGER_ACCURATE").numpy()
    got_pil = np.asarray(Image.open(iolib.BytesIO(raw)).convert("RGB"))
    d_pil = int(np.abs(got_pil.astype(int) - want.astype(int)).max())
    worst[f"pil:{name}"] = d_pil
    assert d_pil <= 1, (name, d_pil)
    if have_native:
      got_nat = native_jpeg.decode(raw)
      d_nat = int(np.abs(got_nat.astype(int) - want.astype(int)).max())
      worst[f"native:{name}"] = d_nat
      assert d_nat <= 1, (name, d_nat)
      np.testing.assert_array_equal(got_nat, got_pil, err_msg=name)
  assert max(worst.values()) <= 1, worst
