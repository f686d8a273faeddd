"""Class-conditional + CFG sampling paths (the finetune eval surface)."""

import jax
import jax.numpy as jnp
import ml_collections as mlc
import numpy as np
import pytest

from small_vision_tpu.ops import diffusion as gd_lib
from small_vision_tpu.train import train_ae

from tests.test_train import smoke_config


@pytest.fixture(scope="module")
def cond_setup():
  config = smoke_config()
  config.use_labels = True
  config.num_classes = 10
  config.num_samples_per_call = 12
  config.num_samples = 4
  config.model["num_classes"] = 10
  model = train_ae.build_model(config)
  rng = jax.random.PRNGKey(0)
  x = jnp.zeros((2, 16, 16, 3))
  rngs = {"params": rng, "dropout": rng, "mae_noise": rng, "cfg": rng}
  params = model.init(rngs, x, t=jnp.zeros((2,), jnp.int32), train=True,
                      mask=0.5)["params"]
  gd = gd_lib.GaussianDiffusion.create("cosine", 50)
  state = {"params": params, "ema_params": params, "gd": gd, "rng": rng}
  return config, train_ae.make_eval_fns(model, config), state


def test_cond_sample_covers_all_classes(cond_setup):
  config, eval_fns, state = cond_setup
  out = jax.jit(eval_fns["cond_eps"])(state, jax.random.PRNGKey(1))
  samples = np.asarray(out["fid_samples"])
  ys = np.asarray(out["ys"])
  assert samples.shape == (12, 16, 16, 3) and samples.dtype == np.uint8
  # First num_classes labels enumerate every class (reference :491-495).
  np.testing.assert_array_equal(ys[:10], np.arange(10))
  assert ((ys[10:] >= 0) & (ys[10:] < 10)).all()


@pytest.mark.parametrize("pred", ["cfg_eps_2.0", "cfg_x0_2.0"])
def test_cfg_sampling_paths(cond_setup, pred):
  config, eval_fns, state = cond_setup
  out = jax.jit(eval_fns[pred])(state, jax.random.PRNGKey(2))
  samples = np.asarray(out["fid_samples"])
  assert samples.shape == (12, 16, 16, 3)
  assert np.isfinite(samples.astype(np.float32)).all()


def test_uncond_vs_cond_distinct(cond_setup):
  """With AdaLN-zero init conditioning is a no-op BY DESIGN; perturb the
  final modulation so the label pathway is live, then cond ≠ uncond."""
  config, eval_fns, state = cond_setup
  params = jax.tree.map(lambda x: x, state["params"])
  params["final_modulation"]["kernel"] = 0.5 * jax.random.normal(
      jax.random.PRNGKey(9), params["final_modulation"]["kernel"].shape)
  state = {**state, "params": params, "ema_params": params}
  a = np.asarray(jax.jit(eval_fns["uncond_eps"])(
      state, jax.random.PRNGKey(3))["fid_samples"])
  b = np.asarray(jax.jit(eval_fns["cond_eps"])(
      state, jax.random.PRNGKey(3))["fid_samples"])
  assert not np.array_equal(a, b)
