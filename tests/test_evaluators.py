"""Evaluator framework tests on synthetic data + a tiny model."""

import jax
import jax.numpy as jnp
import ml_collections as mlc
import numpy as np
import pytest

from small_vision_tpu import parallel
from small_vision_tpu.evaluators import common as eval_common
from small_vision_tpu.ops import diffusion as gd_lib
from small_vision_tpu.train import train_ae

from tests.test_train import smoke_config


@pytest.fixture(scope="module")
def setup():
  config = smoke_config()
  mesh = parallel.make_mesh()
  model = train_ae.build_model(config)
  rng = jax.random.PRNGKey(0)
  x = jnp.zeros((2, 16, 16, 3))
  rngs = {"params": rng, "dropout": rng, "mae_noise": rng, "cfg": rng}
  params = model.init(rngs, x, t=jnp.zeros((2,), jnp.int32), train=True,
                      mask=0.5)["params"]
  gd = gd_lib.GaussianDiffusion.create("cosine", 50)
  train_state = {"params": params, "gd": gd, "rng": rng}
  eval_fns = train_ae.make_eval_fns(model, config)
  return config, mesh, train_state, eval_fns


EVAL_DATA = dict(name="synthetic", img_size=16, num_examples=40,
                 num_classes=10)
EVAL_PP = 'value_range(-1, 1)|keep("image", "label")'


def _run_eval(setup, evals):
  config, mesh, train_state, eval_fns = setup
  cfg = mlc.ConfigDict()
  cfg.evals = evals
  cfg.batch_size = 8
  evaluators = eval_common.from_config(cfg, eval_fns, mesh)
  results = {}
  for name, ev, log_steps, prefix in evaluators:
    for k, v in ev.run(train_state):
      results[f"{prefix}{k}"] = v
  return results


def test_diffusion_loss_evaluator(setup):
  res = _run_eval(setup, {"val": dict(
      type="diffusion_loss", pred="loss", data=EVAL_DATA, pp_fn=EVAL_PP,
      log_steps=100)})
  assert np.isfinite(res["val/loss"])
  assert res["val/image_x_t"].shape[1:] == (16, 16, 3)


def test_mae_reconstruction_evaluator(setup):
  res = _run_eval(setup, {"mae_val": dict(
      type="mae_reconstruction", pred="patch", data=EVAL_DATA,
      pp_fn=EVAL_PP, log_steps=100)})
  assert np.isfinite(res["mae_val/masked_mse"])
  assert res["mae_val/image_reconstruction"].shape[1:] == (16, 16, 3)


def test_sampling_evaluator(setup):
  res = _run_eval(setup, {"sample": dict(
      type="diffusion_sampling", pred="uncond_eps", total_samples=16,
      log_steps=100)})
  pack = res["sample/fid_samples"]
  assert pack["samples"].shape == (16, 16, 16, 3)
  assert pack["samples"].dtype == np.uint8
  assert pack["ys"] is None


def test_fewshot_evaluator(setup):
  res = _run_eval(setup, {"fewshot": dict(
      type="fewshot_lsr", pred="predict",
      representation_layer="pre_logits",
      datasets={"synth": (EVAL_DATA, EVAL_DATA, "train", "val")},
      shots=(2,), l2_reg=1024.0, num_seeds=1,
      display_first=[("synth", 2)],
      pp_train=EVAL_PP, pp_eval=EVAL_PP, num_classes=10,
      log_steps=100)})
  acc = res["fewshot/a/synth_2shot-seed-0"]
  assert 0.0 <= acc <= 1.0


def test_fewshot_solver_separable_data():
  """The closed-form probe must nail linearly separable features."""
  from small_vision_tpu.evaluators.fewshot_lsr import (
      _eig_fewshot_acc_fn, _precompute_cache)
  rng = np.random.default_rng(0)
  n, d, c = 200, 16, 4
  y = rng.integers(0, c, n)
  centers = rng.normal(size=(c, d)) * 5
  x = centers[y] + 0.1 * rng.normal(size=(n, d))
  cache = _precompute_cache(jnp.asarray(x[:150]), jnp.asarray(y[:150]), c)
  acc = _eig_fewshot_acc_fn(cache, jnp.asarray(x[150:]),
                            jnp.asarray(y[150:]), 1.0)
  assert float(acc) > 0.95


@pytest.mark.slow
def test_trainer_with_evaluator_integration(tmp_path):
  config = smoke_config()
  config.evals = {"val": dict(
      type="diffusion_loss", pred="loss", data=EVAL_DATA, pp_fn=EVAL_PP,
      log_steps=3)}
  state, _ = train_ae.train_and_evaluate(config, str(tmp_path))
  text = (tmp_path / "sv_tpu_metrics.txt").read_text()
  assert "val/loss" in text
