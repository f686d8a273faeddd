"""Coverage for the mean/save evaluators and force_eval mode."""

import jax
import jax.numpy as jnp
import ml_collections as mlc
import numpy as np

from small_vision_tpu import parallel
from small_vision_tpu.evaluators import common as eval_common
from small_vision_tpu.train import train_ae

from tests.test_train import smoke_config
from tests.test_evaluators import EVAL_DATA, EVAL_PP


def test_mean_evaluator():
  mesh = parallel.make_mesh()

  def metrics_fn(train_state, batch):
    img = batch["image"]
    return {"brightness": jnp.mean(img, axis=(1, 2, 3)),
            "ones": jnp.ones(img.shape[0])}

  cfg = mlc.ConfigDict()
  cfg.evals = {"stats": dict(type="mean", pred="metrics", data=EVAL_DATA,
                             pp_fn=EVAL_PP, log_steps=10)}
  cfg.batch_size = 8
  evs = eval_common.from_config(cfg, {"metrics": metrics_fn}, mesh)
  results = dict()
  for name, ev, _, prefix in evs:
    for k, v in ev.run({"dummy": 0}):
      results[f"{prefix}{k}"] = v
  assert results["stats/ones"] == 1.0
  assert -1.0 <= results["stats/brightness"] <= 1.0


def test_save_evaluator(tmp_path):
  mesh = parallel.make_mesh()

  def predict_fn(train_state, batch):
    return batch["image"] * 2.0, {}

  cfg = mlc.ConfigDict()
  cfg.evals = {"dump": dict(type="save", pred="predict", data=EVAL_DATA,
                            pp_fn=EVAL_PP, workdir=str(tmp_path),
                            outfile="dump.npz", log_steps=10)}
  cfg.batch_size = 8
  evs = eval_common.from_config(cfg, {"predict": predict_fn}, mesh)
  for name, ev, _, prefix in evs:
    out = dict(ev.run({"dummy": 0}))
  assert out["saved_examples"] == 40
  data = np.load(tmp_path / "dump.npz")
  assert data["inputs"].shape[0] == 40
  np.testing.assert_allclose(data["outputs"], data["inputs"] * 2.0,
                             rtol=1e-5)


def test_force_eval_skips_training(tmp_path):
  config = smoke_config()
  config.force_eval = True
  config.evals = {"val": dict(
      type="diffusion_loss", pred="loss", data=EVAL_DATA, pp_fn=EVAL_PP,
      log_steps=3)}
  state, _ = train_ae.train_and_evaluate(config, str(tmp_path))
  from small_vision_tpu import optim
  assert optim.get_count(state["opt"]) == 0  # no training steps ran
  text = (tmp_path / "sv_tpu_metrics.txt").read_text()
  assert "val/loss" in text and "training_loss" not in text
