"""Linear-probe trainer smoke test incl. frozen-backbone checkpoint load."""

import pytest
import jax
import ml_collections as mlc
import numpy as np

from small_vision_tpu.train import linear_ae, train_ae

from tests.test_train import smoke_config

pytestmark = pytest.mark.slow


def lp_config():
  c = mlc.ConfigDict()
  c.seed = 0
  c.diffusion_space = (16, 16, 3)
  c.num_classes = 10
  c.width = 32
  c.total_steps = 4
  c.log_training_steps = 2
  c.peak_lr = 0.1
  c.wd = 0.0
  c.use_noised_pred = False
  c.pretrain_workdir = None
  c.diff_schedule = dict(beta_schedule="cosine", timesteps=50)
  c.input = dict(
      data=dict(name="synthetic", img_size=16, num_examples=128,
                num_classes=10),
      batch_size=16, num_workers=1,
      pp=('flip_lr|value_range(-1, 1)'
          '|onehot(10, key="label", key_result="labels")'
          '|keep("image", "labels")'))
  c.model_name = "ae"
  c.model = dict(width=32, depth=1, dec_depth=1, num_heads=4, img_size=16,
                 patch_size=(4, 4), scan=False, adaln=True,
                 dtype_mm="float32")
  c.evals = {"val": dict(
      type="classification", pred="predict",
      data=dict(name="synthetic", img_size=16, num_examples=32,
                num_classes=10),
      pp_fn='value_range(-1, 1)|keep("image", "label")',
      log_steps=4)}
  return c


def test_linear_probe_random_backbone(tmp_path):
  state, _ = linear_ae.train_and_evaluate(lp_config(), str(tmp_path))
  text = (tmp_path / "sv_tpu_metrics.txt").read_text()
  assert "training_loss" in text and "val/prec@1" in text
  assert "bn" in state["params"] or "Dense_0" in state["params"]


def test_linear_probe_from_pretrain_checkpoint(tmp_path):
  # 1) Pretrain briefly with checkpointing on.
  pre = smoke_config()
  pre.save_ckpt = True
  pre.ckpt_steps = 3
  pre_dir = tmp_path / "pretrain"
  state, _ = train_ae.train_and_evaluate(pre, str(pre_dir))

  # 2) Probe on the frozen checkpointed backbone.
  c = lp_config()
  c.pretrain_workdir = str(pre_dir)
  lp_dir = tmp_path / "probe"
  lp_state, _ = linear_ae.train_and_evaluate(c, str(lp_dir))

  # Backbone must equal the pretrained params, not a fresh init.
  a = jax.tree.leaves(state["params"])[0]
  b = jax.tree.leaves(lp_state["model_params"])[0]
  np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_linear_probe_checkpoint_resume(tmp_path):
  """Reference linear_ae.py:62-65,167-188: the probe saves and resumes its
  own head state; a restarted run continues instead of retraining."""
  import json

  c = lp_config()
  c.total_steps = 3
  c.ckpt_steps = 3
  c.log_training_steps = 1
  c.evals = {}
  state1, _ = linear_ae.train_and_evaluate(c, str(tmp_path))

  # Restart with a longer horizon in the same workdir: must resume at 3.
  c2 = lp_config()
  c2.total_steps = 6
  c2.ckpt_steps = 3
  c2.log_training_steps = 1
  c2.evals = {}
  state2, _ = linear_ae.train_and_evaluate(c2, str(tmp_path))

  rows = [json.loads(l) for l in
          (tmp_path / "sv_tpu_metrics.txt").read_text().splitlines()]
  steps_logged = [r["step"] for r in rows if "training_loss" in r]
  # First run logs 1-3; the resumed run logs ONLY 4-6 (no retraining of 1-3).
  assert steps_logged == [1, 2, 3, 4, 5, 6], steps_logged
  # The resumed head params start from the checkpoint, not a fresh init.
  k1 = np.asarray(jax.tree_util.tree_leaves(state1["params"])[0])
  k2 = np.asarray(jax.tree_util.tree_leaves(state2["params"])[0])
  assert k1.shape == k2.shape and not np.allclose(k1, 0)
