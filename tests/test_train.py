"""End-to-end trainer smoke tests on the 8-device CPU mesh."""

import jax
import ml_collections as mlc
import numpy as np
import pytest

from small_vision_tpu.train import train_ae

pytestmark = pytest.mark.slow


def smoke_config(tmpdir=None, **overrides):
  """A tiny UMD config: synthetic data, Ti-scale model, a handful of steps."""
  c = mlc.ConfigDict()
  c.seed = 0
  c.diffusion_space = (16, 16, 3)
  c.num_classes = None
  c.use_labels = False
  c.no_noise_prob = 0.5
  c.mask_ratio = 0.375
  c.mask_ratio_no_noise = 0.75
  c.total_steps = 6
  c.log_training_steps = 2
  c.warmup_steps = 2
  c.peak_lr = 1e-4
  c.wd = 0.05
  c.clip_norm = 1.0
  c.num_samples_per_call = 8
  c.num_samples = 4
  c.diff_schedule = dict(eta=1.0, beta_schedule="cosine",
                         clip_denoised=True, timesteps=50,
                         sampling_timesteps=5)
  c.input = dict(
      data=dict(name="synthetic", img_size=16, num_examples=256,
                num_classes=10),
      batch_size=16,
      num_workers=1,
      prefetch_to_device=1,
      pp='flip_lr|value_range(-1, 1)|keep("image", "label")')
  c.model_name = "ae"
  c.model = dict(width=32, depth=1, dec_depth=1, num_heads=4,
                 img_size=16, patch_size=(4, 4), scan=False, adaln=True,
                 dtype_mm="float32")
  c.save_ckpt = False
  c.update(overrides)
  return c


def test_train_fused_branches_smoke(tmp_path):
  """dual_forward trainer path (fused_branches=True) trains with finite
  losses in the same range as the two-apply path (at this tiny scale the
  loss hovers ~0.5 either way; a decrease assertion would be flaky)."""
  import json
  config = smoke_config()
  config.fused_branches = True
  state, _ = train_ae.train_and_evaluate(config, str(tmp_path))
  rows = [json.loads(line)
          for line in open(tmp_path / "sv_tpu_metrics.txt")]
  losses = [r["training_loss"] for r in rows if "training_loss" in r]
  assert losses and all(np.isfinite(losses))
  assert all(0.05 < x < 5.0 for x in losses)


def test_train_smoke_loss_finite(tmp_path):
  config = smoke_config()
  state, eval_fns = train_ae.train_and_evaluate(config, str(tmp_path))
  # Metrics JSONL was written with finite losses.
  metrics = (tmp_path / "sv_tpu_metrics.txt").read_text().splitlines()
  assert metrics
  import json
  rows = [json.loads(m) for m in metrics]
  losses = [r["training_loss"] for r in rows if "training_loss" in r]
  assert losses and all(np.isfinite(l) for l in losses)
  assert "params" in state and "opt" in state


def test_train_ema_and_labels(tmp_path):
  config = smoke_config()
  config.use_labels = True
  config.num_classes = 10
  config.ema_decay = 0.01
  config.model["num_classes"] = 10
  state, eval_fns = train_ae.train_and_evaluate(config, str(tmp_path))
  assert "ema_params" in state
  # EMA drifted from init but stays close to params.
  import jax
  d = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a - b)).max()),
                   state["params"], state["ema_params"])
  assert max(jax.tree.leaves(d)) > 0


def test_train_fsdp_sharding(tmp_path):
  config = smoke_config()
  config.param_sharding = "fully_sharded"
  config.optim_sharding = "fully_sharded"
  # Make one tensor big enough to shard (threshold 2^18 elements).
  config.model["width"] = 64
  state, _ = train_ae.train_and_evaluate(config, str(tmp_path))
  assert np.isfinite(
      float(np.asarray(jax.tree.leaves(state["params"])[0]).sum()))


def test_checkpoint_save_resume(tmp_path):
  config = smoke_config()
  config.save_ckpt = True
  config.ckpt_steps = 3
  state1, _ = train_ae.train_and_evaluate(config, str(tmp_path))
  # Resume: same workdir continues from the saved step (6 = total → restored
  # state starts at 6, loop runs 0 extra steps).
  state2, _ = train_ae.train_and_evaluate(config, str(tmp_path))
  from small_vision_tpu import optim
  assert optim.get_count(state2["opt"]) == 6


def test_checkpoint_pressure_every_step(tmp_path):
  """Async orbax checkpointing under pressure: save EVERY step while
  training continues; all commits must be complete (atomic) and resume must
  pick up the latest step."""
  import os
  config = smoke_config()
  config.save_ckpt = True
  config.ckpt_steps = 1
  config.total_steps = 6
  train_ae.train_and_evaluate(config, str(tmp_path))

  ckpt_dir = tmp_path / "checkpoints"
  steps = sorted(int(d) for d in os.listdir(ckpt_dir) if d.isdigit())
  assert steps and steps[-1] >= 5, steps
  # orbax atomicity: no leftover tmp dirs after wait_until_finished.
  assert not [d for d in os.listdir(ckpt_dir) if "tmp" in d.lower()], (
      os.listdir(ckpt_dir))

  # Resume from the latest: the loop has nothing left to run but must
  # restore cleanly and return a state with finite params.
  state, _ = train_ae.train_and_evaluate(config, str(tmp_path))
  leaf = np.asarray(jax.tree.leaves(state["params"])[0])
  assert np.isfinite(leaf).all()
