"""Finetune surgery: pretrain ckpt → conditional finetune with fresh head."""

import pytest
import jax
import numpy as np

from small_vision_tpu.train import train_ae

from tests.test_train import smoke_config

pytestmark = pytest.mark.slow


def test_finetune_surgery(tmp_path):
  # 1) Unconditional pretrain with checkpointing.
  pre = smoke_config()
  pre.save_ckpt = True
  pre.ckpt_steps = 3
  pre_state, _ = train_ae.train_and_evaluate(pre, str(tmp_path))

  # 2) Class-conditional finetune from the same workdir.
  ft = smoke_config()
  ft.save_ckpt = True
  ft.ckpt_steps = 3
  ft.finetune = True
  ft.use_labels = True
  ft.num_classes = 10
  ft.ema_decay = 0.01
  ft.model["num_classes"] = 10
  ft.total_steps = 3
  ft_state, _ = train_ae.train_and_evaluate(ft, str(tmp_path))

  assert "label_embed" in ft_state["params"]
  assert "ema_params" in ft_state

  # Backbone started from pretrain: after 3 small steps the encoder kernel
  # should be close to (but not exactly) the pretrain value, and far from
  # a fresh random init's scale relationship. Check proximity.
  a = np.asarray(jax.device_get(
      pre_state["params"]["embedding"]["kernel"]))
  b = np.asarray(jax.device_get(
      ft_state["params"]["embedding"]["kernel"]))
  rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
  assert rel < 0.2, f"backbone drifted too far: {rel}"

  # 3) Restarting the finetune resumes from the finetune subdir.
  ft2_state, _ = train_ae.train_and_evaluate(ft, str(tmp_path))
  from small_vision_tpu import optim
  assert optim.get_count(ft2_state["opt"]) == 3
