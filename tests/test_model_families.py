"""All four model families train (loss decreases) via their config recipes.

The reference's four headline configurations (README.md:37-40 / BASELINE.md):
UMD (defaults), MAE (mask .75, no_noise 1.0, no adaln), DiT (no mask, all
noise), MaskDiT (mask .5, all noise) — exercised through the same arg-string
recipes on tiny synthetic runs.
"""

import json

import numpy as np
import pytest

from small_vision_tpu.train import train_ae

from tests.test_train import smoke_config

pytestmark = pytest.mark.slow

FAMILIES = {
    "umd": dict(no_noise_prob=0.5, mask_ratio=0.375,
                mask_ratio_no_noise=0.75, adaln=True),
    "mae": dict(no_noise_prob=1.0, mask_ratio=0.0,
                mask_ratio_no_noise=0.75, adaln=False),
    "dit": dict(no_noise_prob=0.0, mask_ratio=0.0,
                mask_ratio_no_noise=0.75, adaln=True),
    "maskdit": dict(no_noise_prob=0.0, mask_ratio=0.5,
                    mask_ratio_no_noise=0.75, adaln=True),
}


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_family_trains_and_loss_decreases(family, tmp_path):
  spec = FAMILIES[family]
  config = smoke_config()
  config.no_noise_prob = spec["no_noise_prob"]
  config.mask_ratio = spec["mask_ratio"]
  config.mask_ratio_no_noise = spec["mask_ratio_no_noise"]
  config.model["adaln"] = spec["adaln"]
  config.total_steps = 20
  config.log_training_steps = 1
  config.peak_lr = 3e-3
  config.input["batch_size"] = 32

  train_ae.train_and_evaluate(config, str(tmp_path))
  rows = [json.loads(l) for l in
          (tmp_path / "sv_tpu_metrics.txt").read_text().splitlines()]
  losses = [r["training_loss"] for r in rows if "training_loss" in r]
  assert len(losses) == 20
  assert all(np.isfinite(l) for l in losses)
  first, last = np.mean(losses[:4]), np.mean(losses[-4:])
  assert last < first, (
      f"{family}: loss did not decrease ({first:.4f} -> {last:.4f})")
