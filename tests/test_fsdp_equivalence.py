"""FSDP (ZeRO-3) training must be numerically equivalent to replicated."""

import pytest
import json

import numpy as np

from small_vision_tpu.train import train_ae

from tests.test_train import smoke_config

pytestmark = pytest.mark.slow


def _losses(tmp_path, name, **overrides):
  config = smoke_config()
  config.total_steps = 4
  config.log_training_steps = 1
  config.update(overrides)
  workdir = tmp_path / name
  train_ae.train_and_evaluate(config, str(workdir))
  rows = [json.loads(l) for l in
          (workdir / "sv_tpu_metrics.txt").read_text().splitlines()]
  return [r["training_loss"] for r in rows if "training_loss" in r]


def test_fsdp_matches_replicated(tmp_path):
  base = _losses(tmp_path, "repl")
  fsdp = _losses(tmp_path, "fsdp",
                 param_sharding="fully_sharded",
                 optim_sharding="fully_sharded")
  assert len(base) == len(fsdp) == 4
  np.testing.assert_allclose(base, fsdp, rtol=2e-4, atol=1e-5)


def test_fsdp_2d_mesh_matches(tmp_path):
  base = _losses(tmp_path, "repl2")
  fsdp2d = _losses(tmp_path, "fsdp2d",
                   mesh_fsdp=4,
                   param_sharding="fully_sharded",
                   optim_sharding="fully_sharded")
  np.testing.assert_allclose(base, fsdp2d, rtol=2e-4, atol=1e-5)


def test_tensor_parallel_training_matches_replicated(tmp_path):
  """Full training over a 3-D (data=2, fsdp=2, tensor=2) virtual-pod mesh
  with width-sharded attention/MLP params: same losses as replicated."""
  base = _losses(tmp_path, "repl3")
  tp3d = _losses(tmp_path, "tp3d",
                 mesh_fsdp=2, mesh_tensor=2,
                 param_sharding="tensor_parallel",
                 optim_sharding="tensor_parallel")
  np.testing.assert_allclose(base, tp3d, rtol=2e-4, atol=1e-5)
