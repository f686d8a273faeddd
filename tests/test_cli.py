"""End-to-end CLI test: the exact user entry point, tiny local run."""

import pytest
import json

from small_vision_tpu import cli

pytestmark = pytest.mark.slow


def test_cli_ae_end_to_end(tmp_path):
  cli.main([
      "--config", "ae_i1k.py:data=synthetic,runlocal=True,epochs=1,size=16",
      "--workdir", str(tmp_path),
      "--jax_cache", "",
  ])
  rows = [json.loads(l) for l in
          (tmp_path / "sv_tpu_metrics.txt").read_text().splitlines()]
  losses = [r["training_loss"] for r in rows if "training_loss" in r]
  assert losses, "no training metrics written"
  assert (tmp_path / "checkpoints").exists()
  assert (tmp_path / "config.json").exists()


def test_cli_cleanup(tmp_path):
  workdir = tmp_path / "run"
  cli.main([
      "--config", "ae_i1k.py:data=synthetic,runlocal=True,epochs=1,size=16",
      "--workdir", str(workdir),
      "--jax_cache", "",
      "--cleanup",
  ])
  assert not workdir.exists()

