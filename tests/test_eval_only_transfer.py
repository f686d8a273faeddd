"""Eval-only transfer-suite dry-run (VERDICT r4 task 8): the full
10-dataset transfer linear-probe path of the eval config, end to end
through `tools/eval_only.py`, against `arrays:` stand-in data.

This is the r3 arrays-wiring bug class — config-level breakage that only
bites on a data-equipped machine — caught at test time: every transfer-eval
dict must BUILD (config parse, dataset resolution, pp compile) and RUN
(repr extraction, eigh probe, metric emission) for all ten datasets.

Parity target: /root/reference/big_vision/configs/eval_ae_i1k.py:108-123
(the transfer suite) + tools/eval_only.py (standalone evaluation).
"""

import json
import os

import numpy as np
import pytest

from small_vision_tpu.configs.eval_ae_i1k import TRANSFER_DATASETS
from small_vision_tpu.data.arrays import write_arrays

# Distinct class counts per dataset so a hard-coded 1000-way (or any
# cross-dataset cache collision) shows up as a shape/accuracy failure.
_NUM_CLASSES = {name: 4 + i for i, name in enumerate(TRANSFER_DATASETS)}


@pytest.fixture(scope="module")
def transfer_root(tmp_path_factory):
  root = tmp_path_factory.mktemp("transfer_arrays")
  rng = np.random.default_rng(0)
  for name in TRANSFER_DATASETS:
    nc = _NUM_CLASSES[name]

    def mk(n_per):
      labels = np.repeat(np.arange(nc), n_per)
      imgs = (rng.integers(0, 40, (nc * n_per, 16, 16, 3))
              + labels[:, None, None, None] * (200 // nc)
              ).clip(0, 255).astype(np.uint8)
      return imgs, labels.astype(np.int64)

    for split, n_per in (("train", 6), ("validation", 3)):
      imgs, labels = mk(n_per)
      write_arrays(str(root / name / split), imgs, labels)
  return str(root)


@pytest.mark.slow
def test_eval_only_runs_full_transfer_suite(transfer_root, tmp_path):
  from small_vision_tpu.tools import eval_only

  workdir = str(tmp_path / "run")
  config = (f"eval_ae_i1k.py:runlocal=True,transfer=True,"
            f"transfer_root={transfer_root},size=16,use_labels=False,"
            f"data=arrays:{transfer_root}/imagenet")
  eval_only.main(["--config", config, "--workdir", workdir])

  metrics_path = os.path.join(workdir, "sv_tpu_metrics.txt")
  assert os.path.exists(metrics_path), "eval_only wrote no metrics"
  rows = [json.loads(l) for l in open(metrics_path) if l.strip()]
  merged = {}
  for r in rows:
    merged.update(r)

  missing = []
  for name in TRANSFER_DATASETS:
    keys = [k for k in merged
            if k.endswith(f"{name}_2shot-seed-0") and "transfer" in k]
    if not keys:
      missing.append(name)
      continue
    acc = merged[keys[0]]
    assert np.isfinite(acc) and 0.0 <= acc <= 1.0, (name, acc)
    # Class-separable stand-ins: even a random-init tiny model's probe
    # beats chance on pixel-mean-separated classes.
    assert acc >= 1.0 / _NUM_CLASSES[name], (name, acc)
  assert not missing, f"transfer datasets with no metric: {missing}"


def test_transfer_root_rewires_all_datasets():
  """Fast config-level check: transfer_root rewrites every dataset spec to
  the arrays source while leaving the TFDS specs untouched without it."""
  from small_vision_tpu.cli import parse_config

  config = parse_config(
      "eval_ae_i1k.py:transfer=True,transfer_root=/data/t,size=16")
  ds = config.evals["transfer"]["datasets"]
  assert set(ds) == set(TRANSFER_DATASETS)
  for name, spec in ds.items():
    assert spec[0] == f"arrays:/data/t/{name}", spec
    assert spec[2:] == ("train", "validation"), spec

  config = parse_config("eval_ae_i1k.py:transfer=True,size=16")
  assert dict(config.evals["transfer"]["datasets"]) == TRANSFER_DATASETS
