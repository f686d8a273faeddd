"""MetricWriter sink fan-out + the arrays ingestion roundtrip."""

import io
import json
import os
import sys

import numpy as np
import pytest

from small_vision_tpu.utils.metrics import MetricWriter, make_sinks


class FakeSink:
  def __init__(self):
    self.rows = []
    self.closed = False

  def log(self, row):
    self.rows.append(dict(row))

  def close(self):
    self.closed = True


def test_metric_writer_fans_out_to_sinks(tmp_path):
  sink = FakeSink()
  mw = MetricWriter(str(tmp_path), None, sinks=[sink])
  mw.step_start(1)
  mw.measure("loss", 0.5)
  mw.step_end()
  mw.step_start(2)
  mw.measure("loss", np.float32(0.25))
  mw.measure("vec", np.array([1.0, 2.0]))
  mw.step_end()
  mw.close()

  assert sink.closed
  assert sink.rows == [{"step": 1, "loss": 0.5},
                       {"step": 2, "loss": 0.25, "vec": [1.0, 2.0]}]
  # The JSONL file carries the same rows.
  rows = [json.loads(l) for l in
          (tmp_path / "sv_tpu_metrics.txt").read_text().splitlines()]
  assert rows == sink.rows


def test_make_sinks_unconfigured_and_missing_dep():
  import ml_collections as mlc
  assert make_sinks(None) == []
  assert make_sinks(mlc.ConfigDict()) == []
  cfg = mlc.ConfigDict()
  cfg.wandb = dict(project="x")
  try:
    import wandb  # noqa: F401
    has_wandb = True
  except ImportError:
    has_wandb = False
  if not has_wandb:
    with pytest.raises(ImportError, match="wandb"):
      make_sinks(cfg)


def _write_jpeg_tree(root, classes=("cat", "dog"), per_class=3, hw=(37, 53)):
  from PIL import Image
  rng = np.random.default_rng(0)
  for c in classes:
    os.makedirs(os.path.join(root, c), exist_ok=True)
    for i in range(per_class):
      img = Image.fromarray(
          rng.integers(0, 256, (*hw, 3), dtype=np.uint8))
      img.save(os.path.join(root, c, f"{i}.jpg"))


def test_ingest_dir_tree_roundtrip(tmp_path):
  sys.path.insert(0, "/root/repo/scripts")
  from ingest_imagenet_arrays import ingest_paths, list_dir_tree

  src = tmp_path / "raw"
  out = tmp_path / "arrays"
  _write_jpeg_tree(str(src))
  paths, labels, names = list_dir_tree(str(src))
  assert len(paths) == 6 and names == ["cat", "dog"]
  ingest_paths(paths, labels, str(out), size=16, mode="center", workers=2,
               class_names=names)

  # The arrays source reads it back.
  from small_vision_tpu.data import arrays as arrays_src
  ds = arrays_src.DataSource(root=str(out))
  assert ds.total_examples == 6
  exs = list(ds.examples(ordered=True))
  assert exs[0]["image"].shape == (16, 16, 3)
  assert exs[0]["image"].dtype == np.uint8
  assert sorted(int(e["label"]) for e in exs) == [0, 0, 0, 1, 1, 1]
  assert exs[0]["image"].std() > 1.0  # real decoded content, not zeros
  meta = json.loads((out / "meta.json").read_text())
  assert meta["n"] == 6 and meta["size"] == 16
