"""Tests for the arrays (memmap) and latents (TFRecord) data sources."""

import numpy as np
import pytest

from small_vision_tpu.data import arrays
from small_vision_tpu.data import core as ds_core


def test_arrays_source_roundtrip(tmp_path):
  rng = np.random.default_rng(0)
  imgs = rng.integers(0, 256, (32, 8, 8, 3), dtype=np.uint8)
  labels = np.arange(32, dtype=np.int64)
  arrays.write_arrays(str(tmp_path), imgs, labels)

  src = ds_core.get("arrays", root=str(tmp_path))
  assert src.total_examples == 32
  examples = list(src.examples(ordered=True))
  assert len(examples) == 32
  np.testing.assert_array_equal(examples[5]["image"], imgs[5])
  assert examples[5]["label"] == 5

  # Shuffling reorders but covers everything; different epochs differ.
  ids1 = [e["_id"] for e in src.examples(seed=1, epoch=0)]
  ids2 = [e["_id"] for e in src.examples(seed=1, epoch=1)]
  assert sorted(ids1) == sorted(ids2) == list(range(32))
  assert ids1 != ids2


def test_arrays_source_fractional_split(tmp_path):
  imgs = np.zeros((100, 4, 4, 3), np.uint8)
  arrays.write_arrays(str(tmp_path), imgs)
  src = ds_core.get("arrays", root=str(tmp_path), split_frac=(0.0, 0.99))
  assert src.total_examples == 99
  src2 = ds_core.get("arrays", root=str(tmp_path), split_frac=(0.99, 1.0))
  assert src2.total_examples == 1


def test_arrays_split_parsing():
  base, bounds = arrays.parse_split("train")
  assert base == "train" and bounds(100) == (0, 100)
  assert arrays.parse_split("train[:10]")[1](100) == (0, 10)
  assert arrays.parse_split("train[90:]")[1](100) == (90, 100)
  assert arrays.parse_split("train[5:7]")[1](100) == (5, 7)
  assert arrays.parse_split("validation[:10%]")[1](200) == (0, 20)
  assert arrays.parse_split("train[50%:75%]")[1](200) == (100, 150)
  assert arrays.parse_split("train[-10:]")[1](100) == (90, 100)
  # Out-of-range absolutes clamp (fewshot asks train[:100000] of any size).
  assert arrays.parse_split("train[:100000]")[1](64) == (0, 64)
  with pytest.raises(ValueError):
    arrays.parse_split("train[1:2:3]")
  with pytest.raises(ValueError):
    arrays.parse_split("tr ain")


def test_arrays_multi_split_parent(tmp_path):
  """`arrays:<parent>` with train/ + validation/ subdirs serves the config's
  train loop AND its default evaluators (the quality-parity wiring)."""
  tr = np.full((20, 4, 4, 3), 7, np.uint8)
  va = np.full((5, 4, 4, 3), 9, np.uint8)
  arrays.write_arrays(str(tmp_path / "train"), tr, np.zeros(20, np.int64))
  arrays.write_arrays(str(tmp_path / "validation"), va,
                      np.ones(5, np.int64))

  # Name-string dispatch, as evaluator data dicts / fewshot specs carry it.
  src = ds_core.get(f"arrays:{tmp_path}", split="train")
  assert src.total_examples == 20 and src.peek()["image"][0, 0, 0] == 7
  val = ds_core.get(f"arrays:{tmp_path}", split="validation")
  assert val.total_examples == 5 and val.peek()["image"][0, 0, 0] == 9
  sub = ds_core.get(f"arrays:{tmp_path}", split="train[:25%]")
  assert sub.total_examples == 5

  # A per-split dir answers to its own name and to the "train" default...
  own = ds_core.get(f"arrays:{tmp_path}/validation", split="validation")
  assert own.total_examples == 5
  assert ds_core.get("arrays", root=str(tmp_path / "train")).total_examples \
      == 20
  # ...but NOT to another split (train/eval leak protection).
  with pytest.raises(ValueError, match="single split"):
    ds_core.get(f"arrays:{tmp_path}/train", split="validation")
  with pytest.raises(FileNotFoundError, match="No arrays data"):
    ds_core.get(f"arrays:{tmp_path}/nope", split="train")


def test_latents_tfrecord_roundtrip(tmp_path):
  tf = pytest.importorskip("tensorflow")
  from small_vision_tpu.data import latents as lat

  # Write a few records in the reference format (flat float latent + label).
  path = tmp_path / "lat-00000.tfrecord"
  rng = np.random.default_rng(1)
  zs = rng.normal(size=(6, 32, 32, 4)).astype(np.float32)
  with tf.io.TFRecordWriter(str(path)) as w:
    for i, z in enumerate(zs):
      feature = {
          "image": tf.train.Feature(float_list=tf.train.FloatList(
              value=z.ravel())),
          "label": tf.train.Feature(int64_list=tf.train.Int64List(
              value=[i])),
      }
      w.write(tf.train.Example(
          features=tf.train.Features(feature=feature)).SerializeToString())

  src = ds_core.get("latents", pattern=str(tmp_path / "*.tfrecord"))
  assert src.total_examples == 6
  examples = list(src.examples(ordered=True))
  assert examples[0]["image"].shape == (32, 32, 4)
  np.testing.assert_allclose(examples[2]["image"], zs[2], rtol=1e-6)
  assert examples[2]["label"] == 2
