"""pp registry/builder/op tests.

Mirrors the reference's dual-mode idiom (pp/ops_image_test.py:33-41): each op
runs standalone AND inside the full pipeline composition — "you'd be
surprised how much these two differ!"
"""

import io

import jax
import numpy as np
import pytest
from PIL import Image

from small_vision_tpu.pp import builder, registry
from small_vision_tpu.pp.registry import Registry, parse_name, temporary_ops

import small_vision_tpu.pp.ops_general  # noqa: F401
import small_vision_tpu.pp.ops_image  # noqa: F401


def _jpeg_bytes(h=300, w=200):
  rng = np.random.default_rng(0)
  img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
  buf = io.BytesIO()
  Image.fromarray(img).save(buf, format="JPEG")
  return buf.getvalue()


def _example(img=None):
  if img is None:
    img = np.random.default_rng(1).integers(
        0, 256, (128, 96, 3), dtype=np.uint8)
  return {"image": img, "label": np.int64(3),
          "_rng": np.random.default_rng(42)}


# --- grammar ---------------------------------------------------------------

def test_parse_name_forms():
  assert parse_name("flip_lr") == ("flip_lr", (), {})
  assert parse_name("resize(64)") == ("resize", (64,), {})
  assert parse_name('crop(8, pad=4, mode="x")') == (
      "crop", (8,), {"pad": 4, "mode": "x"})
  assert parse_name("value_range(-1, 1)") == ("value_range", (-1, 1), {})
  for bad in ["fn(x)", "a.b()", "fn(**kw)", "3+4"]:
    with pytest.raises((ValueError, SyntaxError, KeyError)):
      parse_name(bad)


def test_registry_temporary_ops():
  with temporary_ops(double=lambda: lambda d: {**d, "x": d["x"] * 2}):
    fn, stage = Registry.lookup("double")
    assert stage == "host"
    assert fn({"x": 3})["x"] == 6
  assert not Registry.knows("double")


def test_builder_empty_segments_tolerated():
  host, device = builder.get_preprocess_fn("||resize(32)|||")
  out = host(_example())
  assert out["image"].shape == (32, 32, 3)
  assert device is None


def test_builder_host_after_device_rejected():
  with pytest.raises(ValueError):
    builder.get_preprocess_fn("value_range(-1, 1)|resize(32)")


# --- image ops (standalone + in-pipeline dual mode) -------------------------

def _run_dual(pp_spec, example):
  """Runs host pp twice from fresh lookups with identically seeded rngs —
  both must agree (determinism of the whole parse→compose→run path)."""
  h1, _ = builder.get_preprocess_fn(pp_spec)
  h2, _ = builder.get_preprocess_fn(pp_spec)
  e1 = {**example, "_rng": np.random.default_rng(42)}
  e2 = {**example, "_rng": np.random.default_rng(42)}
  e1, e2 = h1(e1), h2(e2)
  np.testing.assert_array_equal(e1["image"], e2["image"])
  return e1


def test_decode():
  ex = _example(np.frombuffer(_jpeg_bytes(), dtype=np.uint8))
  ex["image"] = _jpeg_bytes()
  out = _run_dual("decode", ex)
  assert out["image"].shape == (300, 200, 3)
  assert out["image"].dtype == np.uint8


def test_resize_variants():
  out = _run_dual("resize(64)", _example())
  assert out["image"].shape == (64, 64, 3)
  out = _run_dual("resize_small(64)", _example())
  assert min(out["image"].shape[:2]) == 64
  assert out["image"].shape[0] > 64  # 128x96 → 85x64
  out = _run_dual("resize_long(64)", _example())
  assert max(out["image"].shape[:2]) == 64


def test_central_crop_and_random_crop():
  out = _run_dual("central_crop(50)", _example())
  assert out["image"].shape == (50, 50, 3)
  out = _run_dual("random_crop(40)", _example())
  assert out["image"].shape == (40, 40, 3)


def test_inception_crop_respects_area():
  ex = _example()
  out = _run_dual("inception_crop(size=32, area_min=80)", dict(ex))
  assert out["image"].shape == (32, 32, 3)
  # The raw crop (no resize) must cover ≥ ~80% area in expectation; check
  # bounds only (crop never exceeds source).
  out2, _ = builder.get_preprocess_fn("inception_crop(area_min=80)")
  crop = out2(dict(ex))["image"]
  assert crop.shape[0] <= 128 and crop.shape[1] <= 96


def test_decode_jpeg_and_inception_crop():
  ex = {"image": _jpeg_bytes(), "label": np.int64(0),
        "_rng": np.random.default_rng(7)}
  host, _ = builder.get_preprocess_fn(
      "decode_jpeg_and_inception_crop(size=64, area_min=80)")
  out = host(ex)
  assert out["image"].shape == (64, 64, 3)
  assert out["image"].dtype == np.uint8


def test_keep_drop_copy():
  ex = {"image": np.zeros(3), "label": np.int64(1), "extra": 7,
        "_rng": None}
  host, _ = builder.get_preprocess_fn('copy("label", "label2")|keep("image", "label2")')
  out = host(ex)
  assert set(k for k in out if not k.startswith("_")) == {"image", "label2"}
  host, _ = builder.get_preprocess_fn('drop("extra")')
  assert "extra" not in host(dict(ex))


# --- device ops -------------------------------------------------------------

def test_value_range_device():
  _, device = builder.get_preprocess_fn("value_range(-1, 1)")
  batch = {"image": np.full((2, 4, 4, 3), 255, np.uint8)}
  out = device(batch, jax.random.PRNGKey(0))
  np.testing.assert_allclose(np.asarray(out["image"]), 1.0)
  batch = {"image": np.zeros((2, 4, 4, 3), np.uint8)}
  out = device(batch, jax.random.PRNGKey(0))
  np.testing.assert_allclose(np.asarray(out["image"]), -1.0)


def test_flip_lr_device_is_flip_or_identity():
  _, device = builder.get_preprocess_fn("flip_lr")
  img = np.arange(2 * 1 * 4 * 1, dtype=np.float32).reshape(2, 1, 4, 1)
  out = np.asarray(device({"image": img}, jax.random.PRNGKey(0))["image"])
  for b in range(2):
    ok = (np.array_equal(out[b], img[b]) or
          np.array_equal(out[b], img[b][:, ::-1]))
    assert ok


def test_onehot_device():
  _, device = builder.get_preprocess_fn('onehot(5, key="label")')
  out = device({"label": np.asarray([0, 3])}, jax.random.PRNGKey(0))
  np.testing.assert_array_equal(
      np.asarray(out["label"]),
      [[1, 0, 0, 0, 0], [0, 0, 0, 1, 0]])


def test_full_train_pp_string():
  """The exact ae_i1k.py training pp string end to end."""
  spec = ('decode_jpeg_and_inception_crop(size=64, area_min=80)|flip_lr'
          '|value_range(-1, 1)|keep("image", "label")')
  host, device = builder.get_preprocess_fn(spec)
  ex = {"image": _jpeg_bytes(), "label": np.int64(5),
        "_rng": np.random.default_rng(3)}
  hosted = host(ex)
  assert hosted["image"].shape == (64, 64, 3)
  batch = {"image": np.stack([hosted["image"]] * 4),
           "label": np.stack([hosted["label"]] * 4)}
  out = device(batch, jax.random.PRNGKey(0))
  img = np.asarray(out["image"])
  assert img.min() >= -1.0 and img.max() <= 1.0 and img.dtype == np.float32
