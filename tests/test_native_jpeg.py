"""Native JPEG loader: builds, decodes correctly, crop semantics hold."""

import io
import time

import numpy as np
import pytest
from PIL import Image

from small_vision_tpu.data import native_jpeg


def _jpeg(h=300, w=200, quality=95):
  rng = np.random.default_rng(0)
  # Smooth image so JPEG round-trip error is small.
  base = rng.integers(0, 256, (10, 10, 3), dtype=np.uint8)
  img = np.asarray(Image.fromarray(base).resize((w, h), Image.BILINEAR))
  buf = io.BytesIO()
  Image.fromarray(img).save(buf, format="JPEG", quality=quality)
  return buf.getvalue(), img


pytestmark = pytest.mark.skipif(not native_jpeg.available(),
                                reason="native loader unavailable")


def test_decode_matches_pil():
  raw, _ = _jpeg()
  ours = native_jpeg.decode(raw)
  with Image.open(io.BytesIO(raw)) as im:
    theirs = np.asarray(im.convert("RGB"))
  assert ours.shape == theirs.shape == (300, 200, 3)
  # libjpeg vs PIL (also libjpeg) should agree bit-for-bit or very nearly.
  assert np.mean(np.abs(ours.astype(int) - theirs.astype(int))) < 1.0


def test_inception_crop_shapes_and_determinism():
  raw, _ = _jpeg()
  a = native_jpeg.decode_inception_crop(raw, 64, 64, 0.8, 1.0, seed=7)
  b = native_jpeg.decode_inception_crop(raw, 64, 64, 0.8, 1.0, seed=7)
  c = native_jpeg.decode_inception_crop(raw, 64, 64, 0.8, 1.0, seed=8)
  assert a.shape == (64, 64, 3) and a.dtype == np.uint8
  np.testing.assert_array_equal(a, b)          # same seed → same crop
  assert not np.array_equal(a, c)              # different seed → different


def test_full_area_crop_equals_resized_image():
  raw, img = _jpeg(256, 256)
  out = native_jpeg.decode_inception_crop(raw, 64, 64, 1.0, 1.0, seed=0)
  ref = np.asarray(Image.fromarray(img).resize((64, 64), Image.BILINEAR))
  assert np.mean(np.abs(out.astype(int) - ref.astype(int))) < 12.0


def test_bad_jpeg_raises():
  with pytest.raises(ValueError):
    native_jpeg.decode(b"not a jpeg at all")


def test_pp_op_uses_native_path():
  raw, _ = _jpeg()
  import small_vision_tpu.pp.ops_image  # noqa: F401 (registry side effect)
  from small_vision_tpu.pp.builder import get_preprocess_fn
  host, _ = get_preprocess_fn(
      "decode_jpeg_and_inception_crop(size=64, area_min=80)")
  out = host({"image": raw, "_rng": np.random.default_rng(0)})
  assert out["image"].shape == (64, 64, 3)


def test_native_faster_than_pil():
  raw, _ = _jpeg(600, 500)
  # Best-of-3 windows: wall-clock on a shared-CPU box is noisy (a single
  # window loses to scheduler preemption, not to PIL).
  n, t_native, t_pil = 10, float("inf"), float("inf")
  for _ in range(3):
    t0 = time.perf_counter()
    for i in range(n):
      native_jpeg.decode_inception_crop(raw, 64, 64, 0.8, 1.0, seed=i)
    t_native = min(t_native, time.perf_counter() - t0)

    t0 = time.perf_counter()
    for i in range(n):
      with Image.open(io.BytesIO(raw)) as im:
        np.asarray(im.convert("RGB").crop((0, 0, 400, 400)).resize(
            (64, 64), Image.BILINEAR))
    t_pil = min(t_pil, time.perf_counter() - t0)
  # The reduced-scale decode should win clearly on large sources.
  assert t_native < t_pil, (t_native, t_pil)

def test_batch_decode_bitwise_matches_per_image():
  raws = [_jpeg(h, w)[0] for h, w in [(300, 200), (123, 456), (64, 64)]]
  seeds = [11, 22, 33]
  out, rcs = native_jpeg.decode_inception_crop_batch(
      raws, 64, 64, 0.3, 1.0, seeds)
  assert out.shape == (3, 64, 64, 3) and (rcs == 0).all()
  for i, (raw, seed) in enumerate(zip(raws, seeds)):
    single = native_jpeg.decode_inception_crop(raw, 64, 64, 0.3, 1.0,
                                               seed=seed)
    np.testing.assert_array_equal(out[i], single)


def test_batch_decode_reports_bad_images():
  good, _ = _jpeg()
  out, rcs = native_jpeg.decode_inception_crop_batch(
      [good, b"not a jpeg at all", good], 32, 32, 0.5, 1.0, [1, 2, 3])
  assert rcs[0] == 0 and rcs[2] == 0
  assert rcs[1] != 0


def test_pipeline_host_batch_path_matches_threaded():
  """_HostPipeline via host_fn.batch == per-example threaded map (same
  deterministic per-example rng seeding)."""
  from small_vision_tpu.data.pipeline import _HostPipeline
  from small_vision_tpu.pp.builder import get_preprocess_fn
  import small_vision_tpu.pp.ops_image  # noqa: F401
  import small_vision_tpu.pp.ops_general  # noqa: F401

  raws = [_jpeg(200 + 10 * i, 150 + 5 * i)[0] for i in range(8)]

  def factory():
    return iter([{"image": r, "label": i, "_id": i}
                 for i, r in enumerate(raws)])

  host_fn, _ = get_preprocess_fn(
      'decode_jpeg_and_inception_crop(32, area_min=30)|keep("image","label")')
  assert hasattr(host_fn, "batch"), "batch fast path not exposed"

  def run(use_batch):
    fn = host_fn
    if not use_batch:
      def fn(d, _h=host_fn):  # strip .batch: force the threaded path
        return _h(d)
    pipe = _HostPipeline(factory, fn, local_batch_size=4, num_workers=2,
                         seed=123)
    return list(pipe)

  got = run(True)
  want = run(False)
  assert len(got) == len(want) == 2
  for g, w in zip(got, want):
    np.testing.assert_array_equal(g["image"], w["image"])
    np.testing.assert_array_equal(g["label"], w["label"])
