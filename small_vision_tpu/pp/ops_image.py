"""Image preprocessing ops.

Parity target: /root/reference/big_vision/pp/ops_image.py. Split per the
TPU-native staging (pp/registry.py):

  host stage (numpy/PIL, per example): decode, decode_jpeg_and_inception_crop
    (the training hot path), inception_crop, resize, resize_small,
    resize_long, central_crop, random_crop, grayscale.
  device stage (batched jax, fused into one jit): flip_lr, value_range is in
    ops_general, vgg_value_range, clip_value_range.

Host ops draw randomness from `data["_rng"]` (a numpy Generator the input
pipeline seeds per example) so runs are reproducible.
"""

import io

import jax.numpy as jnp
import numpy as np
from PIL import Image

from small_vision_tpu.pp.registry import Registry
from small_vision_tpu.pp.utils import InKeyOutKey, maybe_repeat


def _rng_of(data) -> np.random.Generator:
  rng = data.get("_rng")
  return rng if rng is not None else np.random.default_rng()


def _to_pil(img) -> Image.Image:
  arr = np.asarray(img)
  if arr.dtype != np.uint8:
    arr = np.clip(arr, 0, 255).astype(np.uint8)
  return Image.fromarray(arr)


def _decode_bytes(value) -> np.ndarray:
  """JPEG/PNG bytes → uint8 HWC RGB array."""
  if isinstance(value, np.ndarray) and value.dtype != object:
    return value  # Already decoded.
  raw = bytes(value) if not isinstance(value, bytes) else value
  with Image.open(io.BytesIO(raw)) as im:
    return np.asarray(im.convert("RGB"))


@Registry.register("decode")
def get_decode(channels: int = 3):
  """Decodes compressed image bytes to uint8 (reference ops_image.py:31)."""
  del channels

  def _decode(data):
    data["image"] = _decode_bytes(data["image"])
    return data
  return _decode


_TF_RESIZE = None


def _tf_resize_fn():
  """tf.image.resize if tensorflow is importable (EXACT reference resize
  semantics: bilinear, half-pixel centers, NO antialias — ops_image.py:57);
  None otherwise. PIL's filtered resize differs enough to move FID."""
  global _TF_RESIZE
  if _TF_RESIZE is None:
    try:
      import tensorflow as tf
      tf.config.set_visible_devices([], "GPU")
      _TF_RESIZE = tf.image.resize
    except ImportError:
      _TF_RESIZE = False
  return _TF_RESIZE or None


def _resize_np(img: np.ndarray, size, method="bilinear") -> np.ndarray:
  h, w = size
  tf_resize = _tf_resize_fn()
  if tf_resize is not None and method in ("bilinear", "nearest"):
    out = tf_resize(np.asarray(img), (h, w), method=method).numpy()
    # Reference casts via tf.cast(clip(x, 0, 255), uint8), which TRUNCATES
    # toward zero (ops_image.py:84) — astype matches; rint would not.
    return np.clip(out, 0, 255).astype(np.uint8) if (
        np.asarray(img).dtype == np.uint8) else out
  resample = {"bilinear": Image.BILINEAR, "nearest": Image.NEAREST,
              "bicubic": Image.BICUBIC, "area": Image.BOX}[method]
  out = _to_pil(img).resize((w, h), resample)
  return np.asarray(out)


@Registry.register("resize")
@InKeyOutKey()
def get_resize(size, method: str = "bilinear"):
  """Resizes to (h, w); int means square (reference ops_image.py:57)."""
  size = maybe_repeat(size, 2)

  def _resize(image, data):
    del data
    return _resize_np(np.asarray(image), size, method)
  return _resize


@Registry.register("resize_small")
@InKeyOutKey()
def get_resize_small(smaller_size: int, method: str = "bilinear"):
  """Scales so the SHORTER side equals `smaller_size`, keeping aspect."""

  def _resize_small(image, data):
    del data
    image = np.asarray(image)
    h, w = image.shape[:2]
    ratio = smaller_size / min(h, w)
    nh = smaller_size if h <= w else int(round(h * ratio))
    nw = smaller_size if w <= h else int(round(w * ratio))
    return _resize_np(image, (nh, nw), method)
  return _resize_small


@Registry.register("resize_long")
@InKeyOutKey()
def get_resize_long(longer_size: int, method: str = "bilinear"):
  """Scales so the LONGER side equals `longer_size`."""

  def _resize_long(image, data):
    del data
    image = np.asarray(image)
    h, w = image.shape[:2]
    ratio = longer_size / max(h, w)
    nh = longer_size if h >= w else int(round(h * ratio))
    nw = longer_size if w >= h else int(round(w * ratio))
    return _resize_np(image, (nh, nw), method)
  return _resize_long


def _sample_inception_box(rng, h, w, area_min, area_max=100,
                          aspect_ratio_range=(0.75, 1.33), max_attempts=100):
  """Distribution-faithful port of tf.image.sample_distorted_bounding_box.

  The reference training crop (ops_image.py:197-243) uses the TF op, whose
  C++ sampler (sample_distorted_bounding_box_op.cc GenerateRandomCrop) draws
  the aspect ratio LINEAR-uniform in [0.75, 1.33] and then an integer height
  uniform between the min/max heights implied by the area bounds — NOT the
  torchvision recipe (log-uniform aspect, uniform area). Matching the box
  distribution is a SURVEY §7 hard-parts item (it shifts the training-data
  distribution and therefore FID/LP comparability);
  tests/test_reference_parity.py KS-tests this against the TF op.
  """
  min_area = area_min / 100 * h * w
  max_area = area_max / 100 * h * w
  for _ in range(max_attempts):
    ar = float(rng.uniform(*aspect_ratio_range))
    height = int(np.rint(np.sqrt(min_area / ar)))
    max_height = int(np.rint(np.sqrt(max_area / ar)))
    if np.rint(max_height * ar) > w:
      max_height = int((w + 0.5 - 1e-7) / ar)
      if np.rint(max_height * ar) > w:
        max_height -= 1
    max_height = min(max_height, h)
    height = min(height, max_height)
    if height < max_height:
      height += int(rng.integers(0, max_height - height + 1))
    width = int(np.rint(height * ar))
    if width * height < min_area:
      height += 1
      width = int(np.rint(height * ar))
    if width * height > max_area:
      height -= 1
      width = int(np.rint(height * ar))
    area = width * height
    if (area < min_area or area > max_area or width > w or height > h
        or width <= 0 or height <= 0):
      continue
    # TF's offset draw is Uniform(H - h), EXCLUSIVE of the flush-to-edge
    # placement (a quirk of the C++ op; keeps the KS test honest).
    y0 = int(rng.integers(0, h - height)) if height < h else 0
    x0 = int(rng.integers(0, w - width)) if width < w else 0
    return y0, x0, height, width
  return 0, 0, h, w


@Registry.register("inception_crop")
@InKeyOutKey()
def get_inception_crop(size=None, area_min: int = 5, area_max: int = 100,
                       method: str = "bilinear"):
  """Random distorted crop (+optional resize) on a decoded image."""
  size = maybe_repeat(size, 2) if size else None

  def _inception_crop(image, data):
    image = np.asarray(image)
    rng = _rng_of(data)
    y0, x0, ch, cw = _sample_inception_box(
        rng, image.shape[0], image.shape[1], area_min, area_max)
    crop = image[y0:y0 + ch, x0:x0 + cw]
    if size is not None:
      crop = _resize_np(crop, size, method)
    return crop
  return _inception_crop


@Registry.register("decode_jpeg_and_inception_crop")
@InKeyOutKey()
def get_decode_jpeg_and_inception_crop(size=None, area_min: int = 5,
                                       area_max: int = 100,
                                       method: str = "bilinear"):
  """THE training hot path (reference ops_image.py:197): decode restricted
  to the crop window, then resize. With PIL we decode the full image but
  crop before any color conversion/resize work."""
  size = maybe_repeat(size, 2) if size else None

  def _pil_fallback(raw, rng):
    """PIL decode+crop(+resize). Shared by `_op` and `_batch` so the rng
    draw sequence for corrupt files is identical on both paths."""
    with Image.open(io.BytesIO(raw)) as im:
      w, h = im.size
      y0, x0, ch, cw = _sample_inception_box(rng, h, w, area_min, area_max)
      img = np.asarray(im.convert("RGB").crop((x0, y0, x0 + cw, y0 + ch)))
      if size is not None:
        img = _resize_np(img, size, method)
      return img

  def _op(image, data):
    rng = _rng_of(data)
    if isinstance(image, np.ndarray) and image.dtype == np.uint8:
      # Already decoded (e.g. synthetic source): crop + resize only.
      y0, x0, ch, cw = _sample_inception_box(
          rng, image.shape[0], image.shape[1], area_min, area_max)
      img = image[y0:y0 + ch, x0:x0 + cw]
      return _resize_np(img, size, method) if size is not None else img

    raw = bytes(image) if not isinstance(image, bytes) else image
    # Fast path: native fused decode+crop+resize (releases the GIL; decodes
    # at reduced libjpeg scale — see data/_native/sv_dataloader.cpp).
    if size is not None:
      from small_vision_tpu.data import native_jpeg
      if native_jpeg.available():
        try:
          return native_jpeg.decode_inception_crop(
              raw, size[0], size[1], area_min / 100, area_max / 100,
              seed=int(rng.integers(0, 2**63)))
        except ValueError:
          pass  # Corrupt/exotic file: fall through to PIL.
    return _pil_fallback(raw, rng)

  def _batch(images, datas):
    """Whole-chunk fast path: ONE native call decodes the batch with the
    library's own C++ thread pool (one GIL release per chunk instead of one
    Python call per image). Per-image output is bitwise-identical to `_op`
    (same per-example seed draw order). Returns None → caller maps `_op`."""
    if size is None:
      return None
    from small_vision_tpu.data import native_jpeg
    if not native_jpeg.available():
      return None
    outs = [None] * len(images)
    raws, seeds, idxs = [], [], []
    for i, (image, d) in enumerate(zip(images, datas)):
      if isinstance(image, np.ndarray) and image.dtype == np.uint8:
        outs[i] = _op(image, d)  # already decoded: crop+resize only
      else:
        raws.append(bytes(image) if not isinstance(image, bytes) else image)
        seeds.append(int(_rng_of(d).integers(0, 2**63)))
        idxs.append(i)
    if raws:
      arr, rcs = native_jpeg.decode_inception_crop_batch(
          raws, size[0], size[1], area_min / 100, area_max / 100, seeds)
      for j, i in enumerate(idxs):
        if rcs[j] == 0:
          outs[i] = arr[j]
        else:
          # Corrupt/exotic file: PIL fallback with the SAME rng state the
          # per-image path reaches it in (one seed draw already consumed
          # above) — no retry of the native decoder, no extra seed draw.
          outs[i] = _pil_fallback(raws[j], _rng_of(datas[i]))
    return outs

  _op.batch = _batch
  return _op


@Registry.register("central_crop")
@InKeyOutKey()
def get_central_crop(size=None):
  """Center crop to (h, w); pads with zeros if the image is smaller."""
  size = maybe_repeat(size, 2)

  def _central_crop(image, data):
    del data
    image = np.asarray(image)
    h, w = image.shape[:2]
    th, tw = size
    if th > h or tw > w:
      py, px = max(th - h, 0), max(tw - w, 0)
      image = np.pad(image, ((py // 2, py - py // 2),
                             (px // 2, px - px // 2), (0, 0)))
      h, w = image.shape[:2]
    y0, x0 = (h - th) // 2, (w - tw) // 2
    return image[y0:y0 + th, x0:x0 + tw]
  return _central_crop


@Registry.register("random_crop")
@InKeyOutKey()
def get_random_crop(size):
  size = maybe_repeat(size, 2)

  def _random_crop(image, data):
    image = np.asarray(image)
    rng = _rng_of(data)
    h, w = image.shape[:2]
    th, tw = size
    y0 = int(rng.integers(0, h - th + 1))
    x0 = int(rng.integers(0, w - tw + 1))
    return image[y0:y0 + th, x0:x0 + tw]
  return _random_crop


@Registry.register("grayscale")
@InKeyOutKey()
def get_grayscale(keep_channels: bool = True):

  def _grayscale(image, data):
    del data
    image = np.asarray(image).astype(np.float32)
    gray = (0.2989 * image[..., 0] + 0.587 * image[..., 1]
            + 0.114 * image[..., 2])
    gray = gray[..., None]
    if keep_channels:
      gray = np.repeat(gray, 3, axis=-1)
    return gray.astype(np.uint8)
  return _grayscale


# ---------------------------------------------------------------------------
# Device-stage ops: batched jax, fused into the post-transfer jit program.
# ---------------------------------------------------------------------------


@Registry.register("flip_lr", stage="device")
def get_flip_lr():
  """Random horizontal flip per example — on device, one bernoulli draw per
  row, a reversed view, and a select: pure VPU work fused with value_range."""

  def _flip_lr(batch, rng):
    import jax
    img = batch["image"]
    flip = jax.random.bernoulli(rng, 0.5, (img.shape[0],))
    batch["image"] = jnp.where(flip[:, None, None, None],
                               img[:, :, ::-1, :], img)
    return batch
  return _flip_lr


@Registry.register("vgg_value_range", stage="device")
def get_vgg_value_range(
    mean=(0.485 * 255, 0.456 * 255, 0.406 * 255),
    std=(0.229 * 255, 0.224 * 255, 0.225 * 255)):
  """Standard torchvision normalization (reference ops_image.py:317)."""
  mean = jnp.asarray(mean, jnp.float32)
  std = jnp.asarray(std, jnp.float32)

  def _vgg(batch, rng):
    del rng
    batch["image"] = (batch["image"].astype(jnp.float32) - mean) / std
    return batch
  return _vgg


@Registry.register("clip_value_range", stage="device")
def get_clip_value_range(
    mean=(0.48145466 * 255, 0.4578275 * 255, 0.40821073 * 255),
    std=(0.26862954 * 255, 0.26130258 * 255, 0.27577711 * 255)):
  mean = jnp.asarray(mean, jnp.float32)
  std = jnp.asarray(std, jnp.float32)

  def _clip(batch, rng):
    del rng
    batch["image"] = (batch["image"].astype(jnp.float32) - mean) / std
    return batch
  return _clip
