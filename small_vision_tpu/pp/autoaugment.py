"""RandAugment (host-stage, PIL-backed).

Parity target: /root/reference/big_vision/pp/autoaugment.py (the
tensorflow/tpu EfficientNet policy set, 700 LoC of TF graph code) exposed as
the `randaug(num_layers, magnitude)` pp op (reference ops_image.py:354).
Re-implemented on PIL: same op set, same magnitude semantics
(_MAX_LEVEL=10, additive translate/shear scaling, cutout), minus the TF
graph machinery — host pp here is plain per-example Python.
"""

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

from small_vision_tpu.pp.registry import Registry
from small_vision_tpu.pp.utils import InKeyOutKey

_MAX_LEVEL = 10.0
_REPLACE = (128, 128, 128)


def _mag(level, maxval):
  return level / _MAX_LEVEL * maxval


def _rand_negate(rng, v):
  return -v if rng.random() < 0.5 else v


def _autocontrast(im, level, rng):
  return ImageOps.autocontrast(im)


def _equalize(im, level, rng):
  return ImageOps.equalize(im)


def _invert(im, level, rng):
  return ImageOps.invert(im)


def _rotate(im, level, rng):
  deg = _rand_negate(rng, _mag(level, 30.0))
  return im.rotate(deg, fillcolor=_REPLACE)


def _posterize(im, level, rng):
  bits = 8 - int(_mag(level, 4))
  return ImageOps.posterize(im, max(bits, 1))


def _solarize(im, level, rng):
  return ImageOps.solarize(im, 256 - int(_mag(level, 256)))


def _solarize_add(im, level, rng, threshold=128):
  add = int(_mag(level, 110))
  arr = np.asarray(im, np.int32)
  out = np.where(arr < threshold, np.clip(arr + add, 0, 255), arr)
  return Image.fromarray(out.astype(np.uint8))


def _enhance(factory):
  def op(im, level, rng):
    factor = _mag(level, 1.8) + 0.1
    return factory(im).enhance(factor)
  return op


def _shear_x(im, level, rng):
  v = _rand_negate(rng, _mag(level, 0.3))
  return im.transform(im.size, Image.AFFINE, (1, v, 0, 0, 1, 0),
                      fillcolor=_REPLACE)


def _shear_y(im, level, rng):
  v = _rand_negate(rng, _mag(level, 0.3))
  return im.transform(im.size, Image.AFFINE, (1, 0, 0, v, 1, 0),
                      fillcolor=_REPLACE)


def _translate_x(im, level, rng, translate_const=100.0):
  # Pixel translate scaled to `translate_const` at max level, relative to the
  # reference's 331px EfficientNet resolution. RandAugment uses 100
  # (reference autoaugment.py:674), AutoAugment policies use 250
  # (reference autoaugment.py:657).
  v = _rand_negate(rng, _mag(level, translate_const)) * im.size[0] / 331.0
  return im.transform(im.size, Image.AFFINE, (1, 0, v, 0, 1, 0),
                      fillcolor=_REPLACE)


def _translate_y(im, level, rng, translate_const=100.0):
  v = _rand_negate(rng, _mag(level, translate_const)) * im.size[1] / 331.0
  return im.transform(im.size, Image.AFFINE, (1, 0, 0, 0, 1, v),
                      fillcolor=_REPLACE)


def _cutout(im, level, rng, cutout_const=40):
  # cutout_const: 40 for randaug, 100 for AutoAugment (reference
  # autoaugment.py:657,674).
  size = int(_mag(level, cutout_const)) * im.size[0] // 331
  if size <= 0:
    return im
  arr = np.array(im)
  h, w = arr.shape[:2]
  cy, cx = int(rng.integers(0, h)), int(rng.integers(0, w))
  y0, y1 = max(cy - size // 2, 0), min(cy + size // 2, h)
  x0, x1 = max(cx - size // 2, 0), min(cx + size // 2, w)
  arr[y0:y1, x0:x1] = _REPLACE
  return Image.fromarray(arr)


NAME_TO_FUNC = {
    "AutoContrast": _autocontrast,
    "Equalize": _equalize,
    "Invert": _invert,
    "Rotate": _rotate,
    "Posterize": _posterize,
    "Solarize": _solarize,
    "SolarizeAdd": _solarize_add,
    "Color": _enhance(ImageEnhance.Color),
    "Contrast": _enhance(ImageEnhance.Contrast),
    "Brightness": _enhance(ImageEnhance.Brightness),
    "Sharpness": _enhance(ImageEnhance.Sharpness),
    "ShearX": _shear_x,
    "ShearY": _shear_y,
    "TranslateX": _translate_x,
    "TranslateY": _translate_y,
    "Cutout": _cutout,
}

# The RandAugment available-op list from the reference policy set.
RANDAUG_OPS = list(NAME_TO_FUNC)


def distort_image_with_randaugment(image: np.ndarray, num_layers: int,
                                   magnitude: int,
                                   rng: np.random.Generator) -> np.ndarray:
  """Applies `num_layers` randomly chosen ops at the given magnitude."""
  im = Image.fromarray(np.asarray(image, np.uint8))
  for _ in range(num_layers):
    op_name = RANDAUG_OPS[int(rng.integers(0, len(RANDAUG_OPS)))]
    im = NAME_TO_FUNC[op_name](im, float(magnitude), rng)
  return np.asarray(im.convert("RGB"))


@Registry.register("randaug")
@InKeyOutKey()
def get_randaug(num_layers: int = 2, magnitude: int = 10):
  """`randaug(2, 10)` pp op (reference ops_image.py:354)."""

  def _randaug(image, data):
    rng = data.get("_rng") or np.random.default_rng()
    return distort_image_with_randaugment(
        np.asarray(image), num_layers, magnitude, rng)
  return _randaug


# ---------------------------------------------------------------------------
# AutoAugment learned policies (reference autoaugment.py:46-94, :634-659).
# The reference defines distort_image_with_autoaugment but registers no pp
# op for it (only randaug is consumed); we port the policy tables AND expose
# an `autoaugment(policy)` op so the capability is reachable from pp strings.
# ---------------------------------------------------------------------------

# (operation, probability, magnitude) pairs; each sub-policy applies its ops
# in sequence; one sub-policy is drawn uniformly per image. Table values are
# the published AutoAugment ImageNet policy (reference autoaugment.py:46).
POLICY_V0 = [
    [("Equalize", 0.8, 1), ("ShearY", 0.8, 4)],
    [("Color", 0.4, 9), ("Equalize", 0.6, 3)],
    [("Color", 0.4, 1), ("Rotate", 0.6, 8)],
    [("Solarize", 0.8, 3), ("Equalize", 0.4, 7)],
    [("Solarize", 0.4, 2), ("Solarize", 0.6, 2)],
    [("Color", 0.2, 0), ("Equalize", 0.8, 8)],
    [("Equalize", 0.4, 8), ("SolarizeAdd", 0.8, 3)],
    [("ShearX", 0.2, 9), ("Rotate", 0.6, 8)],
    [("Color", 0.6, 1), ("Equalize", 1.0, 2)],
    [("Invert", 0.4, 9), ("Rotate", 0.6, 0)],
    [("Equalize", 1.0, 9), ("ShearY", 0.6, 3)],
    [("Color", 0.4, 7), ("Equalize", 0.6, 0)],
    [("Posterize", 0.4, 6), ("AutoContrast", 0.4, 7)],
    [("Solarize", 0.6, 8), ("Color", 0.6, 9)],
    [("Solarize", 0.2, 4), ("Rotate", 0.8, 9)],
    [("Rotate", 1.0, 7), ("TranslateY", 0.8, 9)],
    [("ShearX", 0.0, 0), ("Solarize", 0.8, 4)],
    [("ShearY", 0.8, 0), ("Color", 0.6, 4)],
    [("Color", 1.0, 0), ("Rotate", 0.6, 2)],
    [("Equalize", 0.8, 4), ("Equalize", 0.0, 8)],
    [("Equalize", 1.0, 4), ("AutoContrast", 0.6, 2)],
    [("ShearY", 0.4, 7), ("SolarizeAdd", 0.6, 7)],
    [("Posterize", 0.8, 2), ("Solarize", 0.6, 10)],
    [("Solarize", 0.6, 8), ("Equalize", 0.6, 1)],
    [("Color", 0.8, 6), ("Rotate", 0.4, 5)],
]

POLICY_VTEST = [
    [("TranslateX", 1.0, 4), ("Equalize", 1.0, 10)],
]

AVAILABLE_POLICIES = {"v0": POLICY_V0, "test": POLICY_VTEST}


def distort_image_with_autoaugment(image: np.ndarray, policy_name: str,
                                   rng: np.random.Generator) -> np.ndarray:
  """One uniformly-drawn sub-policy; each op fires with its probability
  (reference autoaugment.py:634 build_and_apply_nas_policy semantics)."""
  if policy_name not in AVAILABLE_POLICIES:
    raise ValueError(f"Invalid augmentation_name: {policy_name}")
  policy = AVAILABLE_POLICIES[policy_name]
  sub = policy[int(rng.integers(0, len(policy)))]
  im = Image.fromarray(np.asarray(image, np.uint8))
  # AutoAugment hparams: translate_const=250, cutout_const=100 (reference
  # autoaugment.py:657) — stronger than randaug's 100/40 defaults.
  hparams = {
      "TranslateX": {"translate_const": 250.0},
      "TranslateY": {"translate_const": 250.0},
      "Cutout": {"cutout_const": 100},
  }
  for name, prob, magnitude in sub:
    if rng.random() < prob:
      im = NAME_TO_FUNC[name](im, float(magnitude), rng, **hparams.get(name, {}))
  return np.asarray(im.convert("RGB"))


@Registry.register("autoaugment")
@InKeyOutKey()
def get_autoaugment(policy: str = "v0"):
  """`autoaugment("v0")` pp op applying the learned ImageNet policy."""

  def _autoaugment(image, data):
    rng = data.get("_rng") or np.random.default_rng()
    return distort_image_with_autoaugment(np.asarray(image), policy, rng)
  return _autoaugment
