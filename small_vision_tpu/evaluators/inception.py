"""InceptionV3 (pytorch-fid variant) in Flax.

Parity target: the Flax InceptionV3 port in
/root/reference/big_vision/evaluators/fid.py:139-773 (itself a port of
mseitzer/pytorch-fid, which FID numbers are standardized against). The
FID-critical quirks carried over:

  - BasicConv2d = Conv(no bias) + BatchNorm(eps=1e-3) + relu;
  - InceptionA/B/C/D/E tower layout with the FID variant's pooling:
    Mixed_7b uses count-corrected avg-pool (exclude padding from the count),
    and the classifier head has 1008 outputs;
  - pool3 features = 2048-d global average pool before the fc.

Weights: `load_params(path)` reads a flat .npz keyed by slash-paths (use
`scripts/convert_inception.py` to produce one from torchvision weights on a
machine with network). With no weights file, random init still exercises the
full FID pipeline (shape/math correctness; numbers are only meaningful with
the pretrained weights).
"""

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicConv2d(nn.Module):
  out_channels: int
  kernel: Sequence[int]
  strides: int = 1
  padding: Any = 0
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x, train=False):
    pad = self.padding
    if isinstance(pad, int):
      pad = [(pad, pad), (pad, pad)]
    x = nn.Conv(self.out_channels, self.kernel, strides=self.strides,
                padding=pad, use_bias=False, dtype=self.dtype,
                name="conv")(x)
    x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                     momentum=0.9, dtype=self.dtype, name="bn")(x)
    return nn.relu(x)


def _max_pool(x, window=3, stride=2, padding=0):
  pad = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
  return jax.lax.reduce_window(
      x, -jnp.inf, jax.lax.max, (1, window, window, 1),
      (1, stride, stride, 1), pad)


def _avg_pool(x, window=3, stride=1, padding=1, count_include_pad=True):
  """Average pool; optionally exclude the zero padding from the divisor
  (the FID InceptionE quirk — reference fid.py:743-773)."""
  pad = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
  summed = jax.lax.reduce_window(
      x, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1),
      pad)
  if count_include_pad:
    return summed / (window * window)
  ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
  counts = jax.lax.reduce_window(
      ones, 0.0, jax.lax.add, (1, window, window, 1),
      (1, stride, stride, 1), pad)
  return summed / counts


class InceptionA(nn.Module):
  pool_features: int

  @nn.compact
  def __call__(self, x):
    b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
    b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
    b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5)
    b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
    b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
    b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
    bp = _avg_pool(x, 3, 1, 1, count_include_pad=False)
    bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):

  @nn.compact
  def __call__(self, x):
    b3 = BasicConv2d(384, (3, 3), strides=2, name="branch3x3")(x)
    bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
    bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
    bd = BasicConv2d(96, (3, 3), strides=2, name="branch3x3dbl_3")(bd)
    bp = _max_pool(x, 3, 2)
    return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
  channels_7x7: int

  @nn.compact
  def __call__(self, x):
    c7 = self.channels_7x7
    b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
    b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
    b7 = BasicConv2d(c7, (1, 7), padding=[(0, 0), (3, 3)],
                     name="branch7x7_2")(b7)
    b7 = BasicConv2d(192, (7, 1), padding=[(3, 3), (0, 0)],
                     name="branch7x7_3")(b7)
    bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
    bd = BasicConv2d(c7, (7, 1), padding=[(3, 3), (0, 0)],
                     name="branch7x7dbl_2")(bd)
    bd = BasicConv2d(c7, (1, 7), padding=[(0, 0), (3, 3)],
                     name="branch7x7dbl_3")(bd)
    bd = BasicConv2d(c7, (7, 1), padding=[(3, 3), (0, 0)],
                     name="branch7x7dbl_4")(bd)
    bd = BasicConv2d(192, (1, 7), padding=[(0, 0), (3, 3)],
                     name="branch7x7dbl_5")(bd)
    bp = _avg_pool(x, 3, 1, 1, count_include_pad=False)
    bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):

  @nn.compact
  def __call__(self, x):
    b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
    b3 = BasicConv2d(320, (3, 3), strides=2, name="branch3x3_2")(b3)
    b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
    b7 = BasicConv2d(192, (1, 7), padding=[(0, 0), (3, 3)],
                     name="branch7x7x3_2")(b7)
    b7 = BasicConv2d(192, (7, 1), padding=[(3, 3), (0, 0)],
                     name="branch7x7x3_3")(b7)
    b7 = BasicConv2d(192, (3, 3), strides=2, name="branch7x7x3_4")(b7)
    bp = _max_pool(x, 3, 2)
    return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
  # FID variant: Mixed_7b uses avg-pool (count-corrected), Mixed_7c
  # uses max-pool in the pool branch (reference fid.py:236-239).
  pool_type: str = "avg"

  @nn.compact
  def __call__(self, x):
    b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
    b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
    b3a = BasicConv2d(384, (1, 3), padding=[(0, 0), (1, 1)],
                      name="branch3x3_2a")(b3)
    b3b = BasicConv2d(384, (3, 1), padding=[(1, 1), (0, 0)],
                      name="branch3x3_2b")(b3)
    b3 = jnp.concatenate([b3a, b3b], axis=-1)
    bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
    bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
    bda = BasicConv2d(384, (1, 3), padding=[(0, 0), (1, 1)],
                      name="branch3x3dbl_3a")(bd)
    bdb = BasicConv2d(384, (3, 1), padding=[(1, 1), (0, 0)],
                      name="branch3x3dbl_3b")(bd)
    bd = jnp.concatenate([bda, bdb], axis=-1)
    if self.pool_type == "avg":
      bp = _avg_pool(x, 3, 1, 1, count_include_pad=False)
    else:
      bp = _max_pool(x, 3, 1, padding=1)
    bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
  """Returns (pool3 2048-d features, logits)."""
  num_classes: int = 1008  # FID-variant head.

  @nn.compact
  def __call__(self, x, train=False):
    # x: (B, 299, 299, 3) in [-1, 1].
    x = BasicConv2d(32, (3, 3), strides=2, name="Conv2d_1a_3x3")(x)
    x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
    x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
    x = _max_pool(x, 3, 2)
    x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
    x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
    x = _max_pool(x, 3, 2)
    x = InceptionA(32, name="Mixed_5b")(x)
    x = InceptionA(64, name="Mixed_5c")(x)
    x = InceptionA(64, name="Mixed_5d")(x)
    x = InceptionB(name="Mixed_6a")(x)
    x = InceptionC(128, name="Mixed_6b")(x)
    x = InceptionC(160, name="Mixed_6c")(x)
    x = InceptionC(160, name="Mixed_6d")(x)
    x = InceptionC(192, name="Mixed_6e")(x)
    x = InceptionD(name="Mixed_7a")(x)
    x = InceptionE(pool_type="avg", name="Mixed_7b")(x)
    x = InceptionE(pool_type="max", name="Mixed_7c")(x)
    pool3 = jnp.mean(x, axis=(1, 2))  # (B, 2048)
    logits = nn.Dense(self.num_classes, name="fc")(pool3)
    return pool3, logits


@functools.lru_cache(maxsize=1)
def _cached_model():
  return InceptionV3()


def init_params(rng=None, weights_path=None):
  """Random-init params, or loads a converted .npz if given."""
  model = _cached_model()
  if weights_path:
    return model, load_params(weights_path)
  rng = rng if rng is not None else jax.random.PRNGKey(0)
  variables = model.init(rng, jnp.zeros((1, 299, 299, 3)))
  return model, variables


def load_params(path):
  from small_vision_tpu.utils.trees import recover_tree
  with np.load(path) as data:
    keys, values = zip(*data.items())
  tree = recover_tree(keys, values)
  return jax.tree.map(jnp.asarray, tree)
