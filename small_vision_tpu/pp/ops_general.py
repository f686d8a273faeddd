"""Generic preprocessing ops (reference: big_vision/pp/ops_general.py).

Host ops manipulate per-example numpy dicts; device ops run batched in the
fused post-transfer jit program.
"""

import numpy as np

import jax.numpy as jnp

from small_vision_tpu.pp.registry import Registry
from small_vision_tpu.pp.utils import InKeyOutKey


@Registry.register("value_range", stage="device")
def get_value_range(vmin: float = -1.0, vmax: float = 1.0,
                    in_min: float = 0.0, in_max: float = 255.0,
                    clip_values: bool = False, key: str = "image"):
  """Affine rescale from [in_min,in_max] to [vmin,vmax] (ops_general.py:30).

  Device-side: fuses with flip/normalize into one VPU pass over the batch.
  """

  def _value_range(batch, rng):
    del rng
    img = batch[key].astype(jnp.float32)
    img = vmin + (img - in_min) / (in_max - in_min) * (vmax - vmin)
    if clip_values:
      img = jnp.clip(img, vmin, vmax)
    batch[key] = img
    return batch
  return _value_range


@Registry.register("onehot", stage="device")
def get_onehot(depth: int, key: str = "labels", key_result: str = None,
               multi: bool = True, on: float = 1.0, off: float = 0.0):
  """Integer labels → one-hot (reference ops_general.py:103)."""

  def _onehot(batch, rng):
    del rng
    labels = batch[key].astype(jnp.int32)
    if labels.ndim > 1 and multi:
      # Multi-label: max-reduce the one-hots of each label index.
      oh = jnp.max(
          jnp.eye(depth, dtype=jnp.float32)[labels], axis=-2)
      oh = oh * (on - off) + off
    else:
      oh = (labels[..., None] == jnp.arange(depth))
      oh = jnp.where(oh, on, off).astype(jnp.float32)
    batch[key_result or key] = oh
    return batch
  return _onehot


@Registry.register("keep", stage="any")
def get_keep(*keys):
  """Keeps only the named keys (+ pipeline-internal '_' keys)."""

  def _keep(data):
    return {k: v for k, v in data.items()
            if k in keys or k.startswith("_")}
  return _keep


@Registry.register("drop", stage="any")
def get_drop(*keys):

  def _drop(data):
    return {k: v for k, v in data.items() if k not in keys}
  return _drop


@Registry.register("copy", stage="any")
def get_copy(inkey: str, outkey: str):

  def _copy(data):
    data[outkey] = np.copy(data[inkey]) if isinstance(
        data[inkey], np.ndarray) else data[inkey]
    return data
  return _copy


@Registry.register("concat")
def get_concat(inkeys, outkey, axis=-1):
  """Concatenates several tensors into one key (reference ops_general:184)."""

  def _concat(data):
    data[outkey] = np.concatenate([np.asarray(data[k]) for k in inkeys],
                                  axis=axis)
    return data
  return _concat


@Registry.register("setdefault")
def get_setdefault(key, value):
  """Inserts a constant if the key is missing (e.g. labels for unlabeled)."""

  def _setdefault(data):
    if key not in data:
      data[key] = np.asarray(value)
    return data
  return _setdefault


@Registry.register("mixup", stage="device")
def get_mixup(p: float = 0.1, fold_in=("image",), alpha_key: str = "_mixup_a"):
  """Batch-level mixup on device (reference utils.py:1150 get_mixup):
  draws a ~Beta(p, p) via two gammas and mixes each tensor with its
  roll-by-one neighbor."""
  import jax

  def _mixup(batch, rng):
    a = jax.random.beta(rng, p, p)
    a = jnp.maximum(a, 1.0 - a)  # stay close to identity like the reference
    for k in fold_in:
      x = batch[k]
      batch[k] = a * x + (1.0 - a) * jnp.roll(x, 1, axis=0)
    batch[alpha_key] = a
    return batch
  return _mixup


@Registry.register("lookup")
def get_lookup(mapping, npzkey: str = "fnames", sep: str = None,
               key=None, inkey=None, outkey=None):
  """String→index lookup from a mapping file or dict."""
  key_kw = dict(key=key, inkey=inkey, outkey=outkey)
  if isinstance(mapping, str):
    if mapping.endswith(".npz"):
      keys = [k.decode() if hasattr(k, "decode") else str(k)
              for k in np.load(mapping)[npzkey]]
      table = {k: i for i, k in enumerate(keys)}
    else:
      with open(mapping) as f:
        lines = f.read().splitlines()
      if sep:
        table = dict(line.split(sep, 1) for line in lines)
        table = {k: int(v) for k, v in table.items()}
      else:
        table = {k: i for i, k in enumerate(lines)}
  else:
    table = dict(mapping)

  @InKeyOutKey(indefault="label", outdefault="label")
  def _lookup_factory():
    def _lookup(value, data):
      del data
      v = value.decode() if isinstance(value, bytes) else str(value)
      return np.asarray(table[v], np.int32)
    return _lookup
  return _lookup_factory(**{k: v for k, v in key_kw.items() if v})


@Registry.register("squeeze_last_dim")
@InKeyOutKey()
def get_squeeze_last_dim():

  def _squeeze(x, data):
    del data
    return np.squeeze(np.asarray(x), axis=-1)
  return _squeeze


@Registry.register("pad_to_shape")
@InKeyOutKey()
def get_pad_to_shape(shape, pad_value=0, where="after"):

  def _pad(x, data):
    del data
    x = np.asarray(x)
    pads = []
    for want, have in zip(shape, x.shape):
      diff = 0 if want is None else want - have
      assert diff >= 0, f"pad_to_shape: {x.shape} exceeds {shape}"
      pads.append({"after": (0, diff), "before": (diff, 0),
                   "both": (diff // 2, diff - diff // 2)}[where])
    return np.pad(x, pads, constant_values=pad_value)
  return _pad


@Registry.register("flatten")
def get_flatten():
  """Flattens nested dicts into slash-joined keys."""

  def _flatten(data):
    flat = {}
    def rec(prefix, d):
      for k, v in d.items():
        name = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
          rec(name, v)
        else:
          flat[name] = v
    rec("", data)
    return flat
  return _flatten


@Registry.register("reshape")
@InKeyOutKey()
def get_reshape(new_shape):
  new_shape = tuple(new_shape)

  def _reshape(x, data):
    del data
    return np.reshape(np.asarray(x), new_shape)
  return _reshape


@Registry.register("choice")
def get_choice(n="single", key="image", fewer_ok=False):
  """Picks n random entries along axis 0 of data[key] (host rng)."""

  def _choice(data):
    rng = data.get("_rng") or np.random.default_rng()
    arr = np.asarray(data[key])
    if n == "single":
      data[key] = arr[int(rng.integers(0, arr.shape[0]))]
    else:
      count = min(n, arr.shape[0]) if fewer_ok else n
      idx = rng.choice(arr.shape[0], size=count, replace=False)
      data[key] = arr[idx]
    return data
  return _choice
