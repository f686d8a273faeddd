"""TFDS-backed source (gated: tensorflow_datasets is optional).

Parity target: /root/reference/big_vision/datasets/tfds.py — per-process
split via `tfds.even_splits`, skip-decode so JPEG bytes reach our own host
pp ops, deterministic per-epoch reshuffling.
"""

import functools
from typing import Iterator

import jax

from small_vision_tpu.data import core

try:
  import tensorflow_datasets as tfds
  _HAS_TFDS = True
except ImportError:
  _HAS_TFDS = False


@functools.lru_cache(maxsize=None)
def _builder(name: str, data_dir):
  return tfds.builder(name, data_dir=data_dir, try_gcs=True)


class DataSource(core.DataSource):

  def __init__(self, *, name: str, split: str = "train", data_dir=None,
               skip_decode: bool = True):
    if not _HAS_TFDS:
      raise ImportError(
          "tensorflow_datasets is not installed in this image; use the "
          "'synthetic' or 'arrays' data source, or install tfds.")
    self.builder = _builder(name, data_dir)
    self.split = split
    self.skip_decode = skip_decode
    self._total = self.builder.info.splits[split].num_examples

  @property
  def total_examples(self) -> int:
    return self._total

  def peek(self) -> dict:
    """First example of the FULL split — available even on a process whose
    even_splits shard is empty (eval padding-template protocol)."""
    decoders = ({"image": tfds.decode.SkipDecoding()}
                if self.skip_decode else None)
    ds = self.builder.as_dataset(
        split=tfds.core.ReadInstruction(self.split, from_=0, to=1,
                                        unit="abs"),
        shuffle_files=False, decoders=decoders)
    for ex in ds.as_numpy_iterator():
      return dict(ex)
    raise ValueError(f"split {self.split!r} is empty")

  def examples(self, *, ordered: bool = False, seed: int = 0,
               epoch: int = 0) -> Iterator[dict]:
    sub = tfds.even_splits(
        self.split, jax.process_count())[jax.process_index()]
    decoders = None
    if self.skip_decode:
      decoders = {"image": tfds.decode.SkipDecoding()}
    read_config = tfds.ReadConfig(
        shuffle_seed=(None if ordered else seed + epoch),
        skip_prefetch=True, try_autocache=False)
    ds = self.builder.as_dataset(
        split=sub, shuffle_files=not ordered, decoders=decoders,
        read_config=read_config)
    for ex in ds.as_numpy_iterator():
      yield dict(ex)
