"""Random-access array-backed source: .npy/.npz memmaps on disk.

TPU-native shuffle story (SURVEY.md §7 risk item): instead of the
reference's 120 GB tf.data RAM cache + 250k shuffle buffer
(configs/ae_i1k.py:61-62), a random-access memmap + a per-epoch index
permutation gives exact global shuffling at zero RAM cost.

Layout: `{root}/images.npy` (N,H,W,C) uint8 memmap and optional
`{root}/labels.npy` (N,) int. Use `write_arrays()` to build one.
"""

import os
from typing import Iterator, Optional

import numpy as np

from small_vision_tpu.data import core


def write_arrays(root: str, images: np.ndarray,
                 labels: Optional[np.ndarray] = None):
  os.makedirs(root, exist_ok=True)
  np.save(os.path.join(root, "images.npy"), images)
  if labels is not None:
    np.save(os.path.join(root, "labels.npy"), labels)


class DataSource(core.DataSource):

  def __init__(self, *, root: str, split: str = "train", split_frac=None):
    # An arrays dir holds ONE split (build separate dirs per split, or pass
    # split_frac for a fractional slice). Accepting an unknown split name and
    # silently returning the same data would leak train into eval, so any
    # split other than the dir's own is an error unless split_frac is given.
    if split_frac is None and split != "train":
      raise ValueError(
          f"arrays source at {root!r} holds a single split; got "
          f"split={split!r}. Point the config at a per-split root "
          f"(e.g. {root}/validation) or pass split_frac=(lo, hi).")
    self.images = np.load(os.path.join(root, "images.npy"), mmap_mode="r")
    labels_path = os.path.join(root, "labels.npy")
    self.labels = (np.load(labels_path, mmap_mode="r")
                   if os.path.exists(labels_path) else None)
    n = self.images.shape[0]
    # Optional fractional split, e.g. split_frac=(0.0, 0.99) for train[:99%].
    lo, hi = split_frac if split_frac else (0.0, 1.0)
    self._lo, self._hi = int(n * lo), int(n * hi)

  @property
  def total_examples(self) -> int:
    return self._hi - self._lo

  def _example(self, i):
    ex = {"image": np.asarray(self.images[i]), "_id": np.int64(i)}
    if self.labels is not None:
      ex["label"] = np.int64(self.labels[i])
    return ex

  def examples(self, *, ordered: bool = False, seed: int = 0,
               epoch: int = 0) -> Iterator[dict]:
    # Even split with the remainder spread (tfds.even_splits semantics) so
    # eval covers every example and per-host counts differ by at most one.
    start, stop = core.even_split_range(self.total_examples)
    idx = np.arange(self._lo + start, self._lo + stop)
    if not ordered:
      np.random.default_rng((seed, epoch)).shuffle(idx)
    for i in idx:
      yield self._example(i)

  def peek(self) -> dict:
    return self._example(self._lo)  # global first example, on every process
