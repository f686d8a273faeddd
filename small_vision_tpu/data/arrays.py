"""Random-access array-backed source: .npy/.npz memmaps on disk.

TPU-native shuffle story (SURVEY.md §7 risk item): instead of the
reference's 120 GB tf.data RAM cache + 250k shuffle buffer
(configs/ae_i1k.py:61-62), a random-access memmap + a per-epoch index
permutation gives exact global shuffling at zero RAM cost.

Layout — either a single-split dir or a parent of split dirs:

  {root}/images.npy  (N,H,W,C) uint8 memmap [+ labels.npy (N,) int]
  {root}/{split}/images.npy [+ labels.npy]   (multi-split parent)

With a parent root, `data=arrays:/data/arrays` serves BOTH the train loop
(split="train") and the config's default evaluators (split="validation",
fewshot "train[:100000]") — the same wiring the TFDS source gets from
`tfds.even_splits` (reference datasets/tfds.py:31-32). Splits accept the
tfds subsplit syntax `name[lo:hi]` with absolute or percent bounds
(out-of-range bounds clamp). Use `write_arrays()` to build a split dir.
"""

import os
import re
from typing import Iterator, Optional

import numpy as np

from small_vision_tpu.data import core

_SPLIT_RE = re.compile(r"^([\w-]+)(?:\[([^\[\]]*)\])?$")


def write_arrays(root: str, images: np.ndarray,
                 labels: Optional[np.ndarray] = None):
  os.makedirs(root, exist_ok=True)
  np.save(os.path.join(root, "images.npy"), images)
  if labels is not None:
    np.save(os.path.join(root, "labels.npy"), labels)


def parse_split(split: str):
  """'train[:100000]' → ('train', bound_fn) with tfds subsplit semantics.

  Returns (base_name, f(n) -> (lo, hi)) where bounds may be absolute
  example counts or percents ('train[:10%]'); omitted bounds default to the
  ends, negative absolutes count from the end, out-of-range bounds clamp.
  """
  m = _SPLIT_RE.match(split)
  if not m:
    raise ValueError(f"Malformed split spec {split!r} "
                     "(expected e.g. 'train', 'validation[:1000]', "
                     "'train[50%:]').")
  base, sl = m.group(1), m.group(2)
  if sl is not None and sl.count(":") != 1:
    raise ValueError(f"Split slice must be 'lo:hi' in {split!r}")

  def one(bound, n, default):
    bound = bound.strip()
    if not bound:
      return default
    if bound.endswith("%"):
      pct = float(bound[:-1])
      if not 0 <= pct <= 100:
        raise ValueError(f"Percent bound out of [0, 100] in {split!r}")
      return int(n * pct / 100)
    i = int(bound)
    return max(0, min(n, i + n if i < 0 else i))

  def bounds(n):
    if sl is None:
      return 0, n
    parts = sl.split(":")
    lo, hi = one(parts[0], n, 0), one(parts[1], n, n)
    return lo, max(lo, hi)

  return base, bounds


class DataSource(core.DataSource):

  def __init__(self, *, root: str, split: str = "train", split_frac=None):
    base, bounds = parse_split(split)
    sub = os.path.join(root, base)
    if os.path.exists(os.path.join(sub, "images.npy")):
      root = sub  # Multi-split parent: {root}/{split}/images.npy.
    elif not os.path.exists(os.path.join(root, "images.npy")):
      raise FileNotFoundError(
          f"No arrays data at {root!r}: expected images.npy there (single "
          f"split) or under {sub!r} (multi-split parent). Build one with "
          "data.arrays.write_arrays or scripts/ingest_imagenet_arrays.py.")
    elif split_frac is None and base not in (
        "train", os.path.basename(os.path.normpath(root))):
      # A single-split dir serves only its own split (or the default
      # "train", or an explicit split_frac slice under any name): silently
      # returning the same data for OTHER split names would leak train into
      # eval.
      raise ValueError(
          f"arrays source at {root!r} holds a single split; got "
          f"split={split!r}. Point the config at a multi-split parent dir "
          f"(with a {base}/ subdir) or at the per-split dir itself.")
    self.images = np.load(os.path.join(root, "images.npy"), mmap_mode="r")
    labels_path = os.path.join(root, "labels.npy")
    self.labels = (np.load(labels_path, mmap_mode="r")
                   if os.path.exists(labels_path) else None)
    n = self.images.shape[0]
    if split_frac is not None:
      lo, hi = int(n * split_frac[0]), int(n * split_frac[1])
    else:
      lo, hi = bounds(n)
    self._lo, self._hi = lo, hi

  @property
  def total_examples(self) -> int:
    return self._hi - self._lo

  @property
  def num_classes(self):
    """Dataset-level class count (max label + 1) — lets the fewshot
    evaluator size its one-hot solver per transfer dataset instead of
    assuming 1000 (reference fewshot_lsr builds from DatasetInfo)."""
    if self.labels is None:
      return None
    if not hasattr(self, "_num_classes"):
      self._num_classes = int(np.max(self.labels)) + 1
    return self._num_classes

  def _example(self, i):
    ex = {"image": np.asarray(self.images[i]), "_id": np.int64(i)}
    if self.labels is not None:
      ex["label"] = np.int64(self.labels[i])
    return ex

  @property
  def num_local_examples(self) -> int:
    start, stop = core.even_split_range(self.total_examples)
    return stop - start

  def _epoch_index(self, ordered, seed, epoch):
    # Even split with the remainder spread (tfds.even_splits semantics) so
    # eval covers every example and per-host counts differ by at most one.
    start, stop = core.even_split_range(self.total_examples)
    idx = np.arange(self._lo + start, self._lo + stop)
    if not ordered:
      np.random.default_rng((seed, epoch)).shuffle(idx)
    return idx

  def examples(self, *, ordered: bool = False, seed: int = 0,
               epoch: int = 0) -> Iterator[dict]:
    for i in self._epoch_index(ordered, seed, epoch):
      yield self._example(i)

  def examples_from(self, *, seed: int, epoch: int,
                    start: int) -> Iterator[dict]:
    for i in self._epoch_index(False, seed, epoch)[start:]:
      yield self._example(i)

  def peek(self) -> dict:
    return self._example(self._lo)  # global first example, on every process
