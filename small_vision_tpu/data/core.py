"""Data-source API.

Parity target: /root/reference/big_vision/datasets/core.py — a `DataSource`
ABC with per-process splitting and a `get(name)` dispatcher. TPU-first
difference: sources are plain-Python iterables of numpy example dicts (no
tf.data graph); randomness/sharding is index-based so any random-access
source gets global shuffling without a 250k-element shuffle buffer.
"""

import abc
import importlib
import itertools
from typing import Iterator, Optional

import jax


def even_split_range(total: int, index=None, count=None):
  """[start, stop) of process `index`'s shard with the remainder spread.

  Matches `tfds.even_splits` semantics (reference datasets/tfds.py): the
  first `total % count` processes get one extra example, so every example
  is covered and per-process counts differ by at most one.
  """
  index = jax.process_index() if index is None else index
  count = jax.process_count() if count is None else count
  base, rem = divmod(total, count)
  start = index * base + min(index, rem)
  return start, start + base + (1 if index < rem else 0)


class DataSource(abc.ABC):
  """A (restartable) source of example dicts for one process's shard."""

  @abc.abstractmethod
  def examples(self, *, ordered: bool = False, seed: int = 0,
               epoch: int = 0) -> Iterator[dict]:
    """Yields this process's examples; shuffled per (seed, epoch) unless
    ordered."""

  @property
  @abc.abstractmethod
  def total_examples(self) -> int:
    """Global number of examples across all processes."""

  @property
  def num_examples_per_process(self) -> int:
    """MAX per-process example count — identical on every host.

    The eval protocol derives its per-host step count from this (reference
    input_pipeline.py:152-156 uses `max(num_ex_per_process)`), so it must
    be an upper bound shared by all hosts; with even splits that is
    ceil(total / process_count).
    """
    return -(-self.total_examples // jax.process_count())

  @property
  def num_local_examples(self) -> Optional[int]:
    """THIS process's exact per-epoch example count, or None if unknown.

    Random-access sources (arrays, synthetic) know it exactly and enable
    O(1) deterministic mid-epoch resume (`TrainIterator.start_step`);
    streaming sources (tfds, latents) return None and resume falls back to
    a fresh epoch-0 restart (the reference's tf.data behavior).
    """
    return None

  def examples_from(self, *, seed: int, epoch: int,
                    start: int) -> Iterator[dict]:
    """Yields epoch `epoch`'s local examples starting at position `start`.

    Default skips by consuming the iterator; random-access sources override
    with an index slice so resume costs no data reads.
    """
    return itertools.islice(
        self.examples(seed=seed, epoch=epoch), start, None)

  def peek(self) -> dict:
    """One RAW example from the GLOBAL dataset, available on EVERY process
    (even one whose local shard is empty) — used to build the zero-padding
    template for the eval protocol. Default: first local ordered example;
    sources whose local shard can be empty should override."""
    for ex in self.examples(ordered=True):
      return ex
    raise ValueError(
        f"{type(self).__name__}: local shard is empty and peek() is not "
        "overridden to fetch a global example — the multihost eval padding "
        "template cannot be built on this process.")


def get(name: str, **kw) -> DataSource:
  """Dispatches `name` to a source module.

  Names: "synthetic" (tests/bench), "tfds" (gated on tensorflow_datasets),
  "arrays" (npy/memmap folders), "arrays:<root>" (same, root inline — the
  config arg / evaluator-dataset string form), or "mod:<module>" for custom
  modules (the reference's `bv:` prefix, datasets/core.py:73-79).
  """
  if name.startswith("mod:"):
    module = importlib.import_module(name[4:])
    return module.DataSource(**kw)
  if name.startswith("arrays:"):
    return get("arrays", root=name[len("arrays:"):], **kw)
  known = {"synthetic": "small_vision_tpu.data.synthetic",
           "tfds": "small_vision_tpu.data.tfds_source",
           "arrays": "small_vision_tpu.data.arrays",
           "latents": "small_vision_tpu.data.latents"}
  # Dataset names like "imagenet2012" route to the TFDS source, matching the
  # reference's config strings (configs/ae_i1k.py:56-58).
  module_name = known.get(name, known["tfds"])
  module = importlib.import_module(module_name)
  if name not in known:
    kw = {"name": name, **kw}
  return module.DataSource(**kw)
