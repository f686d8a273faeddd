"""Precomputed VAE-latent source (TFRecords of 32×32×4 float latents).

Parity target: /root/reference/big_vision/vae_utils.py:15-42 — records hold
`image` = flat float32 latent (32·32·4) and `label` int64; plus a
`precompute_latents` writer mirroring the reference's __main__ (4 encoded
views per example, :96-193).

Reading uses TFRecordDataset (host-only; tf never touches devices) but
shuffling stays index-free streaming like the reference. For a fully
random-access variant, precompute into the `arrays` source instead.
"""

import glob as globlib
from typing import Iterator

import jax
import numpy as np

from small_vision_tpu.data import core

LATENT_SHAPE = (32, 32, 4)


class DataSource(core.DataSource):

  def __init__(self, *, pattern: str, num_examples: int = None,
               split: str = "train"):
    del split
    self.files = sorted(globlib.glob(pattern))
    assert self.files, f"No TFRecord files match {pattern!r}"
    if num_examples is None:
      num_examples = sum(1 for _ in self._raw_records())
    self._total = num_examples

  def _raw_records(self):
    import tensorflow as tf
    tf.config.set_visible_devices([], "GPU")
    return tf.data.TFRecordDataset(self.files).as_numpy_iterator()

  @property
  def total_examples(self) -> int:
    return self._total

  def examples(self, *, ordered: bool = False, seed: int = 0,
               epoch: int = 0) -> Iterator[dict]:
    import tensorflow as tf
    tf.config.set_visible_devices([], "GPU")
    dim = int(np.prod(LATENT_SHAPE))
    spec = {"image": tf.io.FixedLenFeature([dim], tf.float32),
            "label": tf.io.FixedLenFeature([], tf.int64)}
    files = list(self.files)
    if not ordered:
      np.random.default_rng((seed, epoch)).shuffle(files)
    ds = tf.data.TFRecordDataset(files)
    if not ordered:
      ds = ds.shuffle(50_000, seed=seed + epoch)
    ds = ds.map(lambda ex: tf.io.parse_single_example(ex, spec),
                num_parallel_calls=tf.data.AUTOTUNE)
    # Per-process shard.
    ds = ds.shard(jax.process_count(), jax.process_index())
    for i, ex in enumerate(ds.as_numpy_iterator()):
      yield {"image": ex["image"].reshape(LATENT_SHAPE).astype(np.float32),
             "label": np.int64(ex["label"]), "_id": np.int64(i)}

  def peek(self) -> dict:
    """First record GLOBALLY (unsharded) — available on every process even
    when `ds.shard` leaves this one empty (eval padding-template protocol)."""
    import tensorflow as tf
    tf.config.set_visible_devices([], "GPU")
    dim = int(np.prod(LATENT_SHAPE))
    spec = {"image": tf.io.FixedLenFeature([dim], tf.float32),
            "label": tf.io.FixedLenFeature([], tf.int64)}
    for raw in tf.data.TFRecordDataset(self.files[:1]).as_numpy_iterator():
      ex = tf.io.parse_single_example(raw, spec)
      return {"image": ex["image"].numpy().reshape(LATENT_SHAPE)
                  .astype(np.float32),
              "label": np.int64(ex["label"].numpy()), "_id": np.int64(0)}
    raise ValueError(f"no records in {self.files[0]!r}")


def precompute_latents(source, vae_apply, out_pattern: str,
                       batch_size: int = 256, views: int = 4,
                       examples_per_shard: int = 50_000):
  """Encodes a pixel source into latent TFRecords (reference __main__).

  `vae_apply(images_f32, rng) -> latents` is a jitted encode closure; each
  example is encoded `views` times with different noise draws.
  """
  import tensorflow as tf
  tf.config.set_visible_devices([], "GPU")

  def serialize(latent, label):
    feature = {
        "image": tf.train.Feature(float_list=tf.train.FloatList(
            value=np.asarray(latent, np.float32).ravel())),
        "label": tf.train.Feature(int64_list=tf.train.Int64List(
            value=[int(label)])),
    }
    return tf.train.Example(
        features=tf.train.Features(feature=feature)).SerializeToString()

  rng = jax.random.PRNGKey(0)
  shard, written, writer = 0, 0, None
  for view in range(views):
    batch_imgs, batch_labels = [], []
    for ex in source.examples(ordered=True):
      batch_imgs.append(ex["image"])
      batch_labels.append(ex.get("label", 0))
      if len(batch_imgs) == batch_size:
        rng, key = jax.random.split(rng)
        latents = np.asarray(jax.device_get(
            vae_apply(np.stack(batch_imgs), key)))
        for z, y in zip(latents, batch_labels):
          if writer is None or written >= examples_per_shard:
            if writer:
              writer.close()
            writer = tf.io.TFRecordWriter(f"{out_pattern}-{shard:05d}.tfrecord")
            shard += 1
            written = 0
          writer.write(serialize(z, y))
          written += 1
        batch_imgs, batch_labels = [], []
  if writer:
    writer.close()
