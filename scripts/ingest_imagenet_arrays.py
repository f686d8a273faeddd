"""Build the `arrays:` memmap dataset from raw ImageNet (dir tree or TFDS).

The flagship shuffle story (data/arrays.py; SURVEY §7 "tf.data removal" risk
item) wants `{root}/images.npy` (N, S, S, 3) uint8 + `{root}/labels.npy`
(N,) int64 on disk. This tool ingests either

  - a class-directory tree (`--src dir:/data/imagenet/train`, one subdir per
    class, labels = sorted-subdir index; a flat dir of images → no labels), or
  - a TFDS dataset (`--src tfds:imagenet2012 --split train`), when tfds is
    installed,

decoding and resizing in a thread pool (the native libjpeg loader releases
the GIL) straight into a numpy memmap — constant RAM at any N.

Resize modes:
  center  — resize_small(S) + central_crop(S)  (the reference eval pp;
            matches pp/ops_image.py semantics bit-for-bit)
  stretch — resize((S, S)) ignoring aspect ratio

Usage:
  python scripts/ingest_imagenet_arrays.py --src dir:/data/train \
      --out /data/arrays/train --size 64 --mode center --workers 32
Then train with `--config ae_i1k.py:data=arrays:/data/arrays/train`.
"""

import argparse
import concurrent.futures
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from small_vision_tpu.pp.builder import get_preprocess_fn  # noqa: E402
import small_vision_tpu.pp.ops_image  # noqa: E402,F401

_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".JPEG", ".JPG", ".PNG")


def list_dir_tree(root):
  """Returns (paths, labels_or_None, class_names_or_None)."""
  subdirs = sorted(d for d in os.listdir(root)
                   if os.path.isdir(os.path.join(root, d)))
  if subdirs:
    paths, labels = [], []
    for i, d in enumerate(subdirs):
      for f in sorted(os.listdir(os.path.join(root, d))):
        if f.endswith(_EXTS):
          paths.append(os.path.join(root, d, f))
          labels.append(i)
    return paths, np.asarray(labels, np.int64), subdirs
  paths = [os.path.join(root, f) for f in sorted(os.listdir(root))
           if f.endswith(_EXTS)]
  return paths, None, None


def make_pp(size, mode):
  spec = {"center": f"decode|resize_small({size})|central_crop({size})",
          "stretch": f"decode|resize(({size}, {size}))"}[mode]
  host_fn, device_fn = get_preprocess_fn(spec)
  assert device_fn is None
  return host_fn


def ingest_paths(paths, labels, out, size, mode="center", workers=16,
                 class_names=None):
  """Decode+resize `paths` into {out}/images.npy (+labels.npy, meta.json)."""
  os.makedirs(out, exist_ok=True)
  n = len(paths)
  assert n > 0, "no input images found"
  images = np.lib.format.open_memmap(
      os.path.join(out, "images.npy"), mode="w+", dtype=np.uint8,
      shape=(n, size, size, 3))
  host_fn = make_pp(size, mode)

  def work(i):
    with open(paths[i], "rb") as f:
      raw = f.read()
    img = host_fn({"image": raw})["image"]
    if img.ndim == 2:  # grayscale
      img = np.stack([img] * 3, axis=-1)
    images[i] = img
    return i

  done = 0
  with concurrent.futures.ThreadPoolExecutor(workers) as ex:
    for _ in ex.map(work, range(n)):
      done += 1
      if done % 10_000 == 0:
        print(f"  {done}/{n}", flush=True)
  images.flush()

  if labels is not None:
    np.save(os.path.join(out, "labels.npy"), np.asarray(labels, np.int64))
  with open(os.path.join(out, "meta.json"), "w") as f:
    json.dump({"n": n, "size": size, "mode": mode,
               "class_names": class_names}, f)
    f.write("\n")
  print(f"wrote {out}: {n} images @ {size}x{size}"
        f"{' + labels' if labels is not None else ''}")


def ingest_tfds(name, split, out, size, mode, workers):
  import tensorflow_datasets as tfds  # gated: not installed everywhere
  builder = tfds.builder(name)
  ds = builder.as_dataset(split=split, shuffle_files=False,
                          decoders={"image": tfds.decode.SkipDecoding()})
  n = builder.info.splits[split].num_examples
  os.makedirs(out, exist_ok=True)
  images = np.lib.format.open_memmap(
      os.path.join(out, "images.npy"), mode="w+", dtype=np.uint8,
      shape=(n, size, size, 3))
  labels = np.zeros((n,), np.int64)
  host_fn = make_pp(size, mode)

  def work(args):
    i, (raw, label) = args
    img = host_fn({"image": raw})["image"]
    if img.ndim == 2:
      img = np.stack([img] * 3, axis=-1)
    images[i] = img
    labels[i] = label

  def gen():
    for i, ex in enumerate(tfds.as_numpy(ds)):
      yield i, (ex["image"], ex.get("label", -1))

  with concurrent.futures.ThreadPoolExecutor(workers) as ex:
    for i, _ in enumerate(ex.map(work, gen())):
      if (i + 1) % 10_000 == 0:
        print(f"  {i + 1}/{n}", flush=True)
  images.flush()
  np.save(os.path.join(out, "labels.npy"), labels)
  with open(os.path.join(out, "meta.json"), "w") as f:
    json.dump({"n": n, "size": size, "mode": mode, "tfds": name,
               "split": split}, f)
    f.write("\n")
  print(f"wrote {out}: {n} images @ {size}x{size} + labels")


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--src", required=True,
                  help="dir:/path/to/class-tree or tfds:imagenet2012")
  ap.add_argument("--out", required=True)
  ap.add_argument("--size", type=int, default=64)
  ap.add_argument("--mode", default="center", choices=["center", "stretch"])
  ap.add_argument("--split", default="train", help="TFDS split")
  ap.add_argument("--workers", type=int, default=16)
  args = ap.parse_args()

  kind, _, src = args.src.partition(":")
  if kind == "dir":
    paths, labels, names = list_dir_tree(src)
    ingest_paths(paths, labels, args.out, args.size, args.mode,
                 args.workers, class_names=names)
  elif kind == "tfds":
    ingest_tfds(src, args.split, args.out, args.size, args.mode,
                args.workers)
  else:
    raise SystemExit(f"unknown --src kind {kind!r} (use dir: or tfds:)")


if __name__ == "__main__":
  main()
