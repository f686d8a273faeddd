"""Downloads the TFDS datasets used by train/transfer evals.

Parity target: /root/reference/big_vision/tools/download_tfds_datasets.py.
Requires tensorflow_datasets + network; run on a CPU machine once, then
point TFDS_DATA_DIR at the result.

  python -m small_vision_tpu.tools.download_tfds_datasets [names...]
"""

import sys

DEFAULT_DATASETS = [
    "cifar10", "cifar100", "oxford_iiit_pet", "oxford_flowers102",
    "food101", "dtd", "cars196", "caltech101", "sun397", "imagenet2012",
]


def main(names=None):
  import tensorflow_datasets as tfds
  for name in names or DEFAULT_DATASETS:
    print(f"Downloading {name}…", flush=True)
    tfds.load(name, download=True)


if __name__ == "__main__":
  main(sys.argv[1:] or None)
