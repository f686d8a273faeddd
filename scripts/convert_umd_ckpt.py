"""Convert UMD checkpoints between the reference layout and this framework.

Reference checkpoints (big_vision tensorstore dirs or flat .npz from
models/vit.py:381-440 `load()`) use diverged param names/layouts
(`image_mask_embedding`→`mask_token`, `label_emb`→`label_embed`,
ConvTranspose `final_conv`→Dense `head`, scan block naming). This script
maps a flat-npz param dump in either direction; the mapping itself lives in
small_vision_tpu/utils/convert_ref.py and is covered by forward-parity tests
(tests/test_reference_parity.py).

Usage:
  python scripts/convert_umd_ckpt.py --in ref_params.npz --out sv_params.npz \
      --direction ref_to_ours --patch 4
  python scripts/convert_umd_ckpt.py --in sv_params.npz --out ref_params.npz \
      --direction ours_to_ref --patch 4

The .npz holds one entry per leaf with '/'-joined tree paths as keys
(tensorstore's '~' separators are accepted and normalized).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from small_vision_tpu.utils import convert_ref  # noqa: E402


def load_flat_npz(path):
  with np.load(path) as f:
    flat = {k.replace("~", "/"): f[k] for k in f.files}
  return convert_ref._unflatten(flat)


def save_flat_npz(path, tree):
  flat = convert_ref._flatten(convert_ref._to_pure_dict(tree))
  np.savez(path, **flat)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--in", dest="inp", required=True)
  ap.add_argument("--out", required=True)
  ap.add_argument("--direction", required=True,
                  choices=["ref_to_ours", "ours_to_ref"])
  ap.add_argument("--patch", type=int, default=4,
                  help="patch size (the '4' in B/4)")
  args = ap.parse_args()

  params = load_flat_npz(args.inp)
  if args.direction == "ref_to_ours":
    out = convert_ref.ref_to_ours(params, patch_size=args.patch)
  else:
    out = convert_ref.ours_to_ref(params, patch_size=args.patch)
  save_flat_npz(args.out, out)
  n = len(convert_ref._flatten(out))
  print(f"wrote {args.out}: {n} leaves ({args.direction})")


if __name__ == "__main__":
  main()
