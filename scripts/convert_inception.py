"""Converts pytorch-fid InceptionV3 weights to our Flax .npz layout.

Run ONCE on a machine with network + torch:
  pip install torch
  python scripts/convert_inception.py inception_fid.npz

Downloads mseitzer/pytorch-fid's FID-standard weights (pt_inception-2015-
12-05) and writes a flat .npz keyed by the slash-paths
`small_vision_tpu.evaluators.inception.InceptionV3` expects
(params/... and batch_stats/...).
"""

import sys

import numpy as np

FID_WEIGHTS_URL = ("https://github.com/mseitzer/pytorch-fid/releases/"
                   "download/fid_weights/pt_inception-2015-12-05-6726825d.pth")

# torch module path prefix → our flax module name.
BLOCK_MAP = {
    "Conv2d_1a_3x3": "Conv2d_1a_3x3", "Conv2d_2a_3x3": "Conv2d_2a_3x3",
    "Conv2d_2b_3x3": "Conv2d_2b_3x3", "Conv2d_3b_1x1": "Conv2d_3b_1x1",
    "Conv2d_4a_3x3": "Conv2d_4a_3x3",
    "Mixed_5b": "Mixed_5b", "Mixed_5c": "Mixed_5c", "Mixed_5d": "Mixed_5d",
    "Mixed_6a": "Mixed_6a", "Mixed_6b": "Mixed_6b", "Mixed_6c": "Mixed_6c",
    "Mixed_6d": "Mixed_6d", "Mixed_6e": "Mixed_6e",
    "Mixed_7a": "Mixed_7a", "Mixed_7b": "Mixed_7b", "Mixed_7c": "Mixed_7c",
    "fc": "fc",
}


def convert(state_dict):
  out = {}
  for name, tensor in state_dict.items():
    t = tensor.numpy() if hasattr(tensor, "numpy") else np.asarray(tensor)
    parts = name.split(".")
    if parts[0] == "fc":
      if parts[1] == "weight":
        out["params/fc/kernel"] = t.T
      else:
        out["params/fc/bias"] = t
      continue
    # e.g. Mixed_5b.branch1x1.conv.weight / .bn.{weight,bias,running_*}
    block = BLOCK_MAP.get(parts[0])
    if block is None:
      print(f"skip {name}")
      continue
    sub = "/".join(parts[1:-1])  # branch path + conv|bn
    leaf = parts[-1]
    prefix = f"{block}/{sub}".rstrip("/")
    if leaf == "weight" and parts[-2] == "conv":
      # torch conv OIHW → flax HWIO
      out[f"params/{prefix}/kernel"] = t.transpose(2, 3, 1, 0)
    elif parts[-2] == "bn":
      key = {"weight": ("params", "scale"), "bias": ("params", "bias"),
             "running_mean": ("batch_stats", "mean"),
             "running_var": ("batch_stats", "var")}.get(leaf)
      if key:
        col, leafname = key
        out[f"{col}/{prefix}/{leafname}"] = t
    else:
      print(f"skip {name}")
  return out


def main(out_path="inception_fid.npz"):
  import torch
  sd = torch.hub.load_state_dict_from_url(FID_WEIGHTS_URL,
                                          map_location="cpu")
  flat = convert(sd)
  np.savez(out_path, **flat)
  print(f"wrote {len(flat)} arrays to {out_path}")


if __name__ == "__main__":
  main(*sys.argv[1:])
