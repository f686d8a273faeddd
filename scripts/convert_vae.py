"""Converts diffusers SD-VAE weights to our Flax .npz layout.

Run ONCE on a machine with network + diffusers:
  pip install diffusers torch
  python scripts/convert_vae.py sd_vae.npz

Maps diffusers' AutoencoderKL (runwayml/stable-diffusion-v1-5, subfolder
"vae") onto `small_vision_tpu.models.vae.AutoencoderKL` names. Convs go
OIHW → HWIO; attention projections (1x1 convs in old checkpoints, linears in
new) become Dense kernels.
"""

import sys

import numpy as np


def _conv(t):
  return t.transpose(2, 3, 1, 0)


def convert(sd):
  out = {}

  def put(k, v):
    out[f"params/{k}"] = v

  def conv_pair(src, dst):
    put(f"{dst}/kernel", _conv(sd[f"{src}.weight"]))
    put(f"{dst}/bias", sd[f"{src}.bias"])

  def gn_pair(src, dst):
    put(f"{dst}/scale", sd[f"{src}.weight"])
    put(f"{dst}/bias", sd[f"{src}.bias"])

  def resnet(src, dst):
    gn_pair(f"{src}.norm1", f"{dst}/norm1")
    conv_pair(f"{src}.conv1", f"{dst}/conv1")
    gn_pair(f"{src}.norm2", f"{dst}/norm2")
    conv_pair(f"{src}.conv2", f"{dst}/conv2")
    if f"{src}.conv_shortcut.weight" in sd:
      conv_pair(f"{src}.conv_shortcut", f"{dst}/conv_shortcut")

  def attn(src, dst):
    gn_pair(f"{src}.group_norm", f"{dst}/group_norm")
    for th, fl in [("to_q", "to_q"), ("to_k", "to_k"), ("to_v", "to_v")]:
      w = sd[f"{src}.{th}.weight"]
      put(f"{dst}/{fl}/kernel", w.squeeze().T if w.ndim > 2 else w.T)
      put(f"{dst}/{fl}/bias", sd[f"{src}.{th}.bias"])
    w = sd[f"{src}.to_out.0.weight"]
    put(f"{dst}/to_out/kernel", w.squeeze().T if w.ndim > 2 else w.T)
    put(f"{dst}/to_out/bias", sd[f"{src}.to_out.0.bias"])

  # Encoder.
  conv_pair("encoder.conv_in", "encoder/conv_in")
  for i in range(4):
    for j in range(2):
      resnet(f"encoder.down_blocks.{i}.resnets.{j}",
             f"encoder/down_{i}_res_{j}")
    if i < 3:
      conv_pair(f"encoder.down_blocks.{i}.downsamplers.0.conv",
                f"encoder/down_{i}_downsample/conv")
  resnet("encoder.mid_block.resnets.0", "encoder/mid_res_0")
  attn("encoder.mid_block.attentions.0", "encoder/mid_attn")
  resnet("encoder.mid_block.resnets.1", "encoder/mid_res_1")
  gn_pair("encoder.conv_norm_out", "encoder/conv_norm_out")
  conv_pair("encoder.conv_out", "encoder/conv_out")

  # Decoder.
  conv_pair("decoder.conv_in", "decoder/conv_in")
  resnet("decoder.mid_block.resnets.0", "decoder/mid_res_0")
  attn("decoder.mid_block.attentions.0", "decoder/mid_attn")
  resnet("decoder.mid_block.resnets.1", "decoder/mid_res_1")
  for i in range(4):
    for j in range(3):
      resnet(f"decoder.up_blocks.{i}.resnets.{j}", f"decoder/up_{i}_res_{j}")
    if i < 3:
      conv_pair(f"decoder.up_blocks.{i}.upsamplers.0.conv",
                f"decoder/up_{i}_upsample/conv")
  gn_pair("decoder.conv_norm_out", "decoder/conv_norm_out")
  conv_pair("decoder.conv_out", "decoder/conv_out")

  conv_pair("quant_conv", "quant_conv")
  conv_pair("post_quant_conv", "post_quant_conv")
  return out


def main(out_path="sd_vae.npz"):
  from diffusers import AutoencoderKL
  import torch
  vae = AutoencoderKL.from_pretrained("runwayml/stable-diffusion-v1-5",
                                      subfolder="vae")
  sd = {k: v.numpy() for k, v in vae.state_dict().items()}
  flat = convert(sd)
  np.savez(out_path, **flat)
  print(f"wrote {len(flat)} arrays to {out_path}")


if __name__ == "__main__":
  main(*sys.argv[1:])
