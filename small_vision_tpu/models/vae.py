"""Stable-Diffusion VAE (AutoencoderKL) in Flax, channels-last.

Parity target: /root/reference/big_vision/vae_utils.py — which loads HF
diffusers' FlaxAutoencoderKL (runwayml/stable-diffusion-v1-5) and
monkey-patches channels-last encode/decode (:45-94). diffusers is not in
this image, so the architecture is implemented natively (same SD v1.x
config: 4 down/up blocks at (128,256,512,512), mid-block self-attention,
4-channel latents, scaling_factor 0.18215); weights load from a local .npz
(convert once with scripts/convert_vae.py on a networked machine).

Channels-last throughout — native for TPU conv layouts; no transposes.
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SCALING_FACTOR = 0.18215
LATENT_CHANNELS = 4


class ResnetBlock(nn.Module):
  out_ch: int

  @nn.compact
  def __call__(self, x):
    h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm1")(x)
    h = nn.silu(h)
    h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv1")(h)
    h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm2")(h)
    h = nn.silu(h)
    h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv2")(h)
    if x.shape[-1] != self.out_ch:
      x = nn.Conv(self.out_ch, (1, 1), name="conv_shortcut")(x)
    return x + h


class AttnBlock(nn.Module):
  """Single-head self-attention over spatial positions (VAE mid-block)."""

  @nn.compact
  def __call__(self, x):
    b, h, w, c = x.shape
    y = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="group_norm")(x)
    y = y.reshape(b, h * w, c)
    q = nn.Dense(c, name="to_q")(y)
    k = nn.Dense(c, name="to_k")(y)
    v = nn.Dense(c, name="to_v")(y)
    attn = jax.nn.softmax(
        jnp.einsum("bqc,bkc->bqk", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(c), -1)
    y = jnp.einsum("bqk,bkc->bqc", attn.astype(v.dtype), v)
    y = nn.Dense(c, name="to_out")(y)
    return x + y.reshape(b, h, w, c)


class Downsample(nn.Module):
  out_ch: int

  @nn.compact
  def __call__(self, x):
    # SD pads asymmetrically (0,1) before the strided conv.
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return nn.Conv(self.out_ch, (3, 3), strides=2, padding="VALID",
                   name="conv")(x)


class Upsample(nn.Module):
  out_ch: int

  @nn.compact
  def __call__(self, x):
    b, h, w, c = x.shape
    x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
    return nn.Conv(self.out_ch, (3, 3), padding=1, name="conv")(x)


class Encoder(nn.Module):
  block_out_channels: Sequence[int] = (128, 256, 512, 512)
  layers_per_block: int = 2

  @nn.compact
  def __call__(self, x):
    x = nn.Conv(self.block_out_channels[0], (3, 3), padding=1,
                name="conv_in")(x)
    for i, ch in enumerate(self.block_out_channels):
      for j in range(self.layers_per_block):
        x = ResnetBlock(ch, name=f"down_{i}_res_{j}")(x)
      if i < len(self.block_out_channels) - 1:
        x = Downsample(ch, name=f"down_{i}_downsample")(x)
    ch = self.block_out_channels[-1]
    x = ResnetBlock(ch, name="mid_res_0")(x)
    x = AttnBlock(name="mid_attn")(x)
    x = ResnetBlock(ch, name="mid_res_1")(x)
    x = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="conv_norm_out")(x)
    x = nn.silu(x)
    return nn.Conv(2 * LATENT_CHANNELS, (3, 3), padding=1,
                   name="conv_out")(x)


class Decoder(nn.Module):
  block_out_channels: Sequence[int] = (128, 256, 512, 512)
  layers_per_block: int = 3

  @nn.compact
  def __call__(self, z):
    rev = tuple(reversed(self.block_out_channels))  # (512,512,256,128)
    x = nn.Conv(rev[0], (3, 3), padding=1, name="conv_in")(z)
    x = ResnetBlock(rev[0], name="mid_res_0")(x)
    x = AttnBlock(name="mid_attn")(x)
    x = ResnetBlock(rev[0], name="mid_res_1")(x)
    for i, ch in enumerate(rev):
      for j in range(self.layers_per_block):
        x = ResnetBlock(ch, name=f"up_{i}_res_{j}")(x)
      if i < len(rev) - 1:
        x = Upsample(ch, name=f"up_{i}_upsample")(x)
    x = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="conv_norm_out")(x)
    x = nn.silu(x)
    return nn.Conv(3, (3, 3), padding=1, name="conv_out")(x)


class AutoencoderKL(nn.Module):
  block_out_channels: Sequence[int] = (128, 256, 512, 512)

  def setup(self):
    self.encoder = Encoder(self.block_out_channels)
    self.decoder = Decoder(self.block_out_channels)
    # SD v1.x: 1x1 convs around the latent bottleneck.
    self.quant_conv = nn.Conv(2 * LATENT_CHANNELS, (1, 1), name="quant_conv")
    self.post_quant_conv = nn.Conv(LATENT_CHANNELS, (1, 1),
                                   name="post_quant_conv")

  def encode_moments(self, x):
    """(B,H,W,3) in [-1,1] → (mean, logvar) each (B,H/8,W/8,4)."""
    moments = self.quant_conv(self.encoder(x))
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)

  def encode(self, x, rng=None, sample=True, scale=True):
    mean, logvar = self.encode_moments(x)
    z = mean
    if sample and rng is not None:
      z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
          rng, mean.shape, mean.dtype)
    return z * SCALING_FACTOR if scale else z

  def decode(self, z, scale=True):
    if scale:
      z = z / SCALING_FACTOR
    return self.decoder(self.post_quant_conv(z))

  def __call__(self, x, rng=None):
    z = self.encode(x, rng)
    return self.decode(z)


def load_vae(weights_path=None, image_size=256, rng=None):
  """Returns (vae_params, vae_encode, vae_decode) — reference vae_utils API.

  vae_encode(params, rng, images, scale=True): images (B,H,W,3) in [-1,1]
  → latents (B,H/8,W/8,4). vae_decode(params, latents, scale=True) → images.
  """
  model = AutoencoderKL()
  if weights_path:
    from small_vision_tpu.utils.trees import recover_tree
    with np.load(weights_path) as data:
      keys, values = zip(*data.items())
    params = jax.tree.map(jnp.asarray, recover_tree(keys, values))
  else:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, image_size, image_size, 3)),
                        )["params"]

  def vae_encode(params, rng, images, scale=True):
    return model.apply({"params": params}, images, rng, scale=scale,
                       method=model.encode)

  def vae_decode(params, latents, scale=True):
    return model.apply({"params": params}, latents, scale=scale,
                       method=model.decode)

  return params, vae_encode, vae_decode
