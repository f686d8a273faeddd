"""The unified masked-diffusion auto-encoder (UMD).

Parity target: /root/reference/big_vision/models/ae.py — one ViT
encoder-decoder that covers MAE (t=0, high mask), DiT (no mask, noised
input), MaskDiT, and UMD, with AdaLN-zero or in-context conditioning on
(timestep ⊕ label), MAE-style random masking in the encoder, mask-token
scatter in the decoder, 4 averaged class tokens as the representation, a
dual-head output predicting [x0 ‖ eps], and classifier-free-guidance
double-batch inference.

TPU-first deviations:
  - matmul dtype defaults to bfloat16 (reference: float32);
  - unpatchify is a Dense + reshape instead of ConvTranspose — identical
    function for VALID/stride=patch, and it feeds the MXU directly;
  - timesteps are (B,) int32 (reference carries (B,1)).

RNG streams: "mae_noise" (masking), "cfg" (label dropout), "dropout",
"params".
"""

from typing import Optional, Sequence

import einops
import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from small_vision_tpu.models.embeddings import (CondTrunk, LabelEmbed,
                                                TimestepEmbed)
from small_vision_tpu.models.vit import Encoder
from small_vision_tpu.ops.masking import (random_masking, restore_masked,
                                          sequence_mask_to_image_mask)


class _ViTAE(nn.Module):
  num_classes: Optional[int] = None  # Set for class-conditional finetuning.
  channels: int = 3
  img_size: int = 64
  patch_size: Sequence[int] = (4, 4)
  width: int = 768
  depth: int = 12
  dec_depth: int = 4
  mlp_dim: Optional[int] = None  # Defaults to 4x width.
  num_heads: int = 12
  dropout: float = 0.0
  scan: bool = True
  remat_policy: str = "nothing_saveable"
  dtype_mm: str = "bfloat16"
  adaln: bool = False
  cfg_dropout_rate: float = 0.1
  num_cls: int = 4
  attn_impl: str = "xla"
  # "int8_mlp": dynamic int8 MLP matmuls; "int8_all": + q/k/v/out
  # projections (ops/quant.py). Attention core stays bf16 either way.
  quant: str = "none"
  # Pipeline parallelism over the mesh's 'pipe' axis (parallel/pipeline.py):
  # both encoder and decoder depths must divide by pipe_stages.
  pipe_stages: int = 0
  pipe_microbatches: int = 0
  no_decay_list: Sequence[str] = ("cls", "mask_token", "bias")

  def setup(self):
    p = self.patch_size[0]
    self.grid = self.img_size // p
    num_patches = self.grid * self.grid

    self.time_embed = TimestepEmbed(self.width, dtype=self.dtype_mm)
    self.time_trunk = CondTrunk(self.width, 2)
    if self.num_classes is not None:
      self.label_embed = LabelEmbed(
          width=self.width, num_classes=self.num_classes,
          class_dropout_prob=self.cfg_dropout_rate)
      self.label_trunk = CondTrunk(self.width, 2)

    self.cls = self.param("cls", nn.initializers.zeros,
                          (1, self.num_cls, self.width), jnp.float32)
    self.patch_embed = nn.Conv(
        self.width, self.patch_size, strides=self.patch_size,
        padding="VALID", name="embedding", dtype=self.dtype_mm)
    posemb_init = nn.initializers.normal(stddev=1 / np.sqrt(num_patches))
    self.posemb = self.param("pos_embedding", posemb_init,
                             (1, num_patches, self.width), jnp.float32)
    self.dec_posemb = self.param("dec_pos_embedding", posemb_init,
                                 (1, num_patches, self.width), jnp.float32)
    self.mask_token = self.param(
        "mask_token", nn.initializers.normal(stddev=0.02),
        (1, 1, self.width))

    enc_dec_kw = dict(
        num_heads=self.num_heads, mlp_dim=self.mlp_dim,
        dropout=self.dropout, scan=self.scan,
        remat_policy=self.remat_policy, dtype_mm=self.dtype_mm,
        adaln=self.adaln, attn_impl=self.attn_impl,
        pipe_stages=self.pipe_stages,
        pipe_microbatches=self.pipe_microbatches,
        quant={"int8_mlp": "int8", "int8_all": "int8_all",
               "none": "none", "": "none"}[self.quant])
    self.encoder = Encoder(depth=self.depth, name="Encoder", **enc_dec_kw)
    self.decoder = Encoder(depth=self.dec_depth, name="Decoder", **enc_dec_kw)

    if self.adaln:
      self.final_modulation = nn.Dense(
          self.width * 2, kernel_init=nn.initializers.zeros,
          name="final_modulation", dtype=self.dtype_mm)
    # Dense unpatchify to the dual [x0 ‖ eps] head (2*channels per pixel).
    # The bias is PER-CHANNEL (2c,), tied across patch positions, exactly
    # like the reference's ConvTranspose final_conv bias (reference
    # models/ae.py) — an untied (p*p*2c,) Dense bias is more expressive but
    # trains along a measurably different trajectory (the gradients sum over
    # positions in the reference) and cannot round-trip through the
    # checkpoint converter losslessly.
    self.head = nn.Dense(
        p * p * self.channels * 2, name="head", use_bias=False,
        kernel_init=nn.initializers.normal(0.02), dtype=self.dtype_mm)
    self.head_bias = self.param(
        "head_bias", nn.initializers.zeros, (2 * self.channels,),
        jnp.float32)

  def embed(self, image, t=None, y=None, train=False):
    """Patchify + build the conditioning vector from (t, y)."""
    image = jnp.asarray(image, self.dtype_mm)
    x = self.patch_embed(image)
    n = x.shape[0]
    x = x.reshape(n, -1, self.width)

    if t is None:
      t = jnp.zeros((n,), jnp.int32)  # t=0 ≡ "no noise" / unconditional time
    time_cond = self.time_trunk(self.time_embed(t, train=train), train=train)

    if self.num_classes is not None:
      if y is None:
        y = jnp.full((n,), self.num_classes, jnp.int32)  # null class
      y_cond = self.label_trunk(
          self.label_embed(y, train=train), train=train)
    else:
      assert y is None, "y given but model has num_classes=None"
      y_cond = jnp.zeros((n, self.width), self.dtype_mm)

    cond = time_cond + y_cond
    if self.adaln:
      cond = nn.silu(cond)
    # Keep the compute dtype: a fp32 cond would promote the whole AdaLN
    # modulation path (and with in-context conditioning, the token stream).
    return x, cond.astype(self.dtype_mm)

  def encode(self, x, cond, *, mask=0.0, train=False):
    out = {}
    n = x.shape[0]
    x = x + self.posemb.astype(x.dtype)  # Don't promote the stream to f32.

    if mask > 0.0:
      x, seq_mask, ids_restore = random_masking(
          x, mask, self.make_rng("mae_noise"))
      out["mask"] = sequence_mask_to_image_mask(
          seq_mask, self.patch_size[0], self.img_size)
    else:
      ids_restore = None
      out["mask"] = None

    x = jnp.concatenate(
        [jnp.tile(self.cls.astype(x.dtype), [n, 1, 1]), x], axis=1)
    x = self.encoder(x, cond=cond, deterministic=not train)
    rep = x[:, :self.num_cls].mean(axis=1)  # averaged class tokens
    out["pre_logits"] = rep
    return rep, x[:, self.num_cls:], ids_restore, out

  def decode(self, rep, x, cond, ids_restore=None, train=False):
    x = x.astype(self.dtype_mm)  # Encoder's final LN emits fp32.
    if ids_restore is not None:
      x = restore_masked(x, self.mask_token, ids_restore)
    return self._decode_restored(rep, x, cond, train=train)

  def _decode_restored(self, rep, x, cond, train=False):
    """Decoder + final modulation + head on an already-unmasked sequence."""
    x = x + self.dec_posemb.astype(x.dtype)
    x = jnp.concatenate([rep[:, None, :].astype(x.dtype), x], axis=1)
    x = self.decoder(x, cond=cond, deterministic=not train)
    x = x[:, 1:, :]

    if self.adaln:
      shift, scale = jnp.split(self.final_modulation(cond), 2, axis=-1)
      x = x * (1 + scale[:, None, :]) + shift[:, None, :]

    x = self.head(x)  # (n, L, p*p*2c)
    p = self.patch_size[0]
    out = einops.rearrange(
        x, "n (gh gw) (ph pw c) -> n (gh ph) (gw pw) c",
        gh=self.grid, gw=self.grid, ph=p, pw=p).astype(jnp.float32)
    return out + self.head_bias  # per-channel, ConvTranspose-bias semantics

  def __call__(self, image, *, t=None, y=None, cfg_scale=None, mask=0.0,
               train=False):
    """Full forward. Returns (pred, out) with pred = [x0_hat ‖ eps_hat].

    `cfg_scale`: classifier-free guidance at inference — the batch is doubled
    with null labels and the prediction extrapolated cond→uncond.
    """
    if cfg_scale is not None:
      assert y is not None and self.num_classes is not None
      assert not train, "cfg_scale is inference-only"
      n = image.shape[0]
      image = jnp.concatenate([image, image], axis=0)
      t = jnp.concatenate([t, t], axis=0)
      null_y = jnp.full((n,), self.num_classes, jnp.int32)
      y = jnp.concatenate([y, null_y], axis=0)

    x, cond = self.embed(image, t=t, y=y, train=train)
    rep, encoded, ids_restore, out = self.encode(
        x, cond, mask=mask, train=train)
    pred = self.decode(rep, encoded, cond, ids_restore=ids_restore,
                       train=train)

    if cfg_scale is not None:
      conditional, unconditional = jnp.split(pred, 2, axis=0)
      pred = unconditional + cfg_scale * (conditional - unconditional)

    return pred, out

  def dual_forward(self, img_a, img_b, *, t_a=None, t_b=None, y_a=None,
                   y_b=None, mask_a=0.0, mask_b=0.0, train=False):
    """Two-branch training forward sharing one embed/decoder/head pass.

    The UMD loss runs a clean-MAE branch and a noised-diffusion branch per
    step (reference trainers/train_ae.py:304-361). As two separate applies,
    the patchify conv, the 4-block decoder (both branches decode the FULL
    L=257 sequence), the final modulation, and the head each run twice at
    half batch. Here the branches are concatenated everywhere their shapes
    agree — only the encoders (different static keep-lengths from the two
    mask ratios) stay per-branch — so the shared stages run once at full
    batch. Math is identical per branch; conditioning is per-sample.

    Returns (pred, out_a, out_b) with pred ordered [a ‖ b] on axis 0.
    """
    n_a = img_a.shape[0]
    image = jnp.concatenate([jnp.asarray(img_a, self.dtype_mm),
                             jnp.asarray(img_b, self.dtype_mm)], axis=0)
    n = image.shape[0]
    zeros = lambda m: jnp.zeros((m,), jnp.int32)
    t = jnp.concatenate([t_a if t_a is not None else zeros(n_a),
                         t_b if t_b is not None else zeros(n - n_a)], axis=0)
    if self.num_classes is not None:
      null = lambda m: jnp.full((m,), self.num_classes, jnp.int32)
      y = jnp.concatenate([y_a if y_a is not None else null(n_a),
                           y_b if y_b is not None else null(n - n_a)], axis=0)
    else:
      assert y_a is None and y_b is None
      y = None

    x, cond = self.embed(image, t=t, y=y, train=train)
    rep_a, enc_a, ids_a, out_a = self.encode(
        x[:n_a], cond[:n_a], mask=mask_a, train=train)
    rep_b, enc_b, ids_b, out_b = self.encode(
        x[n_a:], cond[n_a:], mask=mask_b, train=train)

    unmask = lambda e, ids: (
        restore_masked(e.astype(self.dtype_mm), self.mask_token, ids)
        if ids is not None else e.astype(self.dtype_mm))
    full = jnp.concatenate([unmask(enc_a, ids_a), unmask(enc_b, ids_b)],
                           axis=0)
    rep = jnp.concatenate([rep_a, rep_b], axis=0)
    pred = self._decode_restored(rep, full, cond, train=train)
    return pred, out_a, out_b


def decode_variant(variant):
  """UMD variant table: "B/4" → dims (MAE-style decoder depth scaling)."""
  if variant is None:
    return {}
  v, patch = variant, {}
  if "/" in variant:
    v, p = variant.split("/")
    patch = {"patch_size": (int(p), int(p))}
  return {
      "width": {"S": 384, "B": 768, "L": 1024}[v],
      "depth": {"S": 12, "B": 12, "L": 24}[v],
      "dec_depth": {"S": 4, "B": 4, "L": 8}[v],
      "num_heads": {"S": 6, "B": 12, "L": 16}[v],
      **patch,
  }


def Model(*, variant=None, **kw):  # noqa: N802 (factory, reference parity)
  return _ViTAE(**{**decode_variant(variant), **kw})
