"""Conditioning embedders: timestep, class label (with CFG dropout), trunks.

Parity target: /root/reference/big_vision/models/embeddings.py — sinusoidal
TimeEmb (:13-31), LabelEmbedder with null-class dropout for classifier-free
guidance (:33-48), and the 2-layer silu EmbeddingTrunk (:50-58).
"""

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class TimestepEmbed(nn.Module):
  """Sinusoidal timestep embedding; t is (B,) or (B,1) int32.

  Optional dropout to an `unconditional` timestep for time-CFG (unused by the
  shipped configs but part of the reference surface).
  """
  width: int
  dtype: Any = jnp.float32
  dropout_prob: float = 0.0
  unconditional_t: int = 0

  @nn.compact
  def __call__(self, t, train=False):
    t = t.reshape(t.shape[0], 1)
    if train and self.dropout_prob > 0.0:
      drop = jax.random.bernoulli(
          self.make_rng("time_cfg"), self.dropout_prob, t.shape)
      t = jnp.where(drop, self.unconditional_t, t)

    half = self.width // 2
    freqs = jnp.exp(
        -math.log(10000.0) / (half - 1) *
        jnp.arange(half, dtype=self.dtype))
    angles = t.astype(self.dtype) * freqs  # (B, half)
    return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)


class LabelEmbed(nn.Module):
  """Class-label embedding table with a trailing null class.

  During training, labels drop to the null class with prob
  `class_dropout_prob`, which is what makes classifier-free guidance work at
  sampling time (rng stream: "cfg").
  """
  width: int = 768
  num_classes: int = 1000
  class_dropout_prob: float = 0.1

  @nn.compact
  def __call__(self, labels, train=False):
    if train and self.class_dropout_prob > 0.0:
      drop = jax.random.bernoulli(
          self.make_rng("cfg"), self.class_dropout_prob, labels.shape)
      labels = jnp.where(drop, self.num_classes, labels)
    return nn.Embed(self.num_classes + 1, self.width,
                    name="embedding")(labels)


class CondTrunk(nn.Module):
  """2-layer silu MLP mapping a raw embedding to the conditioning vector."""
  width: int
  expansion: int = 2

  @nn.compact
  def __call__(self, x, train=False):
    x = nn.Dense(self.width * self.expansion)(x)
    x = nn.silu(x)
    return nn.Dense(self.width)(x)
