"""Classification/contrastive loss helpers.

Parity target: /root/reference/big_vision/utils.py:296-385 — sigmoid and
softmax cross-entropy (with label smoothing / normalization options) and the
bidirectional contrastive loss used by upstream big_vision evaluators.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from small_vision_tpu.utils.misc import onehot


def sigmoid_xent(*, logits, labels, reduction: bool = True):
  """Numerically stable multi-label sigmoid cross-entropy."""
  log_p = jax.nn.log_sigmoid(logits)
  log_not_p = jax.nn.log_sigmoid(-logits)
  nll = -jnp.sum(labels * log_p + (1.0 - labels) * log_not_p, axis=-1)
  return jnp.mean(nll) if reduction else nll


def softmax_xent(*, logits, labels, reduction: bool = True, kl: bool = False,
                 axis: int = -1):
  """Softmax cross-entropy over (possibly soft) label distributions."""
  log_p = jax.nn.log_softmax(logits, axis=axis)
  nll = -jnp.sum(labels * log_p, axis=axis)
  if kl:
    nll += jnp.sum(labels * jnp.log(jnp.clip(labels, 1e-8)), axis=axis)
  return jnp.mean(nll) if reduction else nll


def weighted_softmax_xent(*, logits, labels, reduction: bool = True,
                          weights: Optional[jnp.ndarray] = None,
                          label_smoothing: float = 0.0,
                          normalize: bool = True):
  """Token-weighted xent for (B, L, V) logits and (B, L) int labels."""
  vocab = logits.shape[-1]
  confidence = 1.0 - label_smoothing
  low = label_smoothing / (vocab - 1) if vocab > 1 else 0.0
  soft = onehot(labels, vocab, on_value=confidence, off_value=low)
  loss = -jnp.sum(soft * jax.nn.log_softmax(logits), axis=-1)
  norm = jnp.ones(labels.shape[:1], jnp.float32) * labels.shape[1]
  if weights is not None:
    loss = loss * weights
    norm = weights.sum(axis=tuple(range(1, weights.ndim)))
  loss = loss.sum(axis=tuple(range(1, loss.ndim)))
  if normalize:
    loss = loss / jnp.maximum(norm, 1.0)
  return jnp.mean(loss) if reduction else loss


def bidirectional_contrastive_loss(zimg, ztxt, t=1.0, mask=None,
                                   reduction: bool = False):
  """CLIP-style InfoNCE in both directions over in-batch negatives."""
  logits = jnp.dot(zimg, ztxt.T) * t
  if mask is not None:
    logits = jnp.where(mask[None, :] * mask[:, None], logits, -jnp.inf)
  n = zimg.shape[0]
  eye = jnp.eye(n)
  l1 = -jnp.diag(jax.nn.log_softmax(logits, axis=1))   # img → txt
  l2 = -jnp.diag(jax.nn.log_softmax(logits, axis=0))   # txt → img
  loss = 0.5 * (l1 + l2)
  if mask is not None:
    loss = jnp.where(mask, loss, 0.0)
  if reduction:
    denom = mask.sum() if mask is not None else n
    return loss.sum() / denom, {"ncorrect": jnp.sum(
        (jnp.argmax(logits, axis=1) == jnp.arange(n)) *
        (mask if mask is not None else 1.0))}
  return loss, {"logits": logits, "eye": eye}
