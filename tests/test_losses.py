"""Loss helper tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from small_vision_tpu.utils import losses


def test_softmax_xent_matches_manual():
  logits = jnp.asarray([[2.0, 0.0, -2.0]])
  labels = jnp.asarray([[1.0, 0.0, 0.0]])
  expected = -np.log(np.exp(2) / (np.exp(2) + 1 + np.exp(-2)))
  assert float(losses.softmax_xent(
      logits=logits, labels=labels)) == pytest.approx(expected, rel=1e-6)


def test_sigmoid_xent_bounds():
  logits = jnp.asarray([[10.0, -10.0]])
  labels = jnp.asarray([[1.0, 0.0]])
  assert float(losses.sigmoid_xent(
      logits=logits, labels=labels)) == pytest.approx(0.0, abs=1e-3)


def test_weighted_softmax_xent_masks_padding():
  logits = jnp.zeros((1, 3, 4))
  labels = jnp.asarray([[1, 2, 0]])
  w = jnp.asarray([[1.0, 1.0, 0.0]])
  out = losses.weighted_softmax_xent(logits=logits, labels=labels,
                                     weights=w)
  assert float(out) == pytest.approx(np.log(4), rel=1e-6)


def test_contrastive_loss_perfect_alignment():
  z = jnp.eye(4)
  loss, aux = losses.bidirectional_contrastive_loss(z, z, t=100.0,
                                                    reduction=True)
  assert float(loss) == pytest.approx(0.0, abs=1e-3)
  assert int(aux["ncorrect"]) == 4
