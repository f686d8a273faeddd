"""Regression tests for round-1 VERDICT correctness debts.

Covers: mask-weighted eval means over zero-padded final batches
(diffusion_loss, mae_reconstruction), the realized n_no_noise/B loss mix
weight, arrays-source split rejection, and loud failure on unknown
eval-config keys.
"""

import jax
import jax.numpy as jnp
import ml_collections as mlc
import numpy as np
import pytest

from small_vision_tpu import parallel
from small_vision_tpu.data import arrays as arrays_src
from small_vision_tpu.data import synthetic
from small_vision_tpu.evaluators import common as eval_common
from small_vision_tpu.evaluators import diffusion_loss, mae_reconstruction
from small_vision_tpu.train import train_ae


def _source_images(num_examples, img_size=8):
  src = synthetic.DataSource(img_size=img_size, num_examples=num_examples,
                             num_classes=10)
  return np.stack([ex["image"] for ex in src.examples(ordered=True)])


def test_diffusion_loss_eval_ignores_padded_rows():
  """12 examples @ batch 8 → the 4 zero-padded rows must not enter the mean,
  and the ragged final batch must carry weight 4/12, not 1/2."""
  mesh = parallel.make_mesh()

  def fake_predict(train_state, batch):
    img = batch["image"].astype(jnp.float32)
    per_ex = jnp.mean(img, axis=tuple(range(1, img.ndim)))
    return per_ex, img, img, img

  ev = diffusion_loss.Evaluator(
      fake_predict, mesh=mesh, batch_size=8,
      data=dict(name="synthetic", img_size=8, num_examples=12,
                num_classes=10))
  results = dict(ev.run({}))
  expected = float(np.mean(_source_images(12).astype(np.float64)))
  assert results["loss"] == pytest.approx(expected, rel=1e-5)


def test_mae_reconstruction_eval_ignores_padded_rows():
  mesh = parallel.make_mesh()

  def fake_predict(train_state, batch):
    # pred=0, mask=1 everywhere → per-example masked MSE = mean(image²).
    img = batch["image"].astype(jnp.float32)
    return jnp.zeros_like(img), jnp.ones_like(img)

  ev = mae_reconstruction.Evaluator(
      fake_predict, mesh=mesh, batch_size=8,
      data=dict(name="synthetic", img_size=8, num_examples=12,
                num_classes=10))
  results = dict(ev.run({}))
  imgs = _source_images(12).astype(np.float64)
  expected = float(np.mean(np.mean(imgs ** 2, axis=(1, 2, 3))))
  assert results["masked_mse"] == pytest.approx(expected, rel=1e-5)
  # Zero-padded rows have se=0: averaging them in would bias DOWN by 4/16.
  biased = expected * 12 / 16
  assert abs(results["masked_mse"] - biased) > 1e-3


def test_mae_mix_weight_uses_realized_count():
  assert train_ae.mae_mix_weight(48, 0.375) == 18 / 48
  # Fractional B*p: int(6*0.375)=2 → weight 1/3, NOT 0.375.
  assert train_ae.mae_mix_weight(6, 0.375) == 2 / 6
  assert train_ae.mae_mix_weight(8, 0.5) == 0.5
  assert train_ae.mae_mix_weight(8, 0.0) == 0.0


def test_arrays_source_rejects_unknown_split(tmp_path):
  imgs = np.zeros((6, 4, 4, 3), np.uint8)
  arrays_src.write_arrays(str(tmp_path), imgs, np.arange(6))
  # Default split works; a different split without split_frac must raise
  # (silent train/eval leakage otherwise).
  src = arrays_src.DataSource(root=str(tmp_path))
  assert src.total_examples == 6
  with pytest.raises(ValueError, match="single split"):
    arrays_src.DataSource(root=str(tmp_path), split="validation")
  # Fractional splits stay allowed under any name.
  val = arrays_src.DataSource(root=str(tmp_path), split="validation",
                              split_frac=(0.5, 1.0))
  assert val.total_examples == 3


def test_unknown_eval_config_key_raises():
  mesh = parallel.make_mesh()
  cfg = mlc.ConfigDict()
  cfg.batch_size = 8
  cfg.evals = {"sample": dict(
      type="diffusion_sampling", pred="predict",
      totall_samples=16,  # typo'd key must not vanish silently
      log_steps=100)}
  with pytest.raises(ValueError, match="totall_samples"):
    eval_common.from_config(cfg, {"predict": lambda *a: None}, mesh)
