"""FID/IS tests: streaming moments, Frechet math, InceptionV3 shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from small_vision_tpu.evaluators import fid as fid_lib
from small_vision_tpu.evaluators import inception

pytestmark = pytest.mark.slow


def test_streaming_moments_match_numpy():
  rng = np.random.default_rng(0)
  x = rng.normal(size=(500, 8))
  m = fid_lib.StreamingMoments(dim=8)
  for i in range(0, 500, 100):
    chunk = x[i:i + 100]
    m.update(chunk.shape[0], chunk.sum(0), chunk.T @ chunk)
  mu, sigma = m.finalize()
  np.testing.assert_allclose(mu, x.mean(0), rtol=1e-10)
  np.testing.assert_allclose(sigma, np.cov(x, rowvar=False), rtol=1e-8)


def test_frechet_distance_identity_and_closed_form():
  rng = np.random.default_rng(1)
  a = rng.normal(size=(16, 16))
  sigma = a @ a.T + np.eye(16)
  mu = rng.normal(size=16)
  assert fid_lib.compute_frechet_distance(mu, sigma, mu, sigma) == (
      pytest.approx(0.0, abs=1e-6))

  # Diagonal case closed form: Σ (mu1-mu2)² + (s1 + s2 - 2√(s1·s2)).
  s1, s2 = np.diag([1.0, 4.0]), np.diag([9.0, 1.0])
  m1, m2 = np.zeros(2), np.asarray([1.0, 2.0])
  expected = (1 + 4) + (1 + 9 - 2 * 3) + (4 + 1 - 2 * 2)
  got = fid_lib.compute_frechet_distance(m1, s1, m2, s2)
  assert got == pytest.approx(expected, rel=1e-6)


def test_inception_score_bounds():
  n, c = 100, 10
  uniform = np.full((n, c), 1.0 / c)
  assert fid_lib.compute_inception_score(uniform) == pytest.approx(1.0)
  # One-hot diverse predictions → IS near c.
  sharp = np.eye(c)[np.arange(n) % c] * 0.999 + 0.0001
  sharp /= sharp.sum(1, keepdims=True)
  assert fid_lib.compute_inception_score(sharp) > 5.0


@pytest.mark.slow
def test_inception_v3_shapes():
  model, variables = inception.init_params(jax.random.PRNGKey(0))
  x = jnp.zeros((2, 299, 299, 3))
  pool3, logits = model.apply(variables, x)
  assert pool3.shape == (2, fid_lib.FEATURE_DIM)
  assert logits.shape == (2, 1008)


@pytest.mark.slow
def test_compute_reference_stats(tmp_path):
  """The stats builder produces the same mu/sigma as a direct computation."""
  model, variables = inception.init_params(jax.random.PRNGKey(0))
  act_fn = fid_lib.make_activation_fn(model, variables)
  rng = np.random.default_rng(3)
  imgs = rng.integers(0, 256, (24, 32, 32, 3), dtype=np.uint8)

  out = tmp_path / "stats.npz"
  mu, sigma = fid_lib.compute_reference_stats(
      iter([imgs[:16], imgs[16:]]), str(out), batch_size=8)
  mu_direct, sigma_direct, _ = fid_lib.compute_statistics(
      imgs, act_fn, batch_size=8)
  np.testing.assert_allclose(mu, mu_direct, rtol=1e-4, atol=1e-5)
  np.testing.assert_allclose(sigma, sigma_direct, rtol=1e-3, atol=1e-4)
  loaded_mu, loaded_sigma = fid_lib.load_reference_stats(str(out))
  np.testing.assert_allclose(loaded_mu, mu)


@pytest.mark.slow
def test_fid_pipeline_end_to_end(tmp_path):
  """Full pipeline with random weights: same dist → small FID, shifted
  dist → larger FID."""
  model, variables = inception.init_params(jax.random.PRNGKey(0))
  act_fn = fid_lib.make_activation_fn(model, variables)

  rng = np.random.default_rng(0)
  imgs_a = rng.integers(0, 256, (24, 32, 32, 3), dtype=np.uint8)
  imgs_b = rng.integers(0, 128, (24, 32, 32, 3), dtype=np.uint8)  # darker

  mu_a, sig_a, probs = fid_lib.compute_statistics(imgs_a, act_fn,
                                                  batch_size=16)
  assert probs.shape == (24, 1008)
  np.savez(tmp_path / "ref.npz", mu=mu_a, sigma=sig_a)

  fid_fn = fid_lib.create_fid_score_fn(16, str(tmp_path / "ref.npz"))
  fid_same, is_same = fid_fn(imgs_a)
  fid_diff, _ = fid_fn(imgs_b)
  assert fid_same == pytest.approx(0.0, abs=1e-3)
  assert fid_diff > fid_same
  assert np.isfinite(is_same)
