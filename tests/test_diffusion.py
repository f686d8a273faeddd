"""Gold tests for the diffusion core: closed-form identities + table values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from small_vision_tpu.ops import diffusion as gd_lib


@pytest.fixture(scope="module", params=["cosine", "linear"])
def gd(request):
  return gd_lib.GaussianDiffusion.create(request.param, timesteps=1000)


def test_schedule_tables(gd):
  acp = np.asarray(gd.alphas_cumprod)
  assert acp.shape == (1000,)
  assert np.all(np.diff(acp) < 0)            # strictly decreasing
  assert 0 < acp[-1] < acp[0] < 1
  assert np.allclose(np.asarray(gd.sqrt_alphas_cumprod)**2, acp, atol=1e-6)
  assert np.allclose(
      np.asarray(gd.sqrt_one_minus_alphas_cumprod)**2, 1 - acp, atol=1e-6)
  # Betas and cumprod are mutually consistent.
  recon = np.cumprod(1.0 - np.asarray(gd.betas, np.float64))
  assert np.allclose(recon, acp, rtol=1e-4)


def test_cosine_table_reference_values():
  """Spot-check the float64 cosine table against independently computed vals."""
  betas = gd_lib.make_beta_schedule("cosine", 1000)
  def abar(t):
    return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
  for i in [0, 1, 499, 998]:
    expected = min(1 - abar((i + 1) / 1000) / abar(i / 1000), 0.999)
    assert betas[i] == pytest.approx(expected, rel=1e-12)
  assert betas[999] == pytest.approx(0.999)


def test_q_sample_identity(gd):
  """q_sample(x,0) ≈ x for tiny t=0 noise level; variance law holds."""
  rng = jax.random.PRNGKey(0)
  x0 = jax.random.normal(rng, (4, 8, 8, 3))
  noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
  t = jnp.zeros((4,), jnp.int32)
  xt = gd_lib.q_sample(gd, x0, t, noise)
  a0 = float(gd.sqrt_alphas_cumprod[0])
  s0 = float(gd.sqrt_one_minus_alphas_cumprod[0])
  np.testing.assert_allclose(np.asarray(xt), a0 * np.asarray(x0) +
                             s0 * np.asarray(noise), rtol=1e-5)
  assert a0**2 + s0**2 == pytest.approx(1.0, abs=1e-5)


def test_eps_x0_inverse(gd):
  """predict_xstart_from_eps inverts q_sample; eps prediction inverts x0."""
  rng = jax.random.PRNGKey(2)
  x0 = jax.random.normal(rng, (2, 4, 4, 3))
  noise = jax.random.normal(jax.random.PRNGKey(3), x0.shape)
  t = jnp.asarray([100, 900], jnp.int32)
  xt = gd_lib.q_sample(gd, x0, t, noise)
  x0_hat = gd_lib.predict_xstart_from_eps(gd, xt, t, noise)
  np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0),
                             rtol=1e-3, atol=1e-4)
  eps_hat = gd_lib.predict_eps_from_xstart(gd, xt, t, x0)
  np.testing.assert_allclose(np.asarray(eps_hat), np.asarray(noise),
                             rtol=1e-3, atol=1e-4)


def test_posterior_mean_at_t1(gd):
  """At t=1 the posterior mean collapses nearly onto x0 (coef1 ≈ 1)."""
  x0 = jnp.ones((1, 2, 2, 1))
  xt = 0.5 * jnp.ones_like(x0)
  t = jnp.asarray([1], jnp.int32)
  mean = gd_lib.q_posterior_mean(gd, x0, xt, t)
  c1 = float(gd.posterior_mean_coef1[1])
  c2 = float(gd.posterior_mean_coef2[1])
  assert float(mean[0, 0, 0, 0]) == pytest.approx(c1 + 0.5 * c2, rel=1e-5)
  assert c1 + c2 * float(gd.sqrt_alphas_cumprod[1]) == pytest.approx(
      1.0, abs=0.05)


def test_sampling_timesteps_ladder():
  ts = gd_lib.sampling_timesteps(1000, 125)
  assert ts[0] == 999 and ts[-1] == 0
  assert len(ts) == 126
  assert np.all(np.diff(ts) < 0)


def test_ddim_loop_perfect_model_recovers_mode():
  """With an oracle eps model for a point mass at x0=c, DDIM(eta=0) → c."""
  gd = gd_lib.GaussianDiffusion.create("cosine", timesteps=100)
  target = 0.7

  def eps_fn(*, x_t, t, rng, y=None, cfg_scale=None):
    # If x0 = target exactly, eps = (x_t - sqrt(abar)*target)/sqrt(1-abar).
    nd = x_t.ndim
    a = gd_lib.bcast(gd.sqrt_alphas_cumprod, t, nd)
    s = gd_lib.bcast(gd.sqrt_one_minus_alphas_cumprod, t, nd)
    return (x_t - a * target) / s

  out = gd_lib.ddim_sample_loop(
      gd, eps_fn, jax.random.PRNGKey(0), (4, 4, 4, 1),
      sampling_steps=25, eta=0.0, clip_denoised=True)
  np.testing.assert_allclose(np.asarray(out["sample"]), target, atol=1e-2)


def test_ddim_loop_jits_and_is_deterministic():
  gd = gd_lib.GaussianDiffusion.create("cosine", timesteps=50)

  def eps_fn(*, x_t, t, rng, y=None, cfg_scale=None):
    return jnp.zeros_like(x_t)

  f = jax.jit(lambda rng: gd_lib.ddim_sample_loop(
      gd, eps_fn, rng, (2, 4, 4, 1), sampling_steps=10, eta=1.0)["sample"])
  s1 = f(jax.random.PRNGKey(7))
  s2 = f(jax.random.PRNGKey(7))
  np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
  assert np.isfinite(np.asarray(s1)).all()
