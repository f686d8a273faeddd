"""Gaussian diffusion core (DDPM forward process + DDIM ancestral sampler).

Parity target: /root/reference/big_vision/gaussian_diffusion.py — schedule
construction (:18-67), q_sample (:85), posterior (:100), eps<->x0 conversions
(:122-132), eta-parameterized DDIM step (:167-212), and the fully-on-device
`lax.scan` sampling loop (:214-284).

TPU-first design notes:
  - Schedule tables are computed once in float64 numpy (the cosine table is
    precision-sensitive) and stored as float32 device arrays inside a
    `GaussianDiffusion` flax.struct pytree, so the whole schedule lives in the
    train_state and reshards like any other state.
  - The sampler is a single `lax.scan` program: model forward, x0-prediction,
    the DDIM update, and the noise draw all fuse into one XLA executable; no
    host round-trips during the 125-step loop.
  - Timesteps are (B,) int32 throughout (the reference carries (B,1); the
    extra singleton only existed to please broadcasting there).
"""

from typing import Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np


def make_beta_schedule(name: str, timesteps: int) -> np.ndarray:
  """Beta schedule table in float64 (values match DDPM/iDDPM conventions)."""
  if name == "linear":
    scale = 1000.0 / timesteps
    return np.linspace(scale * 1e-4, scale * 2e-2, timesteps,
                       dtype=np.float64)
  if name == "cosine":
    # iDDPM cosine: beta_t = 1 - abar(t+1)/abar(t), capped at 0.999.
    def alpha_bar(t):
      return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
    grid = np.arange(timesteps + 1, dtype=np.float64) / timesteps
    abar = alpha_bar(grid)
    betas = 1.0 - abar[1:] / abar[:-1]
    return np.minimum(betas, 0.999)
  raise NotImplementedError(f"Unknown beta schedule: {name!r}")


@flax.struct.dataclass
class GaussianDiffusion:
  """Precomputed diffusion tables; a pytree of (T,)-shaped float32 arrays."""
  betas: jax.Array
  alphas_cumprod: jax.Array
  alphas_cumprod_prev: jax.Array
  sqrt_alphas_cumprod: jax.Array
  sqrt_one_minus_alphas_cumprod: jax.Array
  sqrt_recip_alphas_cumprod: jax.Array
  sqrt_recipm1_alphas_cumprod: jax.Array
  posterior_mean_coef1: jax.Array
  posterior_mean_coef2: jax.Array
  posterior_variance: jax.Array
  posterior_log_variance_clipped: jax.Array

  @property
  def num_timesteps(self) -> int:
    return self.betas.shape[0]

  @classmethod
  def create(cls, beta_schedule: str = "cosine", timesteps: int = 1000,
             dtype=jnp.float32) -> "GaussianDiffusion":
    betas = make_beta_schedule(beta_schedule, timesteps)
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.append(1.0, acp[:-1])
    post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
    post_logvar = np.log(np.append(post_var[1], post_var[1:]))
    return cls(
        betas=jnp.asarray(betas, dtype),
        alphas_cumprod=jnp.asarray(acp, dtype),
        alphas_cumprod_prev=jnp.asarray(acp_prev, dtype),
        sqrt_alphas_cumprod=jnp.asarray(np.sqrt(acp), dtype),
        sqrt_one_minus_alphas_cumprod=jnp.asarray(np.sqrt(1 - acp), dtype),
        sqrt_recip_alphas_cumprod=jnp.asarray(np.sqrt(1 / acp), dtype),
        sqrt_recipm1_alphas_cumprod=jnp.asarray(np.sqrt(1 / acp - 1), dtype),
        posterior_mean_coef1=jnp.asarray(
            betas * np.sqrt(acp_prev) / (1.0 - acp), dtype),
        posterior_mean_coef2=jnp.asarray(
            (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp), dtype),
        posterior_variance=jnp.asarray(post_var, dtype),
        posterior_log_variance_clipped=jnp.asarray(post_logvar, dtype),
    )


def bcast(table: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
  """Gathers table[t] for a (B,) or (B,1) t and appends broadcast dims."""
  t = t.reshape(t.shape[0])
  vals = jnp.take(table, t, axis=0)
  return vals.reshape((-1,) + (1,) * (ndim - 1))


def q_sample(gd: GaussianDiffusion, x_start, t, noise):
  """Forward noising: draw x_t ~ q(x_t | x_0) given the noise."""
  nd = x_start.ndim
  return (bcast(gd.sqrt_alphas_cumprod, t, nd) * x_start +
          bcast(gd.sqrt_one_minus_alphas_cumprod, t, nd) * noise)


def q_posterior_mean(gd: GaussianDiffusion, x_start, x_t, t):
  """Mean of q(x_{t-1} | x_t, x_0)."""
  nd = x_t.ndim
  return (bcast(gd.posterior_mean_coef1, t, nd) * x_start +
          bcast(gd.posterior_mean_coef2, t, nd) * x_t)


def predict_xstart_from_eps(gd: GaussianDiffusion, x_t, t, eps):
  nd = x_t.ndim
  return (bcast(gd.sqrt_recip_alphas_cumprod, t, nd) * x_t -
          bcast(gd.sqrt_recipm1_alphas_cumprod, t, nd) * eps)


def predict_eps_from_xstart(gd: GaussianDiffusion, x_t, t, x_start):
  nd = x_t.ndim
  return ((bcast(gd.sqrt_recip_alphas_cumprod, t, nd) * x_t - x_start) /
          bcast(gd.sqrt_recipm1_alphas_cumprod, t, nd))


def snr(gd: GaussianDiffusion, t, ndim=1):
  a = bcast(gd.sqrt_alphas_cumprod, t, ndim)
  s = bcast(gd.sqrt_one_minus_alphas_cumprod, t, ndim)
  return (a * a) / (s * s)


def ddim_step(gd: GaussianDiffusion, eps_fn: Callable, x, t, t_next, rng,
              *, eta: float = 1.0, clip_denoised: bool = False,
              model_kwargs=None):
  """One eta-parameterized DDIM update x_t -> x_{t_next} (DDIM Eq. 12).

  `eps_fn(x_t=..., t=..., rng=..., **model_kwargs)` returns predicted noise.
  `t_next=None` means the final step to the posterior-prev index.
  Returns dict(sample, pred_xstart, rng).
  """
  model_kwargs = model_kwargs or {}
  rng, eps_rng, noise_rng = jax.random.split(rng, 3)
  eps_out = eps_fn(x_t=x, t=t, rng=eps_rng, **model_kwargs)

  pred_xstart = predict_xstart_from_eps(gd, x, t, eps_out)
  if clip_denoised:
    pred_xstart = jnp.clip(pred_xstart, -1.0, 1.0)
  # Re-derive eps from the (possibly clipped) x0 so the update is consistent.
  eps = predict_eps_from_xstart(gd, x, t, pred_xstart)

  nd = x.ndim
  alpha_bar = bcast(gd.alphas_cumprod, t, nd)
  if t_next is not None:
    alpha_bar_prev = bcast(gd.alphas_cumprod, t_next, nd)
  else:
    alpha_bar_prev = bcast(gd.alphas_cumprod_prev, t, nd)

  sigma = (eta * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar)) *
           jnp.sqrt(1 - alpha_bar / alpha_bar_prev))
  mean = (pred_xstart * jnp.sqrt(alpha_bar_prev) +
          jnp.sqrt(jnp.maximum(1 - alpha_bar_prev - sigma**2, 0.0)) * eps)
  noise = jax.random.normal(noise_rng, x.shape, x.dtype)
  nonzero = (t.reshape(-1) > 0).astype(x.dtype).reshape(
      (-1,) + (1,) * (nd - 1))
  sample = mean + nonzero * sigma * noise
  return {"sample": sample, "pred_xstart": pred_xstart, "rng": rng}


def sampling_timesteps(num_train_steps: int, num_sample_steps: int):
  """The strided timestep ladder T-1 … 0 used by the reference sampler."""
  ts = np.arange(num_train_steps - 1, 0,
                 -(num_train_steps // num_sample_steps), dtype=np.int32)
  return np.append(ts, 0).astype(np.int32)


def ddim_sample_loop(gd: GaussianDiffusion, eps_fn: Callable, rng,
                     shape, *, ys=None, cfg_scale: Optional[float] = None,
                     sampling_steps: int = 250, eta: float = 1.0,
                     clip_denoised: bool = False):
  """Full DDIM sampling as one lax.scan program + a final t=0 refinement.

  Returns dict(sample, y, rng); `sample` is the final predicted x0.
  """
  model_kwargs = dict(y=ys, cfg_scale=cfg_scale)
  rng, init_rng = jax.random.split(rng)
  img = jax.random.normal(init_rng, shape, jnp.float32)
  b = shape[0]

  ladder = jnp.asarray(sampling_timesteps(gd.num_timesteps, sampling_steps))

  def body(carry, i):
    rng, x = carry
    t = jnp.full((b,), ladder[i], jnp.int32)
    t_next = jnp.full((b,), ladder[i + 1], jnp.int32)
    out = ddim_step(gd, eps_fn, x, t, t_next, rng, eta=eta,
                    clip_denoised=clip_denoised, model_kwargs=model_kwargs)
    return (out["rng"], out["sample"]), None

  (rng, x), _ = jax.lax.scan(body, (rng, img), jnp.arange(sampling_steps))

  final = ddim_step(gd, eps_fn, x, jnp.zeros((b,), jnp.int32), None, rng,
                    eta=eta, clip_denoised=clip_denoised,
                    model_kwargs=model_kwargs)
  return {"sample": final["pred_xstart"], "y": ys, "rng": final["rng"]}
