"""VAE + latent-diffusion path tests (tiny VAE, synthetic data)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from small_vision_tpu.models import vae as vae_lib

from tests.test_train import smoke_config

pytestmark = pytest.mark.slow


def test_vae_shapes_roundtrip():
  """Tiny-channel AutoencoderKL: encode 8x downsample, decode back."""
  model = vae_lib.AutoencoderKL(block_out_channels=(32, 32, 32, 32))
  x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
  params = model.init(jax.random.PRNGKey(1), x)["params"]
  z = model.apply({"params": params}, x, jax.random.PRNGKey(2),
                  method=model.encode)
  assert z.shape == (2, 4, 4, 4)
  y = model.apply({"params": params}, z, method=model.decode)
  assert y.shape == (2, 32, 32, 3)
  assert np.isfinite(np.asarray(y)).all()


def test_vae_encode_deterministic_mean():
  model = vae_lib.AutoencoderKL(block_out_channels=(32, 32, 32, 32))
  x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
  params = model.init(jax.random.PRNGKey(1), x)["params"]
  z1 = model.apply({"params": params}, x, None, sample=False,
                   method=model.encode)
  z2 = model.apply({"params": params}, x, None, sample=False,
                   method=model.encode)
  np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
  # Sampling adds noise.
  z3 = model.apply({"params": params}, x, jax.random.PRNGKey(5),
                   method=model.encode)
  assert not np.allclose(np.asarray(z1), np.asarray(z3))


@pytest.mark.slow
def test_latent_diffusion_training_smoke(tmp_path, monkeypatch):
  """End-to-end latent UMD training step with a tiny VAE."""
  import small_vision_tpu.models.vae as vae_mod
  from small_vision_tpu.train import train_ae

  # Patch load_vae to a tiny VAE so the smoke test stays fast.
  orig_load = vae_mod.load_vae

  def tiny_load_vae(weights_path=None, image_size=32, rng=None):
    model = vae_mod.AutoencoderKL(block_out_channels=(32, 32, 32, 32))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]

    def enc(p, rng, images, scale=True):
      return model.apply({"params": p}, images, rng, scale=scale,
                         method=model.encode)

    def dec(p, latents, scale=True):
      return model.apply({"params": p}, latents, scale=scale,
                         method=model.decode)
    return params, enc, dec

  monkeypatch.setattr(vae_mod, "load_vae", tiny_load_vae)

  config = smoke_config()
  config.latent_diffusion = True
  config.size = 32
  config.diffusion_space = (4, 4, 4)
  config.total_steps = 2
  config.log_training_steps = 1
  config.input["data"] = dict(name="synthetic", img_size=32,
                              num_examples=64, num_classes=10)
  config.model = dict(width=32, depth=1, dec_depth=1, num_heads=4,
                      img_size=4, patch_size=(1, 1), channels=4,
                      scan=False, adaln=True, dtype_mm="float32")
  state, _ = train_ae.train_and_evaluate(config, str(tmp_path))
  assert "vae_params" in state
  import json
  rows = [json.loads(l) for l in
          (tmp_path / "sv_tpu_metrics.txt").read_text().splitlines()]
  assert all(np.isfinite(r["training_loss"]) for r in rows
             if "training_loss" in r)
