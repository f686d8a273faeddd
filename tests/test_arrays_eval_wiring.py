"""End-to-end wiring test: `arrays:<parent>` data serves the config's
DEFAULT evaluators (val loss + MAE recon + fewshot LP) — the exact path a
quality-parity run uses on a data-equipped machine (README data sources;
reference configs/ae_i1k.py:98-153 builds the same eval set on TFDS)."""

import jax
import jax.numpy as jnp
import ml_collections as mlc
import numpy as np
import pytest

from small_vision_tpu import parallel
from small_vision_tpu.configs import ae_i1k
from small_vision_tpu.data.arrays import write_arrays
from small_vision_tpu.evaluators import common as eval_common
from small_vision_tpu.ops import diffusion as gd_lib
from small_vision_tpu.train import train_ae

from tests.test_train import smoke_config


@pytest.fixture(scope="module")
def arrays_root(tmp_path_factory):
  root = tmp_path_factory.mktemp("arrays_parent")
  rng = np.random.default_rng(0)

  def mk(n_per):  # balanced classes, class-dependent pixel mean
    labels = np.repeat(np.arange(10), n_per)
    imgs = (rng.integers(0, 50, (10 * n_per, 16, 16, 3))
            + labels[:, None, None, None] * 20).clip(0, 255).astype(np.uint8)
    return imgs, labels.astype(np.int64)

  ti, tl = mk(6)
  vi, vl = mk(3)
  write_arrays(str(root / "train"), ti, tl)
  write_arrays(str(root / "validation"), vi, vl)
  return str(root)


@pytest.mark.slow  # 19 s — covered faster by test_eval_only_transfer's
# config check; the full wiring runs in the slow suite + digits drill.
def test_default_eval_set_on_arrays_parent(arrays_root):
  # Build the REAL config's eval dicts for an arrays parent root, then run
  # them against a tiny model. This covers: "arrays:<root>" name-string
  # resolution in ds_core.get, validation-subdir split resolution, tfds-style
  # subsplit clamping in the fewshot train split, and the decoded-pixels
  # eval pp (no decode/resize stage).
  full = ae_i1k.get_config(f"data=arrays:{arrays_root},eval_steps=7")
  assert set(full.evals) == {"val", "mae_val", "fewshot"}
  assert all(ev["log_steps"] == 7 for ev in full.evals.values())

  config = smoke_config()
  mesh = parallel.make_mesh()
  model = train_ae.build_model(config)
  rng = jax.random.PRNGKey(0)
  rngs = {"params": rng, "dropout": rng, "mae_noise": rng, "cfg": rng}
  params = model.init(rngs, jnp.zeros((2, 16, 16, 3)),
                      t=jnp.zeros((2,), jnp.int32), train=True,
                      mask=0.5)["params"]
  train_state = {"params": params,
                 "gd": gd_lib.GaussianDiffusion.create("cosine", 50),
                 "rng": rng}
  eval_fns = train_ae.make_eval_fns(model, config)

  cfg = mlc.ConfigDict()
  # The real eval dicts, shrunk: 16px images and 2-shot/1-seed fewshot so the
  # tiny smoke model accepts them and the test stays fast.
  evals = {k: dict(v) for k, v in full.evals.items()}
  pp = 'value_range(-1, 1)|keep("image", "label")'
  for k in ("val", "mae_val"):
    assert evals[k]["pp_fn"] == pp  # decoded-pixels pp (no decode/resize)
  evals["fewshot"].update(shots=(2,), num_seeds=1, num_classes=10,
                          display_first=[("imagenet", 2)],
                          pp_train=pp, pp_eval=pp)
  cfg.evals = evals
  cfg.batch_size = 8
  evaluators = eval_common.from_config(cfg, eval_fns, mesh)
  assert len(evaluators) == 3

  results = {}
  for name, ev, log_steps, prefix in evaluators:
    for k, v in ev.run(train_state):
      results[f"{prefix}{k}"] = v
  assert np.isfinite(results["val/loss"])
  assert np.isfinite(results["mae_val/masked_mse"])
  acc = results["fewshot/a/imagenet_2shot-seed-0"]
  assert 0.0 <= acc <= 1.0
