"""Tests for parity components: packing, merge_params, randaug, configs."""

import numpy as np
import pytest

from small_vision_tpu.configs import ae_i1k, ae_i1k_lp, eval_ae_i1k
from small_vision_tpu.data.sequence_packing import pack_examples
from small_vision_tpu.models.common import merge_params
from small_vision_tpu.pp.autoaugment import distort_image_with_randaugment


def test_pack_examples_basic():
  examples = [{"tok": np.arange(1, n + 1)} for n in [3, 4, 2, 5, 3]]
  rows = list(pack_examples(iter(examples), ["tok"], length=8,
                            batch_pack=2))
  total_tokens = sum(int((r["tok_seg"] > 0).sum()) for r in rows)
  assert total_tokens == 3 + 4 + 2 + 5 + 3
  for r in rows:
    assert r["tok"].shape == (8,)
    # Positions restart at 0 for each segment.
    segs = r["tok_seg"]
    for s in set(segs[segs > 0].tolist()):
      pos = r["tok_pos"][segs == s]
      np.testing.assert_array_equal(pos, np.arange(len(pos)))


def test_pack_drops_overlong():
  rows = list(pack_examples(iter([{"tok": np.arange(20)}]), ["tok"], 8))
  assert rows == []


def test_merge_params():
  inited = {"enc": {"kernel": np.zeros((2, 2)), "bias": np.zeros(2)},
            "head": {"kernel": np.ones((2, 4))}}
  loaded = {"enc": {"kernel": np.full((2, 2), 7.0),
                    "bias": np.full((2,), 3.0)},
            "old_head": {"kernel": np.zeros((2, 3))}}
  merged = merge_params(loaded, inited,
                        dont_load=("head/.*", "old_head/.*"))
  assert merged["enc"]["kernel"][0, 0] == 7.0
  assert merged["head"]["kernel"][0, 0] == 1.0      # kept fresh init
  assert "old_head" not in merged

  with pytest.raises(ValueError):
    merge_params({}, inited, dont_load=())           # missing, not excepted
  with pytest.raises(ValueError):
    merge_params({"enc": {"kernel": np.zeros((3, 3)),
                          "bias": np.zeros(2)}},
                 inited, dont_load=("head/.*",))     # shape mismatch


def test_randaug_runs_and_preserves_shape():
  rng = np.random.default_rng(0)
  img = rng.integers(0, 256, (64, 48, 3), dtype=np.uint8)
  for mag in [0, 5, 10]:
    out = distort_image_with_randaugment(img, num_layers=2, magnitude=mag,
                                         rng=np.random.default_rng(1))
    assert out.shape == img.shape and out.dtype == np.uint8


def test_randaug_pp_op():
  from small_vision_tpu.pp.builder import get_preprocess_fn
  host, _ = get_preprocess_fn("randaug(2, 10)")
  out = host({"image": np.zeros((32, 32, 3), np.uint8),
              "_rng": np.random.default_rng(0)})
  assert out["image"].shape == (32, 32, 3)


def test_ae_i1k_config_variants():
  c = ae_i1k.get_config("variant=B/4,size=64,batch_size=256,data=synthetic")
  assert c.model["variant"] == "B/4"
  assert c.diffusion_space == (64, 64, 3)
  assert c.diff_schedule["beta_schedule"] == "cosine"
  assert "fewshot" in c.evals and "val" in c.evals

  # MAE mode: pure reconstruction, no diffusion loss eval.
  mae = ae_i1k.get_config(
      "mask_ratio=0.75,no_noise_prob=1.0,adaln=False,data=synthetic")
  assert "val" not in mae.evals
  # DiT mode: no masking.
  dit = ae_i1k.get_config(
      "mask_ratio=0.0,no_noise_prob=0.0,data=synthetic")
  assert dit.evals["fewshot"]["pred"] == "noised_predict"

  lat = ae_i1k.get_config("latent_diffusion=True,size=256,data=synthetic")
  assert lat.diffusion_space == (32, 32, 4)
  assert lat.diff_schedule["beta_schedule"] == "linear"
  assert not lat.diff_schedule["clip_denoised"]

  cond = ae_i1k.get_config("use_labels=True,data=synthetic")
  assert cond.num_classes == 1000 and cond.ema_decay > 0
  assert "sample_cond" in cond.evals


def test_cli_parse_config():
  from small_vision_tpu.cli import parse_config
  for spec in ["ae_i1k.py:data=synthetic", "ae_i1k_lp.py:data=synthetic",
               "eval_ae_i1k.py:data=synthetic", "ae_i1k"]:
    c = parse_config(spec)
    assert "input" in c


def test_lp_and_eval_configs():
  lp = ae_i1k_lp.get_config("variant=B/4,data=synthetic")
  assert lp.num_classes == 1000 and lp.width == 768
  ev = eval_ae_i1k.get_config(
      "variant=B/4,data=synthetic,sampling_timesteps=50")
  assert ev.force_eval
  assert ev.diff_schedule["sampling_timesteps"] == 50
  ev_t = eval_ae_i1k.get_config("data=synthetic,transfer=True")
  assert "transfer" in ev_t.evals


def test_autoaugment_policies_run_and_are_seeded():
  from small_vision_tpu.pp.autoaugment import (
      AVAILABLE_POLICIES, POLICY_V0, distort_image_with_autoaugment)
  import numpy as np

  assert len(POLICY_V0) == 25  # reference autoaugment.py:46-77
  assert set(AVAILABLE_POLICIES) == {"v0", "test"}
  img = np.random.default_rng(0).integers(0, 256, (48, 48, 3), dtype=np.uint8)
  a = distort_image_with_autoaugment(img, "v0", np.random.default_rng(7))
  b = distort_image_with_autoaugment(img, "v0", np.random.default_rng(7))
  assert a.shape == img.shape and a.dtype == np.uint8
  np.testing.assert_array_equal(a, b)  # seeded → deterministic
  import pytest
  with pytest.raises(ValueError):
    distort_image_with_autoaugment(img, "nope", np.random.default_rng(0))


def test_autoaugment_pp_op_registered():
  import numpy as np
  from small_vision_tpu.pp import builder
  import small_vision_tpu.pp.autoaugment  # noqa: F401

  host, _ = builder.get_preprocess_fn('autoaugment("test")')
  ex = {"image": np.zeros((32, 32, 3), np.uint8),
        "_rng": np.random.default_rng(1)}
  out = host(ex)
  assert out["image"].shape == (32, 32, 3)
