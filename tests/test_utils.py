"""Tests for the utility substrate: trees, schedules, config minilanguage."""

import jax.numpy as jnp
import numpy as np
import pytest

from small_vision_tpu.configs import common as cfg_common
from small_vision_tpu.utils import (
    create_learning_rate_schedule, hms, itstime, make_mask_trees,
    recover_tree, steps, tree_flatten_with_names, tree_get,
    tree_map_with_names, tree_map_with_regex, tree_size)


def test_tree_flatten_with_names_roundtrip():
  tree = {"a": {"b": np.zeros(2), "c": np.ones(3)}, "d": np.full(4, 2.0)}
  pairs, treedef = tree_flatten_with_names(tree)
  names = [n for n, _ in pairs]
  assert names == ["a/b", "a/c", "d"]
  rebuilt = recover_tree(names, [v for _, v in pairs])
  assert jnp.allclose(rebuilt["a"]["c"], tree["a"]["c"])
  assert treedef.unflatten([v for _, v in pairs])["d"][0] == 2.0


def test_tree_map_with_names_and_regex():
  tree = {"enc": {"kernel": 1.0, "bias": 2.0}, "dec": {"kernel": 3.0}}
  doubled = tree_map_with_regex(lambda v: v * 2, tree, [r".*kernel"])
  assert doubled == {"enc": {"kernel": 2.0, "bias": 2.0},
                     "dec": {"kernel": 6.0}}
  named = tree_map_with_names(lambda n, v: n, tree)
  assert named["dec"]["kernel"] == "dec/kernel"


def test_make_mask_trees_first_pattern_wins():
  tree = {"a": {"kernel": 0, "bias": 0}}
  m_kernel, m_all = make_mask_trees(tree, [r".*kernel", r".*"])
  assert m_kernel == {"a": {"kernel": True, "bias": False}}
  assert m_all == {"a": {"kernel": False, "bias": True}}


def test_tree_get_and_size():
  tree = {"x": {"y": np.zeros((2, 3))}}
  assert tree_get(tree, "x/y").shape == (2, 3)
  assert tree_size(tree) == 6


def test_steps_units():
  config = {"total_epochs": 10, "ckpt_steps": 500, "warmup_percent": 0.1}
  assert steps("total", config, data_size=1000, batch_size=100) == 100
  assert steps("ckpt", config) == 500
  assert steps("warmup", config, total_steps=200) == 20
  assert steps("missing", config, default=None) is None
  with pytest.raises(ValueError):
    steps("missing", config)


def test_lr_schedule_warmup_cosine():
  sched = create_learning_rate_schedule(
      total_steps=100, base=1.0, decay_type="cosine", warmup_steps=10)
  assert float(sched(0)) == 0.0
  assert float(sched(10)) == pytest.approx(1.0)
  assert float(sched(100)) == pytest.approx(0.0, abs=1e-6)
  # Monotonic decay after warmup.
  assert float(sched(50)) > float(sched(80))


def test_lr_schedule_rsqrt_and_stair():
  rs = create_learning_rate_schedule(
      total_steps=1000, base=1.0, decay_type="rsqrt", warmup_steps=100,
      timescale=100)
  assert float(rs(500)) == pytest.approx(1.0 / np.sqrt((500 + 0) / 100))
  st = create_learning_rate_schedule(
      total_steps=100, base=1.0, decay_type="stair",
      steps=[50], mults=[0.1])
  assert float(st(10)) == pytest.approx(1.0)
  assert float(st(60)) == pytest.approx(0.1)


def test_itstime():
  assert itstime(100, 100, 1000)
  assert not itstime(101, 100, 1000)
  assert itstime(1000, 300, 1000)          # last step
  assert itstime(1, 300, 1000)             # first step
  assert not itstime(950, 50, 960)         # periodic hit too close to last
  assert itstime(950, 50, 960, drop_close_to_last=0)
  assert not itstime(5, None, 1000)


def test_hms():
  assert hms(5) == "5s"
  assert hms(125) == "2m5s"
  assert hms(3700) == "1h1m40s"


def test_parse_arg_grammar():
  arg = cfg_common.parse_arg(
      "variant=B/4,adaln=False,epochs=10",
      variant="L/2", adaln=True, epochs=800, lr=1e-4)
  assert arg.variant == "B/4" and arg.adaln is False
  assert arg.epochs == 10 and arg.lr == 1e-4

  # Bare flag and positional-first-entry forms.
  assert cfg_common.parse_arg("runlocal", runlocal=False).runlocal is True
  assert cfg_common.parse_arg("128", res=224).res == 128

  with pytest.raises(ValueError):
    cfg_common.parse_arg("unknown=1", res=224)
  lazy = cfg_common.parse_arg("unknown=1.5", lazy=True, res=224)
  assert lazy.unknown == 1.5

  assert cfg_common.parse_arg(None, x=3).x == 3
  packed = cfg_common.pack_arg(a=1, b="s")
  assert cfg_common.parse_arg(packed, a=0, b="").b == "s"
