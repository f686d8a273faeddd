"""Checkpoint utils: npz roundtrip, abstract trees, metric writer, chrono."""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from small_vision_tpu.utils import checkpoint as ckpt_lib
from small_vision_tpu.utils.chrono import Chrono
from small_vision_tpu.utils.metrics import MetricWriter


def test_npz_roundtrip(tmp_path):
  params = {"enc": {"w": jnp.arange(6.0).reshape(2, 3)},
            "b": jnp.ones(4)}
  path = str(tmp_path / "params.npz")
  ckpt_lib.save_params_npz(path, params)
  loaded = ckpt_lib.load_params_npz(path)
  np.testing.assert_array_equal(np.asarray(loaded["enc"]["w"]),
                                np.asarray(params["enc"]["w"]))
  np.testing.assert_array_equal(np.asarray(loaded["b"]), 1.0)


def test_abstract_like():
  state = {"p": jnp.zeros((4, 2)), "n": 3}
  abstract = ckpt_lib.abstract_like(state)
  assert abstract["p"].shape == (4, 2)
  assert abstract["n"] == 3


def test_metric_writer(tmp_path):
  mw = MetricWriter(str(tmp_path))
  mw.step_start(5)
  mw.measure("loss", jnp.asarray(1.5))
  mw.measure("vec", np.asarray([1.0, 2.0]))
  mw.step_end()
  mw.close()
  rows = [json.loads(l) for l in
          (tmp_path / "sv_tpu_metrics.txt").read_text().splitlines()]
  assert rows == [{"step": 5, "loss": 1.5, "vec": [1.0, 2.0]}]
  assert (tmp_path / "config.json").exists() is False  # no config given


def test_chrono_ticks_and_pause():
  c = Chrono()
  seen = {}
  c.inform(total_steps=100, global_bs=32, steps_per_epoch=10,
           measure=lambda k, v: seen.setdefault(k, v))
  c.tick(1)           # starts warmup window
  time.sleep(0.01)
  c.tick(5)           # ends warmup, starts timing
  t_timed0 = time.monotonic()
  c.pause(wait_for=())
  t_pause0 = time.monotonic()
  time.sleep(0.02)
  c.resume()
  t_pause1 = time.monotonic()
  time.sleep(0.01)
  c.tick(10)
  t_timed1 = time.monotonic()
  assert "z/img_per_sec" in seen
  # Paused time is excluded. Bound against measured monotonic spans (not a
  # wall-clock constant — this box runs loaded) with slack for the stamps
  # sitting outside Chrono's own clock reads.
  unpaused = (t_pause0 - t_timed0) + (t_timed1 - t_pause1)
  total = t_timed1 - t_timed0
  assert seen["z/secs_per_step"] * 5 <= unpaused + 0.005
  assert seen["z/secs_per_step"] * 5 <= total - (t_pause1 - t_pause0) + 0.005
  state = c.save()
  c2 = Chrono()
  c2.load(state)
  assert c2.accum_train_time == c.accum_train_time
