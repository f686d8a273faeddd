"""Small stateless helpers.

Parity targets in /root/reference/big_vision/utils.py: `itstime` (:410),
`hms` (:457), `onehot` (:193), `make_grid` (:66), `sync` (:1166),
`pad_shard_unpad` (:114), `accumulate_gradient` (:388), and real (non-stub)
profiler start/stop (:1228 is a no-op TODO in the reference; here it drives
`jax.profiler` for actual TPU traces).
"""

import contextlib
import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np


def honor_env_platform():
  """Re-applies JAX_PLATFORMS after a pre-imported jax ignored it.

  This environment's interpreter pre-imports jax with the platform pinned
  to the tunneled chip ('axon,cpu'), so `JAX_PLATFORMS=cpu python ...`
  smoke runs silently land on the REAL chip — and block on the tunnel
  (found round 5: the latent FID drill's documented CPU smoke hung on a
  live 127.0.0.1:8113 connection at 0% CPU). Backends initialize lazily;
  re-asserting the env var via jax.config before the first device query
  wins (same trick as tests/conftest.py and cli.py:50).
  """
  if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def itstime(step, every_n_steps, total_steps, host=None, last=True,
            first=True, drop_close_to_last=0.25):
  """True when a periodic action should run at `step`.

  Semantics match the reference predicate: fire every `every_n_steps`, also on
  the final step when `last`, on step 1 when `first`, and skip a periodic hit
  that lands within `drop_close_to_last * every_n_steps` of the end.
  """
  if not every_n_steps:
    return False
  if host is not None and jax.process_index() != host:
    return False

  # Skip periodic hits that land within drop_close_to_last*every_n of the end
  # (e.g. don't checkpoint 2 steps before the final checkpoint).
  close_to_last = bool(
      drop_close_to_last and
      abs(step - total_steps) < drop_close_to_last * every_n_steps)

  is_periodic = step % every_n_steps == 0 and not close_to_last
  is_last = step == total_steps
  is_first = step == 1
  return bool(is_periodic or (last and is_last) or (first and is_first))


def hms(seconds: float) -> str:
  """Formats a duration as e.g. '1h23m45s' (no leading zero units)."""
  seconds = int(round(seconds))
  h, rem = divmod(seconds, 3600)
  m, s = divmod(rem, 60)
  if h:
    return f"{h}h{m}m{s}s"
  if m:
    return f"{m}m{s}s"
  return f"{s}s"


def onehot(labels, num_classes, *, on_value=1.0, off_value=0.0):
  x = (labels[..., None] == jnp.arange(num_classes)[None])
  return jnp.where(x, on_value, off_value).astype(jnp.float32)


def make_grid(images, num_samples=36):
  """Tiles the first `num_samples` images into a square grid (numpy, HWC)."""
  if isinstance(images, dict):
    images = images.get("samples", next(iter(images.values())))
  images = np.asarray(jax.device_get(images))[:num_samples]
  n = images.shape[0]
  side = int(math.ceil(math.sqrt(n)))
  h, w, c = images.shape[1:]
  grid = np.zeros((side * h, side * w, c), dtype=images.dtype)
  for i in range(n):
    r, col = divmod(i, side)
    grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = images[i]
  return grid


def sync():
  """Cross-process barrier: a tiny jitted psum over one scalar per device."""
  x = jnp.ones([jax.local_device_count()])
  x = jax.device_get(jax.pmap(lambda x: jax.lax.psum(x, "i"), "i")(x))
  assert x[0] == jax.device_count()


def pad_shard_unpad(wrapped, static_argnums=(0,), static_argnames=()):
  """Wraps fn so batches not divisible by device count are padded & unpadded.

  The wrapped fn gains a `min_device_batch` kwarg; inputs are zero-padded up
  to a device-divisible size, and outputs with a leading batch dim are sliced
  back. Used by evaluators on remainder batches.
  """

  def pad_shard_unpad_wrapper(*args, min_device_batch=None, **kw):
    d = jax.device_count()
    batch_sizes = set()
    for i, a in enumerate(args):
      if i not in static_argnums:
        batch_sizes |= {t.shape[0] for t in jax.tree.leaves(a)}
    for k, v in kw.items():
      if k not in static_argnames:
        batch_sizes |= {t.shape[0] for t in jax.tree.leaves(v)}
    assert len(batch_sizes) == 1, f"Inconsistent batch sizes: {batch_sizes}"
    b = batch_sizes.pop()

    def pad(x):
      if not hasattr(x, "shape"):
        return x
      db, rest = divmod(b, d)
      if rest:
        db += 1
      if min_device_batch and db < min_device_batch:
        db = min_device_batch
      if db * d == b:
        return x
      return np.concatenate(
          [np.asarray(x),
           np.zeros((db * d - b,) + x.shape[1:], x.dtype)], axis=0)

    def maybe_pad(tree, actually_pad=True):
      if not actually_pad:
        return tree
      return jax.tree.map(pad, tree)

    args = [maybe_pad(a, i not in static_argnums) for i, a in enumerate(args)]
    kw = {k: maybe_pad(v, k not in static_argnames) for k, v in kw.items()}
    out = wrapped(*args, **kw)

    def unpad(x):
      return jax.device_get(x)[:b] if hasattr(x, "shape") and x.shape and (
          x.shape[0] >= b) else x
    return jax.tree.map(unpad, out)

  return pad_shard_unpad_wrapper


def accumulate_gradient(loss_and_grad_fn, params, batch, accum_steps):
  """Grad accumulation over `accum_steps` microbatches via lax.scan.

  TPU-friendly: one traced program, no data-dependent Python loop. Assumes
  every array in `batch` splits evenly on axis 0.
  """
  if not accum_steps or accum_steps <= 1:
    return loss_and_grad_fn(params, batch)

  def microbatch(x):
    return x.reshape((accum_steps, x.shape[0] // accum_steps) + x.shape[1:])

  micro = jax.tree.map(microbatch, batch)

  def step_fn(acc, mb):
    (l, g) = loss_and_grad_fn(params, mb)
    acc_l, acc_g = acc
    return (acc_l + l, jax.tree.map(jnp.add, acc_g, g)), None

  l0, g0 = loss_and_grad_fn(params, jax.tree.map(lambda x: x[0], micro))
  rest = jax.tree.map(lambda x: x[1:], micro)
  (total_l, total_g), _ = jax.lax.scan(step_fn, (l0, g0), rest)
  scale = 1.0 / accum_steps
  return total_l * scale, jax.tree.map(lambda g: g * scale, total_g)


def startstop_prof(sess, step=None, first_step=0, log_steps=1,
                   surround=20, workdir=None, **kw):
  """Starts/stops a real `jax.profiler` trace around log steps.

  The reference stubs this out (utils.py:1228 TODO); here it captures a trace
  of `surround` steps beginning shortly after `first_step` and around every
  log step, written to `workdir/plugins/profile`.
  """
  steps_from_last_start = (step - first_step) % log_steps if step else 0
  if sess is None and step is not None and steps_from_last_start == 10:
    logdir = workdir or os.environ.get("SV_TPU_PROFILE_DIR", "/tmp/sv_tpu_prof")
    jax.profiler.start_trace(logdir)
    return {"logdir": logdir, "start_step": step}
  if sess is not None and (step is None or
                           step - sess["start_step"] >= surround):
    jax.profiler.stop_trace()
    return None
  return sess


@contextlib.contextmanager
def log_timing(measure_fn, name: str):
  """Times a block and reports the wall seconds via `measure_fn(name, secs)`."""
  import time
  t0 = time.monotonic()
  yield
  measure_fn(name, time.monotonic() - t0)


@functools.cache
def _cpu_device():
  return jax.devices("cpu")[0]


def put_cpu(tree):
  """Transfers a pytree to the host CPU device (keeps it out of HBM)."""
  return jax.device_put(tree, _cpu_device())
