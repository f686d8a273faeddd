"""GPipe-style pipeline parallelism over a 'pipe' mesh axis (shard_map).

The reference scales only by data parallelism (its 1-D mesh,
/root/reference/big_vision/trainers/train_ae.py:35,159); this module adds the
TPU-native pipeline axis the reference never had: transformer depth is
partitioned into S contiguous stages, each stage's block parameters live
ONLY on its stage's devices (P('pipe') on the stacked layer dim — depth-wise
ZeRO for free), and activations flow stage-to-stage over ICI via
`lax.ppermute` in a classic GPipe schedule:

  tick t (of M + S - 1):   stage s computes microbatch m = t - s
  after each tick:         one collective-permute shifts activations s -> s+1

Written with hand-rolled collectives inside `shard_map` (same philosophy as
explicit_step.py): the schedule is latency-visible, autodiff derives the
backward pipeline automatically (ppermute transposes to the reverse
permutation, the scan reverses), and tests pin it against the sequential
stack exactly.

Two entry points:
  - `pipeline_apply(block_fn, staged_params, ...)` takes pre-staged params
    (leaves [S, layers/S, ...], `stage_params`) — the standalone API.
  - `pipeline_apply_stacked(block_fn, stacked_params, ...)` takes the raw
    scanned-layer stack (leaves [num_layers, ...]) sharded P('pipe') on dim
    0 — the model-integration API (the Encoder's scan params pipe in
    unchanged; each device's local shard IS its stage's layers).

Batch-aligned conditioning (e.g. AdaLN's cond vector) rides along as `aux`:
it is microbatched like x, and stage s reads aux[t - s] at tick t —
matching the microbatch it is processing.

Composition: the pipeline axis composes with the batch axes — build
`make_mesh`-style meshes with a leading 'data' axis and shard the batch over
it; each data-parallel replica then pipelines over its own 'pipe' group.
Bubble fraction is the textbook (S-1)/(M+S-1); pick n_microbatches >= 4*S
in production.

No reference counterpart — cite: reference has none (torch DDP/NCCL only,
big_vision/trainers/train_ae.py:35).
"""

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:
  from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
  from jax.experimental.shard_map import shard_map


def stage_params(stacked_params, n_stages):
  """[num_layers, ...] leaves -> [n_stages, layers_per_stage, ...].

  The leading (n_stages) dim is the one to shard with P('pipe') so every
  device holds only its stage's layers.
  """

  def split(x):
    assert x.shape[0] % n_stages == 0, (
        f"num_layers {x.shape[0]} not divisible by {n_stages} stages")
    return x.reshape((n_stages, x.shape[0] // n_stages) + x.shape[1:])

  return jax.tree.map(split, stacked_params)


def unstage_params(staged_params):
  """Inverse of `stage_params`."""
  return jax.tree.map(
      lambda x: x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:]),
      staged_params)


def _check_batch(x, aux, mesh, batch_axes, n_microbatches):
  n_batch_shards = 1
  for a in (batch_axes or ()):
    n_batch_shards *= mesh.shape[a]
  assert x.shape[0] % n_batch_shards == 0, (x.shape, batch_axes)
  batch = x.shape[0] // n_batch_shards  # per-group local batch
  assert batch % n_microbatches == 0, (batch, n_microbatches)
  if aux is not None:
    for leaf in jax.tree.leaves(aux):
      assert leaf.shape[0] == x.shape[0], (
          f"aux leaves must be batch-aligned: {leaf.shape} vs {x.shape}")
  return batch


def _pipeline_local(block_fn, params_local, x_rep, aux_rep, *, axis,
                    n_stages, n_microbatches, local_batch):
  """Per-device GPipe schedule. params_local leaves: [layers/S, ...]."""
  mb = local_batch // n_microbatches

  def stage_fn(h, aux_mb):
    def body(h, layer_params):
      if aux_rep is None:
        return block_fn(layer_params, h), None
      return block_fn(layer_params, h, aux_mb), None

    h, _ = jax.lax.scan(body, h, params_local)
    return h

  s = jax.lax.axis_index(axis)
  split_mb = lambda a: a.reshape((n_microbatches, mb) + a.shape[1:])
  x_mb = split_mb(x_rep)
  aux_mb = (None if aux_rep is None
            else jax.tree.map(split_mb, aux_rep))
  state = jnp.zeros_like(x_mb[0])
  out = jnp.zeros_like(x_mb)
  perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
  total = n_microbatches + n_stages - 1

  def tick(carry, t):
    state, out = carry
    # Stage s processes microbatch m = t - s at tick t (clamped; garbage
    # ticks are never read back out). Stage 0 ingests fresh microbatches,
    # other stages consume the ppermute'd state.
    m_here = jnp.clip(t - s, 0, n_microbatches - 1)
    feed = x_mb[jnp.clip(t, 0, n_microbatches - 1)]
    h_in = jnp.where(s == 0, feed, state)
    aux_here = (None if aux_mb is None
                else jax.tree.map(lambda a: a[m_here], aux_mb))
    h_out = stage_fn(h_in, aux_here)
    # Last stage owns microbatch m = t - (S-1); write it (clamped index:
    # early garbage lands on slot 0 and is overwritten at t = S-1).
    m = jnp.clip(t - (n_stages - 1), 0, n_microbatches - 1)
    out = jax.lax.dynamic_update_index_in_dim(out, h_out, m, axis=0)
    state = jax.lax.ppermute(h_out, axis, perm)
    return (state, out), None

  (state, out), _ = jax.lax.scan(tick, (state, out), jnp.arange(total))
  # Only stage S-1 holds real outputs; broadcast them to every stage so
  # the result is replicated along the pipe axis.
  out = jnp.where(s == n_stages - 1, out, jnp.zeros_like(out))
  out = jax.lax.psum(out, axis)
  return out.reshape((local_batch,) + x_rep.shape[1:])


def _run(block_fn, params, params_spec, squeeze_stage, x, aux, *, mesh,
         axis, n_microbatches, batch_axes):
  n_stages = mesh.shape[axis]
  local_batch = _check_batch(x, aux, mesh, batch_axes, n_microbatches)
  x_spec = P(tuple(batch_axes)) if batch_axes else P()

  def per_device(params_shard, x_rep, aux_rep):
    if squeeze_stage:  # staged input: leaves [1, layers/S, ...] locally.
      params_shard = jax.tree.map(lambda p: p[0], params_shard)
    return _pipeline_local(
        block_fn, params_shard, x_rep, aux_rep, axis=axis,
        n_stages=n_stages, n_microbatches=n_microbatches,
        local_batch=local_batch)

  aux_specs = jax.tree.map(lambda _: x_spec, aux)
  fn = shard_map(per_device, mesh=mesh,
                 in_specs=(params_spec, x_spec, aux_specs),
                 out_specs=x_spec, check_vma=False)
  return fn(params, x, aux)


def pipeline_apply(block_fn, staged_params, x, *, mesh, axis="pipe",
                   n_microbatches, batch_axes=(), aux=None):
  """Applies `num_layers` blocks to x, pipelined over mesh axis `axis`.

  Args:
    block_fn: (layer_params, x[, aux]) -> x for ONE layer; layer_params is
      one leading-dim slice of the stacked params. The aux argument is
      passed iff `aux` is given.
    staged_params: output of `stage_params` — leaves [S, layers/S, ...],
      placed with P(axis) on dim 0 (see `staged_param_specs`).
    x: [B, ...] activations, replicated along `axis`; optionally sharded on
      dim 0 over `batch_axes` (each data-parallel group pipelines its own
      batch shard).
    mesh: the device mesh (must contain `axis`).
    n_microbatches: M; the per-group batch must divide by M.
    batch_axes: mesh axes the batch dim of x is sharded over (e.g.
      ("data",)); params are replicated along them.
    aux: optional pytree of batch-aligned ([B, ...]) conditioning tensors
      delivered per-microbatch to block_fn (e.g. the AdaLN cond vector).

  Returns x after all layers, identical (to float tolerance) to running the
  blocks sequentially. Differentiable: grads w.r.t. staged_params come back
  with the same P(axis) placement (stage-local), grads w.r.t. x replicated.
  """
  spec_p = jax.tree.map(lambda _: P(axis), staged_params)
  return _run(block_fn, staged_params, spec_p, True, x, aux, mesh=mesh,
              axis=axis, n_microbatches=n_microbatches,
              batch_axes=batch_axes)


def pipeline_apply_stacked(block_fn, stacked_params, x, *, mesh, axis="pipe",
                           n_microbatches, batch_axes=(), aux=None):
  """`pipeline_apply` taking the raw scanned-layer stack.

  stacked_params leaves are [num_layers, ...] (the nn.scan layout) with
  num_layers divisible by the 'pipe' axis size; sharding them P(axis) on
  dim 0 makes each device's local shard exactly its stage's contiguous
  layers — no re-staging reshape, so a scanned flax model pipes its
  parameters in unchanged.
  """
  n_stages = mesh.shape[axis]
  for leaf in jax.tree.leaves(stacked_params):
    assert leaf.shape[0] % n_stages == 0, (
        f"num_layers {leaf.shape[0]} not divisible by {n_stages} stages")
  spec_p = jax.tree.map(lambda _: P(axis), stacked_params)
  return _run(block_fn, stacked_params, spec_p, False, x, aux, mesh=mesh,
              axis=axis, n_microbatches=n_microbatches,
              batch_axes=batch_axes)


def staged_param_specs(staged_params, axis="pipe"):
  """PartitionSpec tree placing the stage dim of every leaf on `axis`."""
  return jax.tree.map(lambda _: P(axis), staged_params)


def bubble_fraction(n_stages, n_microbatches):
  """The GPipe idle fraction (S-1)/(M+S-1)."""
  return (n_stages - 1) / (n_microbatches + n_stages - 1)
