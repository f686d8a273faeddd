"""Device-mesh construction and distributed init.

TPU-first design: the trainer runs over an explicit N-D
`jax.sharding.Mesh`. The default is the reference's 1-D data mesh
(/root/reference/big_vision/trainers/train_ae.py:35,159), but any of the axes
(data, fsdp, tensor) may be given a size so GSPMD lays collectives onto ICI:

  make_mesh()                          # ("data",) over all devices
  make_mesh(fsdp=8)                    # ("data", "fsdp") = (n//8, 8)
  make_mesh(data=2, fsdp=2, tensor=2)  # 3-D mesh

Axis roles:
  data   — batch dim of activations; gradient psum rides this axis.
  fsdp   — parameter/optimizer sharding (ZeRO-3 style all-gather/reduce-
           scatter); batch is ALSO sharded over it (treated as extra DP).
  tensor — reserved for tensor-parallel layers (width sharding).
"""

import functools
from typing import Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "fsdp", "tensor", "pipe")
# Batch is sharded over both pure-DP and FSDP axes.
BATCH_AXES = ("data", "fsdp")


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
  """Initializes multi-host JAX. No-op if already initialized or single-proc.

  TPU pods auto-discover (reference: train_tpu.py:31); GPU/HPC launchers pass
  explicit coordinator info (reference: ibrun.py:30-33).
  """
  if num_processes is not None and num_processes <= 1:
    return
  try:
    if coordinator_address:
      jax.distributed.initialize(coordinator_address=coordinator_address,
                                 num_processes=num_processes,
                                 process_id=process_id)
    else:
      jax.distributed.initialize()
  except (RuntimeError, ValueError):
    pass  # Already initialized, or single-process environment.


def make_mesh(devices=None, *, data: int = -1, fsdp: int = 1,
              tensor: int = 1, pipe: int = 1) -> Mesh:
  """Builds an N-D mesh; `data=-1` absorbs all remaining devices.

  Only axes with size > 1 (plus 'data') are materialized, so the common case
  stays a 1-D ("data",) mesh and PartitionSpecs mentioning absent axes must
  not be used (use `batch_spec(mesh)` helpers below). `pipe` is the pipeline
  stage axis consumed by parallel/pipeline.py.
  """
  devices = devices if devices is not None else jax.devices()
  n = len(devices)
  if fsdp in (0, -1):  # "all devices on the fsdp axis" (pure ZeRO).
    assert n % max(tensor * pipe, 1) == 0
    fsdp, data = n // max(tensor * pipe, 1), 1
  sizes = {"fsdp": fsdp, "tensor": tensor, "pipe": pipe}
  rest = int(np.prod([v for v in sizes.values()]))
  if data == -1:
    assert n % rest == 0, f"{n} devices not divisible by fsdp*tensor={rest}"
    data = n // rest
  shape = {"data": data, **sizes}
  used = {k: v for k, v in shape.items() if v > 1 or k == "data"}
  assert int(np.prod(list(used.values()))) == n, (
      f"Mesh shape {used} does not cover {n} devices")
  mesh_devices = mesh_utils.create_device_mesh(
      tuple(used.values()), devices=devices)
  return Mesh(mesh_devices, tuple(used.keys()))


def batch_axes(mesh: Mesh):
  """The tuple of mesh axes the batch dimension is sharded over."""
  return tuple(a for a in BATCH_AXES if a in mesh.axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
  """NamedSharding for a batch-major array: axis 0 over (data, fsdp)."""
  return NamedSharding(mesh, P(batch_axes(mesh)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh):
  """Sharding constraint pinning activation batch dims inside jit bodies."""
  return jax.lax.with_sharding_constraint(
      x, NamedSharding(mesh, P(batch_axes(mesh))))


@functools.cache
def local_mesh_info(mesh: Mesh):
  """(n_local_devices, n_global_devices, batch_shard_count) for the mesh."""
  n_batch = int(np.prod([mesh.shape[a] for a in batch_axes(mesh)]))
  return jax.local_device_count(), jax.device_count(), n_batch
