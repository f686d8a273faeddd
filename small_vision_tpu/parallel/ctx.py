"""Trace-time mesh context for activation sharding constraints.

TPU-first replacement for the reference's flax logical-axis indirection
(`nn.with_logical_constraint` + `nn.logical_axis_rules([("act_batch",
"data")])` around every jit — /root/reference/big_vision/models/vit.py:77 and
trainers/train_ae.py:635): model code calls `constrain(x, "batch", None,
"embed")` and, when a mesh is active, a `with_sharding_constraint` with the
real mesh axes is inserted; with no active mesh it's a no-op, so the same
model runs in single-device tests unchanged.

Logical names:
  "batch"  → the mesh batch axes ("data" [+ "fsdp" when present])
  "embed"  → the "tensor" axis when present (activation width sharding)
  None     → unconstrained dim
"""

import contextlib
import threading

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

_state = threading.local()


def current_mesh():
  return getattr(_state, "mesh", None)


@contextlib.contextmanager
def activate_mesh(mesh):
  """Makes `mesh` visible to `constrain` for the duration (incl. tracing)."""
  prev = current_mesh()
  _state.mesh = mesh
  try:
    yield mesh
  finally:
    _state.mesh = prev


def _resolve(name, mesh):
  if name is None:
    return None
  if name == "batch":
    axes = tuple(a for a in ("data", "fsdp") if a in mesh.axis_names)
    return axes if axes else None
  if name == "embed":
    return "tensor" if "tensor" in mesh.axis_names else None
  if name in mesh.axis_names:
    return name
  return None


def constrain(x, *names):
  """Applies a sharding constraint by logical dim names (no-op w/o mesh)."""
  mesh = current_mesh()
  if mesh is None:
    return x
  assert len(names) == x.ndim, f"{names} vs shape {x.shape}"
  spec = P(*(_resolve(n, mesh) for n in names))
  return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
