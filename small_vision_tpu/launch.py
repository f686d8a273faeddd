"""Multi-host launch helpers.

Parity targets:
  - /root/reference/big_vision/train_tpu.py — TPU pods: auto-discovery via
    `jax.distributed.initialize()` (handled by parallel.init_distributed and
    cli.py).
  - /root/reference/big_vision/ibrun.py — MPI/HPC clusters: rank/size from
    mpi4py COMM_WORLD feed explicit coordinator args. Here mpi4py is
    optional: when it is absent, rank/size/local-rank are discovered from
    the launcher's environment (OpenMPI / SLURM / PMI), so `srun`/`mpirun`
    work without any MPI Python bindings.

Usage on an HPC cluster (one process per accelerator):
  ibrun python -m small_vision_tpu.launch --config ae_i1k.py:... --workdir W
  srun  python -m small_vision_tpu.launch --config ae_i1k.py:... --workdir W
"""

import os
import re
import sys


def env_rank_size():
  """(rank, size, local_rank) from launcher env vars, or None.

  Checked in order: OpenMPI (OMPI_COMM_WORLD_*), SLURM (SLURM_PROCID/
  SLURM_NTASKS/SLURM_LOCALID), generic PMI (PMI_RANK/PMI_SIZE).
  """
  schemes = [
      ("OMPI_COMM_WORLD_RANK", "OMPI_COMM_WORLD_SIZE",
       "OMPI_COMM_WORLD_LOCAL_RANK"),
      ("SLURM_PROCID", "SLURM_NTASKS", "SLURM_LOCALID"),
      ("PMI_RANK", "PMI_SIZE", "MPI_LOCALRANKID"),
  ]
  for rank_k, size_k, local_k in schemes:
    if rank_k in os.environ and size_k in os.environ:
      rank = int(os.environ[rank_k])
      size = int(os.environ[size_k])
      local = int(os.environ.get(local_k, 0))
      return rank, size, local
  return None


def first_host(nodelist: str) -> str:
  """First hostname of a SLURM nodelist ("a1,b2" / "node[003-008,011]")."""
  head = nodelist.split(",")[0]
  m = re.match(r"([^\[]+)\[(\d+)", nodelist)
  if m:
    prefix, num = m.group(1), m.group(2)
    return f"{prefix}{num}"
  return head


def coordinator_address(port: int) -> str:
  """Coordinator "host:port" for env-based init.

  Priority: SV_COORDINATOR_ADDRESS (host or host:port), then the first host
  of SLURM_STEP_NODELIST / SLURM_NODELIST / SLURM_JOB_NODELIST.
  """
  explicit = os.environ.get("SV_COORDINATOR_ADDRESS")
  if explicit:
    return explicit if ":" in explicit else f"{explicit}:{port}"
  for key in ("SLURM_STEP_NODELIST", "SLURM_NODELIST", "SLURM_JOB_NODELIST"):
    nodes = os.environ.get(key)
    if nodes:
      return f"{first_host(nodes)}:{port}"
  raise RuntimeError(
      "cannot determine the coordinator: set SV_COORDINATOR_ADDRESS=host[:port]"
      " (rank 0's hostname), or run under SLURM (nodelist env present), or"
      " install mpi4py (rank 0's hostname is then broadcast automatically).")


def mpi_initialize(coordinator_port: int = 29500):
  """Initializes jax.distributed from MPI rank/size (reference ibrun.py).

  With mpi4py installed, rank 0's hostname is broadcast over MPI (exactly
  the reference's scheme). Without it, rank/size come from the launcher's
  environment and the coordinator from SV_COORDINATOR_ADDRESS / the SLURM
  nodelist.
  """
  try:
    from mpi4py import MPI
  except ImportError:
    env = env_rank_size()
    if env is None:
      raise RuntimeError(
          "no mpi4py and no launcher env vars (OMPI_COMM_WORLD_RANK / "
          "SLURM_PROCID / PMI_RANK) — on TPU pods use the plain CLI "
          "(jax.distributed auto-discovers); under mpirun/srun these vars "
          "are set per task.") from None
    rank, size, local = env
    import jax
    jax.distributed.initialize(
        coordinator_address=coordinator_address(coordinator_port),
        num_processes=size,
        process_id=rank,
        local_device_ids=[local])
    return rank, size

  comm = MPI.COMM_WORLD
  rank, size = comm.Get_rank(), comm.Get_size()
  # Rank 0's hostname becomes the coordinator address, broadcast to all.
  import socket
  coordinator = comm.bcast(socket.gethostname(), root=0)

  import jax
  jax.distributed.initialize(
      coordinator_address=f"{coordinator}:{coordinator_port}",
      num_processes=size,
      process_id=rank,
      local_device_ids=[int(os.environ.get("MPI_LOCALRANKID", rank % 8))])
  return rank, size


def main():
  mpi_initialize()
  from small_vision_tpu import cli
  cli.main(sys.argv[1:])


if __name__ == "__main__":
  main()
