"""Multi-host launch helpers.

Parity targets:
  - /root/reference/big_vision/train_tpu.py — TPU pods: auto-discovery via
    `jax.distributed.initialize()` (handled by parallel.init_distributed and
    cli.py).
  - /root/reference/big_vision/ibrun.py — MPI/HPC clusters: rank/size from
    mpi4py COMM_WORLD feed explicit coordinator args. mpi4py is optional.

Usage on an HPC cluster (one process per accelerator):
  ibrun python -m small_vision_tpu.launch --config ae_i1k.py:... --workdir W
"""

import os
import sys


def mpi_initialize(coordinator_port: int = 29500):
  """Initializes jax.distributed from MPI rank/size (reference ibrun.py)."""
  try:
    from mpi4py import MPI
  except ImportError as e:
    raise ImportError(
        "mpi4py is not installed; use the plain CLI on TPU pods "
        "(jax.distributed auto-discovers) or install mpi4py for HPC.") from e

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
