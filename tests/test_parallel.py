"""Sharding/mesh tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from small_vision_tpu import parallel


def test_virtual_devices():
  assert jax.device_count() == 8


def test_make_mesh_shapes():
  m1 = parallel.make_mesh()
  assert m1.axis_names == ("data",) and m1.shape["data"] == 8

  m2 = parallel.make_mesh(fsdp=4)
  assert m2.axis_names == ("data", "fsdp")
  assert m2.shape["data"] == 2 and m2.shape["fsdp"] == 4

  m3 = parallel.make_mesh(data=2, fsdp=2, tensor=2)
  assert m3.axis_names == ("data", "fsdp", "tensor")


def test_make_mesh_fsdp_all():
  m = parallel.make_mesh(fsdp=0)
  assert m.shape["fsdp"] == 8 and m.shape["data"] == 1
  assert parallel.batch_sharding(m).spec == P(("data", "fsdp"))


def test_infer_sharding_replicated_and_fsdp():
  mesh = parallel.make_mesh()
  tree = {
      "big": jax.ShapeDtypeStruct((1024, 512), jnp.float32),   # shardable
      "odd": jax.ShapeDtypeStruct((1021, 513), jnp.float32),   # indivisible
      "small": jax.ShapeDtypeStruct((4, 4), jnp.float32),      # too small
  }
  repl = parallel.infer_sharding(tree, mesh, "replicated")
  assert all(s.spec == P() for s in jax.tree.leaves(repl))

  fsdp = parallel.infer_sharding(tree, mesh, "fully_sharded")
  assert fsdp["big"].spec == P("data", None)    # largest dim = 1024 (dim 0)
  assert fsdp["odd"].spec == P()                # nothing divisible by 8
  assert fsdp["small"].spec == P()              # under threshold


def test_fsdp_prefers_fsdp_axis_on_2d_mesh():
  mesh = parallel.make_mesh(fsdp=4)
  tree = {"w": jax.ShapeDtypeStruct((512, 1024), jnp.float32)}
  shardings = parallel.infer_sharding(tree, mesh, "fully_sharded")
  assert shardings["w"].spec == P(None, "fsdp")  # largest dim over fsdp axis


def test_reshard_places_data():
  mesh = parallel.make_mesh()
  x = np.arange(16, dtype=np.float32).reshape(16, 1)
  sharded = parallel.reshard(x, parallel.batch_sharding(mesh))
  assert sharded.sharding.spec == P(("data",))
  np.testing.assert_array_equal(np.asarray(sharded), x)


def test_batch_sharded_psum_matches_local():
  """Data-parallel mean under jit equals the host-computed mean."""
  mesh = parallel.make_mesh()
  x = np.arange(64, dtype=np.float32)
  xg = parallel.reshard(x, parallel.batch_sharding(mesh))
  mean = jax.jit(jnp.mean)(xg)
  assert float(mean) == x.mean()


def test_gather_metrics_single_process():
  out = parallel.gather_metrics(jnp.asarray(3.5))
  assert out == 3.5


def test_tensor_parallel_rules():
  mesh = parallel.make_mesh(data=4, tensor=2)
  tree = {
      "Encoder": {"query": {"kernel": jax.ShapeDtypeStruct(
          (768, 12, 64), jnp.float32)},
                  "out": {"kernel": jax.ShapeDtypeStruct(
                      (12, 64, 768), jnp.float32)}},
      "MlpBlock_0": {"Dense_0": {"kernel": jax.ShapeDtypeStruct(
          (768, 3072), jnp.float32)}},
      "bias_tree": {"bias": jax.ShapeDtypeStruct((768,), jnp.float32)},
  }
  sh = parallel.infer_sharding(tree, mesh, "tensor_parallel")
  assert sh["Encoder"]["query"]["kernel"].spec == P(None, "tensor", None)
  assert sh["Encoder"]["out"]["kernel"].spec == P("tensor", None, None)
  assert sh["MlpBlock_0"]["Dense_0"]["kernel"].spec == P(None, "tensor")
  assert sh["bias_tree"]["bias"].spec == P()


def test_tensor_parallel_model_forward_matches_replicated():
  """A tiny AE fwd under TP sharding equals the replicated result."""
  import jax.numpy as jnp2
  from small_vision_tpu.models import ae as ae_mod
  from small_vision_tpu.parallel.ctx import activate_mesh

  model = ae_mod._ViTAE(width=64, depth=2, dec_depth=1, num_heads=4,
                        img_size=16, patch_size=(4, 4), scan=False,
                        adaln=True, dtype_mm="float32")
  x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 3))
  t = jnp2.zeros((4,), jnp2.int32)
  rngs = {"params": jax.random.PRNGKey(0),
          "mae_noise": jax.random.PRNGKey(1)}
  params = model.init(rngs, x, t=t, train=False, mask=0.0)["params"]

  def fwd(p, x):
    pred, _ = model.apply({"params": p}, x, t=t, train=False, mask=0.0)
    return pred

  ref = jax.jit(fwd)(params, x)

  mesh = parallel.make_mesh(data=4, tensor=2)
  tp_shardings = parallel.infer_sharding(params, mesh, "tensor_parallel")
  p_tp = parallel.reshard(params, tp_shardings)
  x_tp = parallel.reshard(np.asarray(x), parallel.batch_sharding(mesh))
  with activate_mesh(mesh):
    out = jax.jit(fwd)(p_tp, x_tp)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             rtol=1e-4, atol=1e-5)


def test_tp_fsdp_combined_strategy():
  """tp_fsdp: TP-rule leaves shard over 'tensor'; the rest ZeRO over 'fsdp'."""
  import jax
  import jax.numpy as jnp
  mesh = parallel.make_mesh(data=2, fsdp=2, tensor=2)
  tree = {
      "Encoder": {"blocks_00": {"MultiHeadAttention_0": {"query": {
          "kernel": jnp.zeros((64, 4, 16))}}}},
      "MlpBlock_0": {"Dense_0": {"kernel": jnp.zeros((64, 256))}},
      "embedding": jnp.zeros((1000, 64)),
      "bias": jnp.zeros((64,)),
  }
  sh = parallel.infer_sharding(tree, mesh, "tp_fsdp", min_size_to_shard=0)
  flat = dict(jax.tree_util.tree_leaves_with_path(
      jax.tree.map(lambda s: tuple(s.spec), sh)))
  by_name = {jax.tree_util.keystr(k): v for k, v in flat.items()}
  q = [v for k, v in by_name.items() if "query" in k][0]
  assert "tensor" in q, q                       # TP rule applied
  d0 = [v for k, v in by_name.items() if "Dense_0" in k][0]
  assert "tensor" in d0, d0
  emb = [v for k, v in by_name.items() if "embedding" in k][0]
  assert "fsdp" in emb and "tensor" not in emb, emb  # ZeRO fallback


def test_launch_env_rank_discovery(monkeypatch):
  """launch.py works without mpi4py: rank/size/coordinator from env vars
  (reference ibrun.py:30-33 needs mpi4py; srun/mpirun set these per task)."""
  import os

  from small_vision_tpu import launch

  for k in list(os.environ):
    if k.startswith(("OMPI_", "SLURM_", "PMI_")) or k == "SV_COORDINATOR_ADDRESS":
      monkeypatch.delenv(k, raising=False)
  assert launch.env_rank_size() is None

  monkeypatch.setenv("OMPI_COMM_WORLD_RANK", "3")
  monkeypatch.setenv("OMPI_COMM_WORLD_SIZE", "8")
  monkeypatch.setenv("OMPI_COMM_WORLD_LOCAL_RANK", "1")
  assert launch.env_rank_size() == (3, 8, 1)
  monkeypatch.delenv("OMPI_COMM_WORLD_RANK")
  monkeypatch.delenv("OMPI_COMM_WORLD_SIZE")

  monkeypatch.setenv("SLURM_PROCID", "5")
  monkeypatch.setenv("SLURM_NTASKS", "16")
  assert launch.env_rank_size() == (5, 16, 0)

  # Coordinator resolution: explicit env beats nodelist; nodelist brackets.
  monkeypatch.setenv("SLURM_NODELIST", "node[003-008,011]")
  assert launch.coordinator_address(29500) == "node003:29500"
  assert launch.first_host("a1,b2") == "a1"
  assert launch.first_host("gpu-07") == "gpu-07"
  monkeypatch.setenv("SV_COORDINATOR_ADDRESS", "10.0.0.1")
  assert launch.coordinator_address(29500) == "10.0.0.1:29500"
  monkeypatch.setenv("SV_COORDINATOR_ADDRESS", "10.0.0.1:4000")
  assert launch.coordinator_address(29500) == "10.0.0.1:4000"
