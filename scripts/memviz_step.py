"""Compile-only HBM analysis of the native train step.

Prints XLA's memory_analysis() for the bench's train step: argument/output/
temp/peak bytes. Motivated by the r3 xprof finding that XLA auto-remat
recomputes the decoder MLP matmuls (~14 ms/step, 5%): this shows how far the
no-remat liveset overshoots (or doesn't) the v5e's HBM, i.e. whether the
recompute is load-bearing or a scheduler artifact worth chasing with flags.

Usage: python scripts/memviz_step.py [batch_size] [remat_policy]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
  import bench

  bs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
  if len(sys.argv) > 2:
    os.environ["SV_BENCH_REMAT"] = sys.argv[2]
  update_fn, train_state, batch, _, _ = bench._build_step(
      "native", bs, attn_impl="pallas")
  compiled = update_fn.lower(train_state, batch).compile()
  ma = compiled.memory_analysis()
  gb = 2.0**30
  print(f"batch_size={bs} remat={os.environ.get('SV_BENCH_REMAT', 'default')}")
  for k in ("argument_size_in_bytes", "output_size_in_bytes",
            "temp_size_in_bytes", "alias_size_in_bytes",
            "generated_code_size_in_bytes"):
    v = getattr(ma, k, None)
    if v is not None:
      print(f"  {k:32s} {v/gb:8.3f} GiB")
  peak = (getattr(ma, "argument_size_in_bytes", 0)
          + getattr(ma, "temp_size_in_bytes", 0)
          - getattr(ma, "alias_size_in_bytes", 0))
  print(f"  {'~peak (args+temp-alias)':32s} {peak/gb:8.3f} GiB")


if __name__ == "__main__":
  main()
