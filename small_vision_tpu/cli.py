"""CLI entry point.

Parity target: /root/reference/big_vision/train_tpu.py + train.py — one flag
surface: `--config <module.py>:<arg-string> --workdir W --main {ae,lp_ae}`.
Multi-host init happens automatically on TPU pods (jax.distributed).

  python -m small_vision_tpu.cli --config ae_i1k.py:variant=B/4,size=64 \
      --workdir /tmp/run --main ae
"""

import argparse
import importlib
import os


def parse_config(spec: str):
  """`ae_i1k.py:key=val,...` or `pkg.module:args` → ConfigDict."""
  if ":" in spec:
    path, arg = spec.split(":", 1)
  else:
    path, arg = spec, None
  name = os.path.basename(path)
  if name.endswith(".py"):
    name = name[:-3]
  module = importlib.import_module(f"small_vision_tpu.configs.{name}")
  return module.get_config(arg)


def main(argv=None):
  parser = argparse.ArgumentParser()
  parser.add_argument("--config", required=True,
                      help="config file spec: name.py:arg,arg=val")
  parser.add_argument("--workdir", default=None)
  parser.add_argument("--main", default="ae", choices=["ae", "lp_ae"])
  parser.add_argument("--jax_cache", default=".jax_cache",
                      help="persistent XLA compilation cache dir ('' = off)")
  parser.add_argument("--transfer_guard", default=None,
                      choices=[None, "allow", "log", "disallow"],
                      help="catch implicit host<->device transfers "
                           "(reference train_tpu.py:26's disabled guard)")
  parser.add_argument("--cleanup", action="store_true",
                      help="delete the workdir after a successful run "
                           "(reference utils.py:1306 maybe_cleanup_workdir)")
  args = parser.parse_args(argv)

  import jax
  # The interpreter may pre-import jax before env vars are seen; honor an
  # explicit JAX_PLATFORMS request (e.g. JAX_PLATFORMS=cpu smoke runs) here.
  if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
  if args.jax_cache:
    os.makedirs(args.jax_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(args.jax_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
  jax.config.update("jax_threefry_partitionable", True)
  if args.transfer_guard:
    jax.config.update("jax_transfer_guard", args.transfer_guard)

  from small_vision_tpu.parallel import init_distributed
  init_distributed()

  config = parse_config(args.config)

  if args.main == "ae":
    from small_vision_tpu.train import train_ae as trainer
  else:
    from small_vision_tpu.train import linear_ae as trainer
  trainer.train_and_evaluate(config, args.workdir)

  if args.cleanup and args.workdir and jax.process_index() == 0:
    import shutil
    shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == "__main__":
  main()
