"""Standalone evaluation of a checkpoint (no training).

Parity target: /root/reference/big_vision/tools/eval_only.py, rebuilt on the
jit-based evaluator framework: loads the config's model + latest checkpoint
in the workdir and runs every configured evaluator `eval_repeats` times.

  python -m small_vision_tpu.tools.eval_only \
      --config eval_ae_i1k.py:variant=B/4 --workdir /path/to/run
"""

import argparse


def main(argv=None):
  parser = argparse.ArgumentParser()
  parser.add_argument("--config", required=True)
  parser.add_argument("--workdir", required=True)
  parser.add_argument("--eval_repeats", type=int, default=1)
  args = parser.parse_args(argv)

  from small_vision_tpu.cli import parse_config
  config = parse_config(args.config)
  config.force_eval = True
  config.save_ckpt = False

  from small_vision_tpu.train import train_ae
  for _ in range(args.eval_repeats):
    train_ae.train_and_evaluate(config, args.workdir)


if __name__ == "__main__":
  main()
