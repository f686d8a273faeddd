"""Linear-probe finetune config.

Parity target: /root/reference/big_vision/configs/ae_i1k_lp.py — onehot
labels in pp, LARS probe over frozen AE features, classification evals on
train/minival/val.
"""

import ml_collections as mlc

from small_vision_tpu.configs import common as cc


def get_config(arg=None):
  arg = cc.parse_arg(
      arg, variant="B/4", batch_size=1024, size=64, adaln=True, epochs=90,
      use_noised_pred=False, latent_diffusion=False, scan=False,
      data="imagenet2012", pretrain_workdir="", lr=0.1, wd=0.0,
      runlocal=False)

  config = mlc.ConfigDict()
  config.seed = 0
  config.size = arg.size
  config.diffusion_space = (arg.size, arg.size, 3)
  config.num_classes = 1000
  config.total_epochs = arg.epochs
  config.use_noised_pred = arg.use_noised_pred
  config.pretrain_workdir = arg.pretrain_workdir or None
  config.peak_lr = arg.lr
  config.wd = arg.wd
  config.width = {"S": 384, "B": 768, "L": 1024}[arg.variant.split("/")[0]]
  config.diff_schedule = dict(beta_schedule="cosine", timesteps=1000)

  config.input = dict()
  if arg.data == "synthetic":
    config.input.data = dict(name="synthetic", img_size=arg.size)
    pp_train = ""
  else:
    config.input.data = dict(name=arg.data, split="train[:99%]")
    pp_train = (f"decode_jpeg_and_inception_crop(size={arg.size}, "
                f"area_min=80)")
  pp_common = ('|flip_lr|value_range(-1, 1)'
               '|onehot(1000, key="label", key_result="labels")'
               '|keep("image", "labels")')
  config.input.pp = pp_train + pp_common
  config.input.batch_size = arg.batch_size
  config.input.num_workers = 16

  config.log_training_steps = 100

  config.model_name = "ae"
  config.model = dict(
      num_classes=None, variant=arg.variant, scan=arg.scan,
      adaln=arg.adaln, channels=3, img_size=arg.size,
      dtype_mm="bfloat16")

  pp_eval = (f"decode|resize_small({arg.size})|central_crop({arg.size})"
             f'|value_range(-1, 1)|keep("image", "label")')
  if arg.data == "synthetic":
    pp_eval = 'value_range(-1, 1)|keep("image", "label")'

  def get_class_eval(split):
    return dict(type="classification",
                data=dict(name=arg.data, split=split),
                pp_fn=pp_eval, pred="predict", log_steps=5000)

  config.evals = {}
  if arg.data != "synthetic":
    config.evals["train"] = get_class_eval("train[:2%]")
    config.evals["minival"] = get_class_eval("train[99%:]")
    config.evals["val"] = get_class_eval("validation")

  if arg.runlocal:  # Tiny CPU smoke run (mirrors ae_i1k.py's runlocal).
    config.input.batch_size = 16
    config.input.num_workers = 2
    config.num_classes = 10
    config.width = 32
    config.evals = {}
    config.total_epochs = None
    config.total_steps = 6
    config.ckpt_steps = 3
    config.log_training_steps = 1
    if arg.data == "synthetic":
      config.input.data.update(num_examples=128, num_classes=10)
      config.input.pp = config.input.pp.replace("onehot(1000", "onehot(10")
    config.model = dict(width=32, depth=1, dec_depth=1, num_heads=4,
                        img_size=arg.size, patch_size=(4, 4), scan=False,
                        adaln=arg.adaln, num_classes=None,
                        dtype_mm="float32")
  return config
