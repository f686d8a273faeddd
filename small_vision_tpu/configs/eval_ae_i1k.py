"""Eval-only config: big FID runs + the transfer linear-probe suite.

Parity target: /root/reference/big_vision/configs/eval_ae_i1k.py —
force_eval, 50k-sample FID, configurable sampling_timesteps, multi-dataset
transfer probe.
"""


from small_vision_tpu.configs import common as cc
from small_vision_tpu.configs.ae_i1k import get_config as get_train_config
from small_vision_tpu.configs.common_fewshot import get_fewshot_lsr

# The reference's 10-dataset transfer suite (eval_ae_i1k.py:108-123). Only
# datasets with a local TFDS build will actually run.
TRANSFER_DATASETS = {
    "imagenet": ("imagenet2012", "imagenet2012",
                 "train[:100000]", "validation"),
    "cifar100": ("cifar100", "cifar100", "train", "test"),
    "cifar10": ("cifar10", "cifar10", "train", "test"),
    "food101": ("food101", "food101", "train", "validation"),
    "pets": ("oxford_iiit_pet", "oxford_iiit_pet", "train", "test"),
    "flowers": ("oxford_flowers102", "oxford_flowers102", "train", "test"),
    "dtd": ("dtd", "dtd", "train", "test"),
    "cars": ("cars196", "cars196", "train", "test"),
    "caltech": ("caltech101", "caltech101", "train", "test"),
    "sun397": ("sun397", "sun397", "train", "validation"),
}


def get_config(arg=None):
  arg = cc.parse_arg(
      arg, variant="B/4", batch_size=1024, size=64, adaln=True,
      use_labels=True, sampling_timesteps=125, total_samples=50_000,
      data="imagenet2012", transfer=False, latent_diffusion=False,
      # transfer_root: rewire every transfer dataset to
      # arrays:{transfer_root}/{name}/{train,validation} — stand-in (or
      # pre-ingested) local arrays instead of TFDS builds. This is how the
      # transfer suite dry-runs on a box with no TFDS data
      # (tests/test_eval_only_transfer.py).
      transfer_root="", runlocal=False)

  base = cc.pack_arg(
      variant=arg.variant, batch_size=arg.batch_size, size=arg.size,
      adaln=arg.adaln, use_labels=arg.use_labels, data=arg.data,
      latent_diffusion=arg.latent_diffusion, runlocal=arg.runlocal)
  config = get_train_config(base)
  config.force_eval = True
  # Duration units are exclusive (schedules.steps raises on two): replace
  # the train config's total_epochs with an explicit 0-step run. Caught by
  # tests/test_eval_only_transfer.py — the eval-only path was unrunnable
  # with both set.
  del config.total_epochs
  config.total_steps = 0
  config.save_ckpt = False
  config.diff_schedule["sampling_timesteps"] = arg.sampling_timesteps

  for name in list(config.evals):
    if name.startswith("sample"):
      config.evals[name]["total_samples"] = arg.total_samples

  if arg.transfer:
    datasets = TRANSFER_DATASETS
    if arg.transfer_root:
      datasets = {
          name: (f"arrays:{arg.transfer_root}/{name}",
                 f"arrays:{arg.transfer_root}/{name}",
                 "train", "validation")
          for name in TRANSFER_DATASETS}
    config.evals["transfer"] = get_fewshot_lsr(
        target_resolution=arg.size,
        resize_resolution=int(arg.size * 256 / 246),
        runlocal=arg.runlocal,
        datasets=datasets,
        pred="predict" if config.no_noise_prob > 0 else "noised_predict")
    if arg.runlocal:
      # Tiny-shapes smoke: 2-shot probes fit the stand-in arrays.
      config.evals["transfer"]["shots"] = (2,)
  return config
