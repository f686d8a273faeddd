"""THE training config: UMD/MAE/DiT/MaskDiT on ImageNet-1k.

Parity target: /root/reference/big_vision/configs/ae_i1k.py — same arg spec
and derived fields, so reference invocations carry over:

  --config ae_i1k.py:variant=B/4,size=64,adaln=False,batch_size=4096
  (MAE:  mask_ratio=0.75, no_noise_prob=1.0, adaln=False)
  (DiT:  mask_ratio=0.0,  no_noise_prob=0.0)
  (MaskDiT: mask_ratio=0.5, no_noise_prob=0.0)
  (UMD:  defaults)

Extra args vs the reference: `data` (synthetic|imagenet2012|arrays:<path>),
`mesh_fsdp`, `attn_impl` — the TPU-native knobs.
"""

import ml_collections as mlc

from small_vision_tpu.configs import common as cc
from small_vision_tpu.configs.common_fewshot import get_fewshot_lsr


def get_config(arg=None):
  # scan=False default (TPU-first deviation): with the fused attention
  # kernels, scan+remat costs ~20-30% step time, and scan WITHOUT remat pins
  # all per-layer intermediates (HBM OOM). Unrolled+no-remat is fastest at
  # B/L scale; set scan=True only if compile size/memory demands it.
  arg = cc.parse_arg(
      arg, variant="B/4", scan=False, fsdp=False, batch_size=1024,
      use_labels=False, mask_ratio=0.375, no_noise_prob=0.5,
      mask_ratio_no_noise=0.75, finetune=False, lr=15e-5, wd=5e-2,
      beta2=0.95, size=64, adaln=True, epochs=800, area_min=80,
      use_preprocessed_latents=False, latent_diffusion=False, save_ckpt=True,
      data="imagenet2012", attn_impl="pallas", runlocal=False, heads=0,
      ckpt_steps=0, log_steps=0,  # 0 = keep the defaults (5000 / 100)
      eval_steps=0,  # 0 = per-evaluator defaults (25k loss / 10k fewshot)
      # quant: "" (bf16, default) | "int8_mlp" | "int8_all" — dynamic int8
      # matmuls (ops/quant.py). int8_all is opt-in for SAMPLING only
      # (+21% img/s bs64, +9.5% bs512) and stays opt-in until the
      # ImageNet-day gate flips it: real-weights FID(int8_all) within 0.5
      # of FID(bf16) on the class-cond B/4 finetune (runbook phase 5).
      # Evidence so far (all green, docs/MIGRATION.md "Quantization"):
      # loss-curve delta <=0.054%, digits LP delta <=1.7pp, FID-protocol
      # feature distance at numerical zero (perf/quant_fid_proxy.json).
      quant="",
      # FID scoring inputs for the sampling evaluators (ImageNet-day
      # runbook): reference mu/sigma .npz (evaluators/fid.py
      # compute_reference_stats) and converted InceptionV3 weights .npz
      # (scripts/convert_inception.py). Empty = samples saved, not scored.
      fid_stats="", inception_weights="",
      # 0 = protocol defaults (10k samples, 1024/call, fid batch 1024);
      # the runbook's dry-run mode shrinks these for CPU smoke runs.
      total_samples=0, samples_per_call=0, fid_batch=0)

  config = mlc.ConfigDict()
  config.finetune = arg.finetune
  config.size = arg.size
  config.latent_diffusion = arg.latent_diffusion
  if arg.latent_diffusion:
    assert arg.size == 256, "Latent diffusion only supports 256x256 images"
    config.diffusion_space = (32, 32, 4)
    config.use_preprocessed_latents = arg.use_preprocessed_latents
  else:
    config.diffusion_space = (arg.size, arg.size, 3)
  config.resize = int(arg.size * (256 / 246))
  config.seed = 0
  config.total_epochs = arg.epochs
  if arg.use_labels:
    config.num_classes = 1000
    config.ema_decay = 0.0001 * (arg.batch_size / 256)
  else:
    config.num_classes = None
  config.num_samples = 36
  config.no_noise_prob = arg.no_noise_prob
  config.mask_ratio = arg.mask_ratio
  config.mask_ratio_no_noise = arg.mask_ratio_no_noise
  config.batch_size = arg.batch_size
  config.use_labels = arg.use_labels

  config.diff_schedule = dict(
      eta=1.0,
      beta_schedule="linear" if arg.latent_diffusion else "cosine",
      clip_denoised=not arg.latent_diffusion,
      timesteps=1000,
      sampling_timesteps=125)
  config.num_samples_per_call = arg.samples_per_call or 1024
  config.fid_batch_size = arg.fid_batch or 1024
  config.patch_size = int(arg.variant.split("/")[1])

  config.input = dict()
  if arg.data == "synthetic":
    config.input.data = dict(name="synthetic", img_size=arg.size,
                             num_examples=50_000)
    pp_train = "|flip_lr"
  elif arg.data.startswith("arrays:"):
    config.input.data = dict(name="arrays", root=arg.data[len("arrays:"):])
    pp_train = "|flip_lr"
  else:
    config.input.data = dict(name=arg.data, split="train[:99%]")
    pp_train = (f"decode_jpeg_and_inception_crop(size={arg.size}, "
                f"area_min={arg.area_min})|flip_lr")
  pp_common = '|value_range(-1, 1)|keep("image", "label")'
  config.input.pp = pp_train + pp_common
  pp_eval = f"decode|resize_small({arg.size})|central_crop({arg.size})" \
      + pp_common
  if arg.data == "synthetic" or arg.data.startswith("arrays:"):
    # Already-decoded fixed-size uint8 images: no decode/resize stage. For
    # arrays, point `data=arrays:<parent>` at a dir with train/ and
    # validation/ subdirs so the val/fewshot evaluators resolve their splits.
    pp_eval = pp_common[1:]

  config.input.batch_size = arg.batch_size
  config.input.num_workers = 16
  config.input.prefetch_to_device = 4

  config.log_training_steps = arg.log_steps or 100
  config.ckpt_steps = arg.ckpt_steps or 5000
  config.save_ckpt = arg.save_ckpt

  config.model_name = "ae"
  config.model = dict(
      num_classes=config.num_classes,
      variant=arg.variant,
      scan=arg.scan,
      adaln=arg.adaln,
      channels=config.diffusion_space[-1],
      img_size=config.diffusion_space[0],
      remat_policy="nothing_saveable",
      attn_impl=arg.attn_impl,
      dtype_mm="bfloat16")
  if arg.quant:
    config.model["quant"] = arg.quant
  if arg.heads:
    # TPU speed knob: heads=6 at width 768 → head_dim 128 feeds the full
    # 128-lane MXU contraction in the attention dots (measured +13%
    # imgs/s at UMD-B/4 bs256 on v5e). Param count/shapes are unchanged
    # (packed (d, H, hd) kernels flatten identically); the attention
    # PATTERN deviates from the reference's 12-head UMD-B, so it's opt-in.
    config.model["num_heads"] = arg.heads

  config.optax_name = "adamw"
  config.clip_norm = 1.0
  config.warmup_epochs = int(0.05 * arg.epochs)
  config.peak_lr = arg.lr
  config.wd = arg.wd
  config.betas = (0.9, arg.beta2)

  def get_eval(split, dataset=arg.data):
    return dict(type="diffusion_loss",
                data=dict(name=dataset, split=split),
                pp_fn=pp_eval, log_steps=25_000, pred="loss",
                cache_final=True)

  def get_mae_eval(split, dataset=arg.data):
    return dict(type="mae_reconstruction",
                data=dict(name=dataset, split=split),
                pp_fn=pp_eval, log_steps=25_000, pred="patch",
                cache_final=True)

  def get_sample_eval(pred="cond_eps"):
    return dict(type="diffusion_sampling", pred=pred,
                total_samples=arg.total_samples or 10_000, log_steps=25_000)

  config.evals = {}
  if config.no_noise_prob < 1.0:
    config.evals["val"] = get_eval("validation")
  if config.mask_ratio > 0.0 or config.no_noise_prob > 0.0:
    config.evals["mae_val"] = get_mae_eval("validation")

  pred = "predict" if config.no_noise_prob > 0.0 else "noised_predict"
  config.evals["fewshot"] = get_fewshot_lsr(
      target_resolution=arg.size, resize_resolution=config.resize,
      datasets={"imagenet": (arg.data, arg.data,
                             "train[:100000]", "validation")},
      pred=pred)
  config.evals["fewshot"]["log_steps"] = 10_000

  if arg.fsdp:
    config.param_sharding = "fully_sharded"
    config.optim_sharding = "fully_sharded"
    config.mesh_fsdp = 0  # 0 → absorb all devices on the fsdp axis
    config.model.scan = True

  if config.no_noise_prob < 1.0 and arg.use_labels:
    config.evals["sample_cond"] = get_sample_eval("cond_eps")
    config.evals["sample_cfg_1_5"] = get_sample_eval("cfg_eps_2.0")
    config.evals["sample_cfg_4"] = get_sample_eval("cfg_eps_4.0")
    config.inception_reference_path = arg.fid_stats
    config.inception_weights = arg.inception_weights

  if arg.eval_steps < 0:  # -1 = no evaluators (pure-throughput drills).
    config.evals = {}
  elif arg.eval_steps:  # One knob over every evaluator's cadence.
    for ev in config.evals.values():
      ev["log_steps"] = arg.eval_steps

  if arg.runlocal:
    config.input.batch_size = 32
    config.input.num_workers = 2
    config.evals = {}
    if arg.data == "synthetic":
      config.input.data["num_examples"] = 512
    config.model.update(width=64, depth=2, dec_depth=1, num_heads=4,
                        scan=False)
    config.log_training_steps = 4
    config.ckpt_steps = 8
  return config
