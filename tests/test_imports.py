"""Every public module imports cleanly (catches bitrot in rarely-hit paths)."""

import importlib

import pytest

MODULES = [
    "small_vision_tpu",
    "small_vision_tpu.cli",
    "small_vision_tpu.launch",
    "small_vision_tpu.optim",
    "small_vision_tpu.configs.common",
    "small_vision_tpu.configs.common_fewshot",
    "small_vision_tpu.configs.ae_i1k",
    "small_vision_tpu.configs.ae_i1k_lp",
    "small_vision_tpu.configs.eval_ae_i1k",
    "small_vision_tpu.data.core",
    "small_vision_tpu.data.pipeline",
    "small_vision_tpu.data.synthetic",
    "small_vision_tpu.data.arrays",
    "small_vision_tpu.data.latents",
    "small_vision_tpu.data.sequence_packing",
    "small_vision_tpu.data.native_jpeg",
    "small_vision_tpu.data.imagenet",
    "small_vision_tpu.evaluators.common",
    "small_vision_tpu.evaluators.classification",
    "small_vision_tpu.evaluators.diffusion_loss",
    "small_vision_tpu.evaluators.diffusion_sampling",
    "small_vision_tpu.evaluators.fewshot_lsr",
    "small_vision_tpu.evaluators.fid",
    "small_vision_tpu.evaluators.inception",
    "small_vision_tpu.evaluators.mae_reconstruction",
    "small_vision_tpu.evaluators.mean",
    "small_vision_tpu.evaluators.save",
    "small_vision_tpu.models.ae",
    "small_vision_tpu.models.vit",
    "small_vision_tpu.models.vae",
    "small_vision_tpu.models.common",
    "small_vision_tpu.models.embeddings",
    "small_vision_tpu.ops.attention",
    "small_vision_tpu.ops.diffusion",
    "small_vision_tpu.ops.masking",
    "small_vision_tpu.parallel",
    "small_vision_tpu.parallel.ctx",
    "small_vision_tpu.pp.autoaugment",
    "small_vision_tpu.pp.builder",
    "small_vision_tpu.pp.ops_general",
    "small_vision_tpu.pp.ops_image",
    "small_vision_tpu.pp.registry",
    "small_vision_tpu.pp.utils",
    "small_vision_tpu.tools.eval_only",
    "small_vision_tpu.tools.download_tfds_datasets",
    "small_vision_tpu.train.train_ae",
    "small_vision_tpu.train.linear_ae",
    "small_vision_tpu.utils",
    "small_vision_tpu.utils.checkpoint",
    "small_vision_tpu.utils.losses",
]


@pytest.mark.parametrize("name", MODULES)
def test_module_imports(name):
  importlib.import_module(name)
