"""Flax model zoo: ViT encoder stacks, the unified masked-diffusion AE."""

import importlib


def get_model_module(name: str):
  """Dispatch like the reference's `importlib` model loading
  (/root/reference/big_vision/trainers/train_ae.py:103)."""
  return importlib.import_module(f"small_vision_tpu.models.{name}")
