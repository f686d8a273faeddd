"""small_vision_tpu: a TPU-native unified masked-diffusion vision framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
`philippe-eecs/small-vision` (UMD: Unified Masked Diffusion). See SURVEY.md at
the repo root for the reference layer map this build tracks.

Layering (bottom → top):
  utils/      pure-Python substrate: trees, schedules, timing, metrics, config.
  parallel/   mesh construction, sharding inference, resharding, collectives.
  ops/        device math: diffusion core, Pallas kernels, device-side pp ops.
  pp/         string-minilanguage preprocessing (host + device stages).
  data/       data sources and the input pipeline (host → global device arrays).
  models/     Flax models: ViT encoder stacks, the unified AE, embeddings.
  evaluators/ eval framework: losses, reconstruction, sampling, probes, FID.
  train/      trainer main loops (pretrain/finetune AE, linear probe).
"""

__version__ = "0.1.0"
