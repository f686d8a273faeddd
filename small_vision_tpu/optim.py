"""Optimizer construction: regex-masked optax chains + the trainer's AdamW.

Parity targets:
  - `make()` schedule/freeze/wd/lr-mult regex-masked chain
    (/root/reference/big_vision/optax.py:54-124) and `get_count`
    step-recovery from ScaleByScheduleState (:30-41).
  - The AE trainer's inline AdamW: warmup-cosine with batch-scaled peak LR,
    global-norm clip, no-decay mask over {cls, mask_token, bias}-style
    parameter names, bf16 first moment
    (/root/reference/big_vision/trainers/train_ae.py:125-152).
  - `scale_by_adafactor` BigVision variant (optax.py:162-191) and LARS for
    the linear probe (trainers/linear_ae.py:199-208).
"""

import operator
from typing import Sequence

import jax
import jax.numpy as jnp
import optax

from small_vision_tpu.utils import (create_learning_rate_schedule,
                                    make_mask_trees, tree_flatten_with_names)


def find_states(opt_state, cls):
  leaves = jax.tree_util.tree_leaves(
      opt_state, is_leaf=lambda node: isinstance(node, cls))
  return [leaf for leaf in leaves if isinstance(leaf, cls)]


def get_count(opt_state, jittable: bool = False):
  """Recovers the step count from the optimizer state itself.

  Works with both `optax.scale_by_schedule` states (the `make()` path) and
  `optax.adamw`'s ScaleByAdamState (the trainer's inline path), so the
  checkpoint needs no separate step field.
  """
  counts = [s.count for s in find_states(opt_state, optax.ScaleByScheduleState)]
  if not counts:
    counts = [s.count for s in find_states(opt_state, optax.ScaleByAdamState)]
  if jittable:
    return counts[0]
  unique = {int(c) for c in counts}
  assert len(unique) == 1, f"Ambiguous step counts: {unique}"
  return next(iter(unique))


def _make_mask_trees(params, patterns_values):
  patterns, values = zip(*patterns_values)
  return make_mask_trees(params, patterns), values


def _split_frozen(masks, scheds):
  """schedule=None freezes params; every param must be covered."""
  all_false = jax.tree.map(lambda *bools: not any(bools), *masks)
  not_covered = [k for k, v in tree_flatten_with_names(all_false)[0] if v]
  assert not not_covered, (
      f"All params must be covered (use None to freeze): {not_covered}")
  frozen_masks = [m for m, s in zip(masks, scheds) if s is None]
  frozen_mask = jax.tree.map(lambda *bools: any(bools),
                             *frozen_masks, all_false)
  live = [(m, s) for m, s in zip(masks, scheds) if s is not None]
  masks, scheds = zip(*live) if live else ((), ())
  return frozen_mask, masks, scheds


def make(config, params, *, sched_kw):
  """Builds (gradient_transform, schedule_fns) from a config dict.

  config keys: optax_name (attr path under optax, e.g. "scale_by_adam" or
  "big_vision.scale_by_adafactor"), optax (kwargs), lr, wd, wd_mults,
  lr_mults, schedule (dict or [(regex, dict|None), ...]), grad_clip_norm.
  """
  schedule = config.get("schedule", {})
  if not isinstance(schedule, (tuple, list)):
    schedule = [(".*", schedule)]
  masks, scheds = _make_mask_trees(params, schedule)
  frozen_mask, masks, scheds = _split_frozen(masks, scheds)
  not_frozen_mask = jax.tree.map(operator.not_, frozen_mask)

  schedule_fns = [
      create_learning_rate_schedule(
          base=s.get("mult", 1.0), **sched_kw,
          **{k: v for k, v in s.items() if k != "mult"})
      for s in (dict(s) for s in scheds)]
  schedule_txs = [
      optax.masked(optax.scale_by_schedule(fn), mask)
      for fn, mask in zip(schedule_fns, masks)
  ] + [optax.masked(optax.set_to_zero(), frozen_mask)]

  grad_clip_tx = (
      optax.masked(optax.clip_by_global_norm(config["grad_clip_norm"]),
                   not_frozen_mask)
      if config.get("grad_clip_norm") else optax.identity())

  tx_func = operator.attrgetter(config["optax_name"])(optax) \
      if "." in config["optax_name"] or hasattr(optax, config["optax_name"]) \
      else CUSTOM[config["optax_name"]]
  opt_txs = [optax.masked(tx_func(**config.get("optax", {})),
                          not_frozen_mask)]

  lr_mult_txs = [optax.scale(config["lr"])]
  if config.get("lr_mults"):
    mmasks, mults = _make_mask_trees(params, config["lr_mults"])
    assert all(m > 0 for m in mults), "Freeze with schedule=None, not lr_mult=0"
    lr_mult_txs += [optax.masked(optax.scale(m), mask)
                    for m, mask in zip(mults, mmasks)]

  wd_txs = []
  if config.get("wd"):
    wd_mults = config.get("wd_mults", [(".*/kernel$", 1.0)])
    wmasks, mults = _make_mask_trees(params, wd_mults)
    wd_txs = [optax.add_decayed_weights(config["wd"] * m, mask)
              for m, mask in zip(mults, wmasks)]

  return optax.chain(
      grad_clip_tx, *opt_txs, *lr_mult_txs, *wd_txs, *schedule_txs,
      optax.scale(-1.0)), schedule_fns


def adamw_trainer_tx(*, peak_lr: float, batch_size: int, total_steps: int,
                     warmup_steps: int, wd: float,
                     betas=(0.9, 0.95), clip_norm: float = 1.0,
                     no_decay_list: Sequence[str] = ("cls", "mask_token",
                                                     "bias"),
                     mu_dtype: str = "bfloat16"):
  """The AE trainer's optimizer (train_ae.py:125-152 semantics).

  Peak LR scales with batch/256; names containing any `no_decay_list` token
  in their path are exempt from weight decay; first moment in bf16 halves
  optimizer HBM.
  """
  warmup_steps = min(max(warmup_steps, 1), max(total_steps - 1, 1))
  lr = optax.warmup_cosine_decay_schedule(
      init_value=0.0, peak_value=peak_lr * batch_size / 256.0,
      warmup_steps=warmup_steps, decay_steps=total_steps)

  def decay_mask(params):
    from small_vision_tpu.utils.trees import tree_map_with_names
    return tree_map_with_names(
        lambda name, _: all(tok not in name.split("/") for tok
                            in no_decay_list), params)

  opt = optax.adamw(learning_rate=lr, weight_decay=wd, mask=decay_mask,
                    b1=betas[0], b2=betas[1], mu_dtype=mu_dtype)
  return optax.chain(optax.clip_by_global_norm(clip_norm), opt), lr


def lars_probe_tx(*, base_lr: float, batch_size: int, total_steps: int,
                  warmup_steps: int, momentum: float = 0.9):
  """LARS with linear-scaled LR for the linear probe
  (linear_ae.py:199-208 semantics)."""
  warmup_steps = min(max(warmup_steps, 1), max(total_steps - 1, 1))
  lr = optax.warmup_cosine_decay_schedule(
      init_value=0.0, peak_value=base_lr * batch_size / 256.0,
      warmup_steps=warmup_steps, decay_steps=total_steps)
  return optax.lars(learning_rate=lr, momentum=momentum), lr


def scale_by_adafactor(min_dim_size_to_factor=32, decay_rate=0.8,
                       decay_offset=0, beta2_cap=0.999,
                       clipping_threshold=None, momentum=0.9,
                       dtype_momentum=jnp.bfloat16, eps=1e-30):
  """BigVision Adafactor variant (optax.py:162-191 semantics)."""

  def _decay_rate_pow(i, exponent=decay_rate):
    t = jnp.array(i, jnp.float32) + 1.0
    return jnp.minimum(beta2_cap, 1.0 - t ** (-exponent))

  rms = optax.scale_by_factored_rms(
      factored=True, decay_rate=decay_rate, step_offset=decay_offset,
      min_dim_size_to_factor=min_dim_size_to_factor, epsilon=eps,
      decay_rate_fn=_decay_rate_pow)
  clip = (optax.clip_by_block_rms(clipping_threshold)
          if clipping_threshold else optax.identity())
  mom = (optax.ema(momentum, debias=False,
                   accumulator_dtype=dtype_momentum)
         if momentum else optax.identity())
  return optax.chain(rms, clip, mom)


def momentum_hp(momentum=0.9, dtype=jnp.bfloat16, nesterov=False):
  """SGD-momentum with a half-precision accumulator."""
  return optax.trace(decay=momentum, accumulator_dtype=dtype,
                     nesterov=nesterov)


CUSTOM = {
    "scale_by_adafactor": scale_by_adafactor,
    "momentum_hp": momentum_hp,
}
