"""Duration resolution and learning-rate schedules.

Parity targets:
  - `steps()` unit-polymorphic duration resolution
    (/root/reference/big_vision/utils.py:1019-1076): durations may be given as
    `{name}_steps`, `{name}_examples`, `{name}_epochs`, or `{name}_percent`.
  - `create_learning_rate_schedule` warmup/cooldown + {cosine, linear, rsqrt,
    stair} decay (/root/reference/big_vision/utils.py:1079-1147).

All schedules are pure functions of the step count so they trace cleanly under
jit (jnp ops only inside).
"""

from typing import Optional

import jax.numpy as jnp


def steps(prefix: str, config, data_size: Optional[int] = None,
          batch_size: Optional[int] = None, total_steps: Optional[int] = None,
          default=ValueError):
  """Resolves a duration config entry to an integer number of steps.

  Accepts any one of ``{prefix}_steps``, ``{prefix}_examples``,
  ``{prefix}_epochs``, ``{prefix}_percent`` in ``config`` (a Mapping or
  ConfigDict). Raises if more than one is set, or none and no default.
  """
  g = config.get if hasattr(config, "get") else lambda k, d=None: None
  options = {}
  for unit in ("steps", "examples", "epochs", "percent"):
    v = g(f"{prefix}_{unit}")
    if v is not None:
      options[unit] = v
  if len(options) > 1:
    raise ValueError(
        f"Ambiguous duration for '{prefix}': multiple units set {options}")
  if not options:
    if default is ValueError:
      raise ValueError(
          f"Missing duration '{prefix}_(steps|examples|epochs|percent)'.")
    return default

  unit, value = options.popitem()
  if unit == "steps":
    return int(value)
  if unit == "examples":
    assert batch_size, f"'{prefix}_examples' needs batch_size"
    return max(int(value // batch_size), 1)
  if unit == "epochs":
    assert batch_size and data_size, f"'{prefix}_epochs' needs data+batch size"
    return max(int(value * data_size / batch_size), 1)
  # percent
  assert total_steps is not None, f"'{prefix}_percent' needs total_steps"
  assert 0.0 <= value <= 1.0, f"percent must be in [0,1], got {value}"
  return max(int(value * total_steps), 1)


def create_learning_rate_schedule(
    total_steps: int,
    batch_size: Optional[int] = None,
    data_size: Optional[int] = None,
    base: float = 1.0,
    decay_type: str = "stair",
    scale_with_batchsize: bool = False,
    **kw):
  """Builds an LR schedule fn(step) -> lr.

  kw may include warmup_steps/warmup_epochs/... and cooldown_* durations plus
  decay-specific options (linear_end, power, stairs/ratios).
  """
  cfg = dict(kw)

  def get_dur(name, default=0):
    return steps(name, cfg, data_size, batch_size, total_steps, default=default)

  warmup_steps = get_dur("warmup")
  cooldown_steps = get_dur("cooldown")
  # Pop consumed duration keys so leftovers can be validated per decay type.
  for unit in ("steps", "examples", "epochs", "percent"):
    cfg.pop(f"warmup_{unit}", None)
    cfg.pop(f"cooldown_{unit}", None)

  assert warmup_steps < total_steps, (
      f"warmup_steps ({warmup_steps}) must be < total_steps ({total_steps})")

  def schedule(step):
    lr = jnp.asarray(base, jnp.float32)
    if scale_with_batchsize:
      lr = lr * batch_size / 256.0

    # Reference semantics (utils.py:1120): the decay curve spans
    # (total - warmup) steps and the cooldown is a MULTIPLICATIVE linear
    # ramp on top (below) — cooldown does NOT shrink the decay window.
    progress = (step - warmup_steps) / float(total_steps - warmup_steps)
    progress = jnp.clip(progress, 0.0, 1.0)

    if decay_type in ("linear", "polynomial"):
      power = cfg.get("power", 1)
      zero = cfg.get("end", cfg.get("linear_end", 0))
      lr = zero + (lr - zero) * (1.0 - progress) ** power
    elif decay_type == "cosine":
      lr = lr * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
    elif decay_type == "rsqrt":
      timescale = cfg.get("timescale", 10_000)
      shift = timescale - warmup_steps
      lr = jnp.where(warmup_steps < step,
                     lr / jnp.sqrt((step + shift) / timescale), lr)
    elif decay_type == "stair":
      i = jnp.searchsorted(jnp.asarray(cfg.get("steps", [])), step + 1)
      lr = lr * jnp.take(
          jnp.asarray([1.0] + list(cfg.get("mults", []))), i)
    else:
      raise ValueError(f"Unknown lr decay_type '{decay_type}'")

    if warmup_steps:
      lr = lr * jnp.minimum(1.0, step / warmup_steps)
    if cooldown_steps:
      lr = lr * jnp.minimum(1.0, (total_steps - step) / cooldown_steps)
    return jnp.asarray(lr, jnp.float32)

  return schedule
