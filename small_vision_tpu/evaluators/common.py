"""Config-driven evaluator construction.

Parity target: /root/reference/big_vision/evaluators/common.py:27-103 —
`from_config` pops generic keys (type/pred/pred_kw/prefix/log_*) off each
`config.evals` entry, imports `evaluators.<type>`, and instantiates
`Evaluator(predict_fn, **cfg)`. `_CacheablePartial` keeps jit caches shared
across evaluator instances that only differ in data slices.
"""

import dataclasses
import functools
import importlib
from typing import Any, Callable

import flax


def from_config(config, predict_fns, mesh,
                get_steps=lambda key, cfg: cfg.get(f"{key}_steps"),
                write_note=lambda s: None):
  """Returns [(name, evaluator, log_steps, prefix)] from config.evals."""
  evaluators = []
  for name, cfg in dict(config.get("evals", {})).items():
    write_note(name)
    cfg = cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg)
    module_name = cfg.pop("type", name)
    pred_key = cfg.pop("pred", "predict")
    pred_kw = cfg.pop("pred_kw", None)
    prefix = cfg.pop("prefix", f"{name}/")
    cfg.pop("skip_first", None)
    log_steps = get_steps("log", cfg)
    for unit in ("steps", "epochs", "examples", "percent"):
      cfg.pop(f"log_{unit}", None)

    cfg["batch_size"] = (cfg.get("batch_size")
                         or config.get("batch_size_eval")
                         or config.get("input", {}).get("batch_size")
                         or config.get("batch_size"))

    module = importlib.import_module(
        f"small_vision_tpu.evaluators.{module_name}")
    try:
      predict_fn = predict_fns[pred_key]
    except KeyError as e:
      raise ValueError(
          f"Unknown predict_fn {pred_key!r}. Available: "
          f"{sorted(predict_fns)}") from e
    if pred_kw is not None:
      predict_fn = _CacheablePartial(predict_fn, flax.core.freeze(pred_kw))
    try:
      evaluator = module.Evaluator(predict_fn, mesh=mesh, **cfg)
    except TypeError as e:
      # Evaluators take explicit kwargs only (no **unused_kw swallowing), so
      # a typo'd config key (e.g. `totall_samples`) fails loudly here.
      raise ValueError(
          f"Bad config for evaluator {name!r} (type={module_name!r}): {e}. "
          f"Config keys passed: {sorted(cfg)}") from e
    evaluators.append((name, evaluator, log_steps, prefix))
  return evaluators


@dataclasses.dataclass(frozen=True, eq=True)
class _CacheablePartial:
  """A hashable partial(fn, **kwargs) so jit caches persist across instances."""
  fn: Callable[..., Any]
  kwargs: flax.core.FrozenDict

  def __call__(self, *args, **kwargs):
    return functools.partial(self.fn, **self.kwargs)(*args, **kwargs)
