"""Preprocessing-op registry + the `"fn1|fn2(arg, k=v)"` string grammar.

Parity target: /root/reference/big_vision/pp/registry.py (ast-based arg
parsing, global registry, `temporary_ops` test helper). One extension: each
op declares a `stage`:

  stage="host"    runs per-example on numpy dicts (decode, crops, resizes);
  stage="device"  runs on batched jax arrays inside one fused jit program
                  right after host→device transfer (flips, value ranges,
                  one-hots) — this is the TPU-native move that replaces the
                  reference's tf.data CPU graph for everything after decode.

An op factory is called with the parsed args and returns the actual
transform fn (host: dict→dict; device: (dict, rng)→dict).
"""

import ast
import contextlib
import functools
from typing import Any, Dict

_REGISTRY: Dict[str, Any] = {}


def parse_name(string_to_parse: str):
  """Parses `"fn(1, k=2)"` → (name, args, kwargs) using the Python AST.

  Only literal args are allowed. A bare `"fn"` means no args.
  """
  expr = ast.parse(string_to_parse, mode="eval").body
  if isinstance(expr, ast.Name):
    return expr.id, (), {}
  if isinstance(expr, ast.Attribute):
    raise ValueError(f"Dotted names not supported: {string_to_parse!r}")
  if not isinstance(expr, ast.Call):
    raise ValueError(f"Not a function call: {string_to_parse!r}")
  if not isinstance(expr.func, ast.Name):
    raise ValueError(f"Invalid function name in: {string_to_parse!r}")
  args = tuple(ast.literal_eval(a) for a in expr.args)
  kwargs = {kw.arg: ast.literal_eval(kw.value) for kw in expr.keywords}
  if None in kwargs:
    raise ValueError(f"**kwargs not supported: {string_to_parse!r}")
  return expr.func.id, args, kwargs


class Registry:
  """Namespace-free registry of preprocessing op factories."""

  @staticmethod
  def register(name: str, stage: str = "host", replace: bool = False):
    # "any": structural dict ops (keep/drop/copy) valid in either stage; the
    # builder assigns them to whichever stage is current at their position.
    assert stage in ("host", "device", "any")

    def decorator(factory):
      if name in _REGISTRY and not replace:
        raise KeyError(f"pp op {name!r} already registered")
      factory.stage = stage
      _REGISTRY[name] = factory
      return factory
    return decorator

  @staticmethod
  def lookup(spec: str):
    """Resolves an op spec string to (transform_fn, stage)."""
    name, args, kwargs = parse_name(spec)
    if name not in _REGISTRY:
      raise KeyError(f"Unknown pp op {name!r}. Known: {sorted(_REGISTRY)}")
    factory = _REGISTRY[name]
    fn = factory(*args, **kwargs)
    fn = functools.wraps(factory)(fn) if not hasattr(fn, "__name__") else fn
    return fn, factory.stage

  @staticmethod
  def knows(name: str) -> bool:
    return name in _REGISTRY


@contextlib.contextmanager
def temporary_ops(**ops):
  """Registers throwaway ops for a test block, then restores the registry."""
  saved = dict(_REGISTRY)
  try:
    for name, factory in ops.items():
      factory.stage = getattr(factory, "stage", "host")
      _REGISTRY[name] = factory
    yield
  finally:
    _REGISTRY.clear()
    _REGISTRY.update(saved)
