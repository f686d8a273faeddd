"""The `key=val,flag` config arg-string minilanguage.

Parity target: /root/reference/big_vision/configs/common.py:29-140. Grammar:

  --config ae_i1k.py:variant=B/4,size=64,adaln=False
  --config amazing.py:runlocal          # bare flag -> True
  --config amazing.py:128               # first spec entry, positional

Each `get_config(arg)` declares a typed spec of defaults; values are converted
with the default's type (strict bool parsing: only 'true'/'false'/'').
"""

import string

import ml_collections as mlc


def _strict_bool(x: str) -> bool:
  low = x.lower()
  if low not in ("true", "false", ""):
    raise ValueError(f"Not a strict bool: {x!r}")
  return low == "true"


def _converter_for(default):
  if isinstance(default, bool):
    return _strict_bool
  if default is None:
    return autotype
  return type(default)


def parse_arg(arg, lazy=False, **spec):
  """Parses the single-string config argument against a typed spec.

  Each spec value is either a default (type inferred) or a
  ``(default, convert_fn)`` tuple. Unknown keys raise unless ``lazy``.
  """
  arg = arg or ""
  spec = {k: (v if isinstance(v, tuple) else (v, _converter_for(v)))
          for k, v in spec.items()}

  result = mlc.ConfigDict(type_safe=False)

  # Single token without '=' → bare flag, or positional first spec entry.
  if arg and "," not in arg and "=" not in arg:
    if arg in spec or not spec:
      arg = f"{arg}=True"
    else:
      first = next(iter(spec))
      arg = f"{first}={arg}"

  raw = {}
  for tok in arg.split(","):
    if not tok:
      continue
    if "=" in tok:
      k, v = tok.split("=", 1)
    else:
      k, v = tok, "True"
    raw[k] = v

  for name, (default, convert) in spec.items():
    if name in raw:
      result[name] = convert(raw.pop(name))
    else:
      result[name] = default

  if raw:
    if not lazy:
      raise ValueError(f"Unhandled config args remain: {raw}")
    for k, v in raw.items():
      result[k] = autotype(v)

  return result


def autotype(x: str):
  """'true'/'false' → bool, else int, else float, else str."""
  if x.lower() in ("true", "false"):
    return x.lower() == "true"
  for conv in (int, float):
    try:
      return conv(x)
    except ValueError:
      pass
  return x


def pack_arg(**kw):
  """Inverse of parse_arg: packs kwargs into an arg string."""
  for v in kw.values():
    assert "," not in f"{v}", f"Can't use ',' in config_arg value: {v}"
  return ",".join(f"{k}={v}" for k, v in kw.items())


def arg(**kw):
  """`add(**arg(res=256), lr=0.1)` convenience to thread a config_arg along."""
  return {"config_arg": pack_arg(**kw), **kw}


def format_str(format_string, config):
  """Formats a string with live ConfigDict field references."""
  output = ""
  for literal, field, fspec, conv in string.Formatter().parse(format_string):
    assert not fspec and not conv
    output += literal
    if field:
      node = config
      parts = field.split(".")
      for p in parts[:-1]:
        node = getattr(node, p)
      output += node.get_ref(parts[-1]).to_str()
  return output
