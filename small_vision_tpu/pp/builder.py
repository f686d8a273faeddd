"""Composes `"fn1|fn2(…)"` pp strings into host and device pipeline fns.

Parity target: /root/reference/big_vision/pp/builder.py:21-78, restructured
for the TPU: one pp string compiles into

  host_fn(example_dict)           — per-example numpy (decode/crop/resize)
  device_fn(batch_dict, rng)      — ONE jitted program fusing every device
                                    op (flip, value_range, onehot, …)

The split point is automatic from each op's registered stage; ops may
interleave in the string but all host ops must precede all device ops
(raises otherwise — that ordering is what keeps the host side minimal).
"""

from typing import Callable, Optional, Tuple

import jax

from small_vision_tpu.pp.registry import Registry


def split_spec(pp_spec: str):
  """Splits a pp string into per-op spec strings, tolerating empty parts."""
  return [tok.strip() for tok in (pp_spec or "").split("|") if tok.strip()]


def split_stages(pp_spec: str) -> Tuple[str, str]:
  """Splits a pp string into (host_spec, device_spec) normalized strings.

  Uses the same stage-resolution rule as `get_preprocess_fn` ('any' ops bind
  to host until the first device op). Lets callers compare the device stage
  of several pipelines (dataset mixing shares ONE fused device fn).
  """
  host_specs, device_specs = [], []
  for spec in split_spec(pp_spec):
    _, stage = Registry.lookup(spec)
    if stage == "any":
      stage = "device" if device_specs else "host"
    (host_specs if stage == "host" else device_specs).append(spec)
  return "|".join(host_specs), "|".join(device_specs)


def get_preprocess_fn(pp_spec: str, log_name: Optional[str] = None
                      ) -> Tuple[Callable, Optional[Callable]]:
  """Builds (host_fn, device_fn) from a pp string.

  host_fn: dict → dict, applied per example on the host.
  device_fn: (dict, rng) → dict, a single fused jax fn over the batch, or
    None when the string contains no device ops.
  """
  del log_name
  host_ops, device_ops = [], []
  for spec in split_spec(pp_spec):
    fn, stage = Registry.lookup(spec)
    if stage == "any":
      stage = "device" if device_ops else "host"
      if stage == "device":
        fn = (lambda _f: lambda batch, rng: _f(batch))(fn)
    if stage == "host":
      if device_ops:
        raise ValueError(
            f"Host op {spec!r} appears after device ops in {pp_spec!r}; "
            "order ops host-first.")
      host_ops.append((spec, fn))
    else:
      device_ops.append((spec, fn))

  def host_fn(data):
    assert isinstance(data, dict), f"pp data must be dict, got {type(data)}"
    for spec, fn in host_ops:
      try:
        data = fn(data)
      except Exception as e:
        raise RuntimeError(f"pp host op {spec!r} failed: {e}") from e
    return data

  if host_ops and hasattr(host_ops[0][1], "batch"):
    # Whole-chunk fast path: the leading host op (the fused JPEG
    # decode+crop) processes the batch in ONE native call with its own C++
    # thread pool; any remaining host ops map per-example after. Returns
    # None when the native library is unavailable → caller threads host_fn.
    def host_batch_fn(datas):
      datas = host_ops[0][1].batch(datas)
      if datas is None:
        return None
      for spec, fn in host_ops[1:]:
        try:
          datas = [fn(d) for d in datas]
        except Exception as e:
          raise RuntimeError(f"pp host op {spec!r} failed: {e}") from e
      return datas
    host_fn.batch = host_batch_fn

  device_fn = None
  if device_ops:
    def device_fn(batch, rng):
      for spec, fn in device_ops:
        rng, op_rng = jax.random.split(rng)
        batch = fn(batch, op_rng)
      return batch

  return host_fn, device_fn
