"""ctypes bindings for the native JPEG decode/crop core.

Builds `_native/sv_dataloader.so` on first use (g++ -O3 -ljpeg) and exposes:

  decode_inception_crop(jpeg_bytes, out_size, area_min, area_max, seed)
  decode(jpeg_bytes)

The ctypes calls release the GIL, so the input pipeline's thread pool scales
across cores. `available()` gates the fast path; callers fall back to PIL.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "_native")
_SO_PATH = os.path.join(_SRC_DIR, "sv_dataloader.so")


def _build():
  src = os.path.join(_SRC_DIR, "sv_dataloader.cpp")
  cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", src, "-o", _SO_PATH,
         "-ljpeg"]
  subprocess.run(cmd, check=True, capture_output=True)


def _load():
  global _LIB, _TRIED
  with _LOCK:
    if _LIB is not None or _TRIED:
      return _LIB
    _TRIED = True
    try:
      if (not os.path.exists(_SO_PATH)
          or os.path.getmtime(_SO_PATH) < os.path.getmtime(
              os.path.join(_SRC_DIR, "sv_dataloader.cpp"))):
        _build()
      lib = ctypes.CDLL(_SO_PATH)
      lib.sv_decode_inception_crop.restype = ctypes.c_int
      lib.sv_decode_inception_crop.argtypes = [
          ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
          ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
          ctypes.c_int, ctypes.c_uint64, ctypes.c_void_p]
      lib.sv_jpeg_dims.restype = ctypes.c_int
      lib.sv_jpeg_dims.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                   ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_int)]
      lib.sv_decode.restype = ctypes.c_int
      lib.sv_decode.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                ctypes.c_void_p]
      lib.sv_decode_inception_crop_batch.restype = ctypes.c_int
      lib.sv_decode_inception_crop_batch.argtypes = [
          ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
          ctypes.c_int, ctypes.c_int, ctypes.c_int,
          ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
          ctypes.c_int, ctypes.POINTER(ctypes.c_uint64), ctypes.c_void_p,
          ctypes.POINTER(ctypes.c_int), ctypes.c_int]
      _LIB = lib
    except Exception:  # noqa: BLE001 — any failure → PIL fallback.
      _LIB = None
    return _LIB


def available() -> bool:
  return _load() is not None


def decode_inception_crop(jpeg_bytes: bytes, out_h: int, out_w: int,
                          area_min: float, area_max: float, seed: int,
                          ar_lo: float = 0.75, ar_hi: float = 1.33,
                          max_attempts: int = 100) -> np.ndarray:
  """Fused decode+random-crop+resize; raises ValueError on bad JPEGs."""
  lib = _load()
  assert lib is not None, "native loader unavailable"
  out = np.empty((out_h, out_w, 3), np.uint8)
  rc = lib.sv_decode_inception_crop(
      jpeg_bytes, len(jpeg_bytes), out_h, out_w,
      float(area_min), float(area_max), ar_lo, ar_hi, max_attempts,
      ctypes.c_uint64(seed & (2**64 - 1)),
      out.ctypes.data_as(ctypes.c_void_p))
  if rc != 0:
    raise ValueError(f"native jpeg decode failed (rc={rc})")
  return out


def decode_inception_crop_batch(jpegs, out_h: int, out_w: int,
                                area_min: float, area_max: float, seeds,
                                ar_lo: float = 0.75, ar_hi: float = 1.33,
                                max_attempts: int = 100, n_threads: int = 0):
  """Batched fused decode+crop+resize with an in-library thread pool.

  One ctypes call (one GIL release) for the whole batch; the C++ side fans
  out over std::threads. Returns (out (N, h, w, 3) uint8, rcs (N,) int32 —
  0 = ok; callers fall back per-image for nonzero entries). Each image i is
  bitwise-identical to decode_inception_crop(jpegs[i], ..., seeds[i]).
  """
  lib = _load()
  assert lib is not None, "native loader unavailable"
  n = len(jpegs)
  out = np.empty((n, out_h, out_w, 3), np.uint8)
  rcs = np.zeros(n, np.int32)
  if n == 0:
    return out, rcs
  # Keep the bytes objects alive; c_char_p array points into them.
  datas = (ctypes.c_char_p * n)(*jpegs)
  lens = (ctypes.c_size_t * n)(*[len(b) for b in jpegs])
  seeds_arr = (ctypes.c_uint64 * n)(*[int(s) & (2**64 - 1) for s in seeds])
  lib.sv_decode_inception_crop_batch(
      datas, lens, n, out_h, out_w, float(area_min), float(area_max),
      ar_lo, ar_hi, max_attempts, seeds_arr,
      out.ctypes.data_as(ctypes.c_void_p),
      rcs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n_threads)
  return out, rcs


def decode(jpeg_bytes: bytes) -> np.ndarray:
  lib = _load()
  assert lib is not None, "native loader unavailable"
  h, w = ctypes.c_int(), ctypes.c_int()
  rc = lib.sv_jpeg_dims(jpeg_bytes, len(jpeg_bytes),
                        ctypes.byref(h), ctypes.byref(w))
  if rc != 0:
    raise ValueError(f"bad jpeg header (rc={rc})")
  out = np.empty((h.value, w.value, 3), np.uint8)
  rc = lib.sv_decode(jpeg_bytes, len(jpeg_bytes),
                     out.ctypes.data_as(ctypes.c_void_p))
  if rc != 0:
    raise ValueError(f"native jpeg decode failed (rc={rc})")
  return out
