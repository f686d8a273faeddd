"""FID / Inception Score with on-TPU streaming statistics.

Parity target: /root/reference/big_vision/evaluators/fid.py —
`create_fid_score_fn(batch_size, ref_stats_path)` → fn(uint8 samples) ->
(fid, inception_score); 299² bilinear resize on device; 10-split IS
(:46-55); Frechet distance via scipy sqrtm on host (:57-70); reference
mu/sigma loaded from an .npz/.npy stats file; a `__main__`-style
`compute_reference_stats` to build stats from a data source (:775-832).

TPU-first deviation (BASELINE.json north-star "no host round-trips"): the
reference pulled every 2048-d activation to the host and did mu/sigma in
numpy; here each batch's activations accumulate `n, Σx, Σxxᵀ` ON DEVICE in
one jitted program, so only the final (2048,) + (2048,2048) moments cross to
the host once. IS probabilities (B,1008) still stream to host (tiny).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from small_vision_tpu.evaluators import inception

FEATURE_DIM = 2048


def _resize_299(images_uint8):
  """uint8 (B,H,W,C) → float (B,299,299,3) in [-1,1], bilinear (device)."""
  x = images_uint8.astype(jnp.float32) / 255.0
  x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[3]), "bilinear")
  if x.shape[-1] == 1:
    x = jnp.tile(x, (1, 1, 1, 3))
  return 2.0 * x - 1.0


def make_activation_fn(model, variables):
  """One jitted program: resize → inception → (probs, Σx, Σxxᵀ).

  `mask` (B,) zeroes padded rows out of the moment sums, so ragged final
  batches reuse the same compiled program exactly.
  """

  @jax.jit
  def activation_fn(images_uint8, mask):
    x = _resize_299(images_uint8)
    pool3, logits = model.apply(variables, x)
    probs = jax.nn.softmax(logits, axis=-1)
    pool3 = pool3 * mask[:, None]
    s = jnp.sum(pool3, axis=0)
    outer = jnp.einsum("bi,bj->ij", pool3, pool3,
                       preferred_element_type=jnp.float32)
    return probs, s, outer
  return activation_fn


class StreamingMoments:
  """Accumulates n, Σx, Σxxᵀ; yields (mu, sigma) with the unbiased (n-1)
  covariance normalization numpy.cov uses (reference parity)."""

  def __init__(self, dim=FEATURE_DIM):
    self.n = 0
    self.s = np.zeros((dim,), np.float64)
    self.outer = np.zeros((dim, dim), np.float64)

  def update(self, n, s, outer):
    self.n += int(n)
    self.s += np.asarray(s, np.float64)
    self.outer += np.asarray(outer, np.float64)

  def finalize(self) -> Tuple[np.ndarray, np.ndarray]:
    assert self.n > 1, "need >1 samples for covariance"
    mu = self.s / self.n
    sigma = (self.outer - self.n * np.outer(mu, mu)) / (self.n - 1)
    return mu, sigma


def compute_frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
  """FID = |mu1-mu2|² + tr(S1 + S2 - 2(S1 S2)^0.5), sqrtm on host scipy."""
  mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
  sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
  diff = mu1 - mu2

  covmean, _ = scipy.linalg.sqrtm(sigma1.dot(sigma2), disp=False)
  if not np.isfinite(covmean).all():
    offset = np.eye(sigma1.shape[0]) * eps
    covmean = scipy.linalg.sqrtm(
        (sigma1 + offset).dot(sigma2 + offset))
  if np.iscomplexobj(covmean):
    covmean = covmean.real
  return (diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
          - 2 * np.trace(covmean))


def compute_inception_score(probs, splits=10):
  """Mean exp KL(p(y|x) ‖ p(y)) over `splits` chunks (reference :46-55)."""
  probs = np.asarray(probs, np.float64)
  scores = []
  n = probs.shape[0]
  for i in range(splits):
    part = probs[i * n // splits:(i + 1) * n // splits]
    if part.shape[0] == 0:
      continue
    py = np.mean(part, axis=0, keepdims=True)
    kl = np.sum(part * (np.log(part + 1e-16) - np.log(py + 1e-16)), axis=1)
    scores.append(np.exp(np.mean(kl)))
  return float(np.mean(scores))


def compute_statistics(images_uint8, activation_fn, batch_size=256):
  """Streams batches through the activation fn; returns (mu, sigma, probs).

  The final short batch is zero-padded to keep one compiled program; padded
  rows are excluded from the moments and probs.
  """
  moments = StreamingMoments()
  all_probs = []
  n = images_uint8.shape[0]
  for i in range(0, n, batch_size):
    chunk = np.asarray(images_uint8[i:i + batch_size])
    real = chunk.shape[0]
    mask = np.ones((batch_size,), np.float32)
    if real < batch_size:
      mask[real:] = 0.0
      chunk = np.concatenate(
          [chunk, np.zeros((batch_size - real,) + chunk.shape[1:],
                           chunk.dtype)])
    probs, s, outer = activation_fn(jnp.asarray(chunk), jnp.asarray(mask))
    moments.update(real, jax.device_get(s), jax.device_get(outer))
    all_probs.append(np.asarray(jax.device_get(probs))[:real])
  mu, sigma = moments.finalize()
  return mu, sigma, np.concatenate(all_probs)


def load_reference_stats(path):
  """Loads (mu, sigma) from .npz (mu/sigma keys) or a stacked .npy."""
  if path.endswith(".npz"):
    with np.load(path) as d:
      return d["mu"], d["sigma"]
  arr = np.load(path, allow_pickle=True)
  if isinstance(arr, np.ndarray) and arr.dtype == object:
    d = arr.item()
    return d["mu"], d["sigma"]
  return arr[0], arr[1]


def create_fid_score_fn(batch_size: int, reference_stats_path: str,
                        weights_path: Optional[str] = None):
  """fn(uint8 samples) -> (fid, inception_score) — reference API
  (fid.py:72-100)."""
  model, variables = inception.init_params(weights_path=weights_path)
  activation_fn = make_activation_fn(model, variables)
  ref_mu, ref_sigma = load_reference_stats(reference_stats_path)

  def fid_fn(samples_uint8):
    mu, sigma, probs = compute_statistics(
        samples_uint8, activation_fn, batch_size)
    fid = compute_frechet_distance(mu, sigma, ref_mu, ref_sigma)
    is_score = compute_inception_score(probs)
    return float(fid), float(is_score)
  return fid_fn


def compute_reference_stats(source_iter, out_path, batch_size=256,
                            weights_path=None, max_examples=None):
  """Builds reference mu/sigma from an iterator of uint8 image batches
  (reference fid.py:775-832 __main__ equivalent)."""
  model, variables = inception.init_params(weights_path=weights_path)
  activation_fn = make_activation_fn(model, variables)
  moments = StreamingMoments()
  seen = 0
  for chunk in source_iter:
    chunk = np.asarray(chunk)
    if max_examples and seen + chunk.shape[0] > max_examples:
      chunk = chunk[:max_examples - seen]
    if chunk.shape[0] == 0:
      break
    if chunk.shape[0] % batch_size:
      pass  # compute_statistics handles ragged; here just feed whole chunk
    mu_s = compute_statistics(chunk, activation_fn, batch_size)
    # compute_statistics finalizes; accumulate raw instead:
    # (simple path: re-accumulate via moments on the chunk statistics)
    n = chunk.shape[0]
    mu, sigma, _ = mu_s
    moments.update(n, mu * n, (sigma * (n - 1)) + n * np.outer(mu, mu))
    seen += n
    if max_examples and seen >= max_examples:
      break
  mu, sigma = moments.finalize()
  np.savez(out_path, mu=mu, sigma=sigma)
  return mu, sigma
