"""Closed-form few-shot linear probe (L2-regularized least squares).

Parity target: /root/reference/big_vision/evaluators/fewshot_lsr.py —
whitened features + BIAS_CONSTANT bias column, eigh-based solver precompute
(:40-95), per-(seed, dataset, shots) accuracies named
`{a|z}/{ds}_{shots}shot-seed-{s}` (:229-238). Representations come from the
trainer's `predict`/`noised_predict` fns' `out["pre_logits"]` (the averaged
class tokens).

The solver runs on device (eigh over ≤(2049,2049) — fine on one chip); the
`out_shardings=P()` jit on the repr fn is the implicit cross-host all-gather
(reference :148).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from small_vision_tpu.data import core as ds_core
from small_vision_tpu.data import pipeline
from small_vision_tpu.utils.trees import tree_get

BIAS_CONSTANT = 100.0


@functools.partial(jax.jit, static_argnums=(2,))
def _precompute_cache(x, y, num_classes):
  """Eigendecomposition cache for L2-regularized least squares.

  For N≥D solve (XᵀX + λI)⁻¹Xᵀy via eigh(XᵀX); for D>N use the kernel form
  Xᵀ(XXᵀ + λI)⁻¹y via eigh(XXᵀ). Whitening + a large-constant bias column
  make the bias effectively unregularized.
  """
  mean = jnp.mean(x, axis=0, keepdims=True)
  std = jnp.std(x, axis=0, keepdims=True) + 1e-5
  x = (x - mean) / std
  x = jnp.pad(x, ((0, 0), (0, 1)), constant_values=BIAS_CONSTANT)
  y = 2.0 * jax.nn.one_hot(y, num_classes) - 1.0

  n, d = x.shape
  if n >= d:
    eigs, q = jnp.linalg.eigh(x.T @ x)
    rhs = q.T @ (x.T @ y)
    lhs = q
  else:
    eigs, q = jnp.linalg.eigh(x @ x.T)
    rhs = q.T @ y
    lhs = x.T @ q
  return {"eigs": eigs, "rhs": rhs, "lhs": lhs, "mean": mean, "std": std}


@jax.jit
def _eig_fewshot_acc_fn(cache, x_test, y_test, l2_reg):
  x_test = (x_test - cache["mean"]) / cache["std"]
  x_test = jnp.pad(x_test, ((0, 0), (0, 1)), constant_values=BIAS_CONSTANT)
  scaling = (1.0 / (cache["eigs"] + l2_reg)).reshape(1, -1)
  w = (cache["lhs"] * scaling) @ cache["rhs"]
  preds = jnp.argmax(x_test @ w, axis=1)
  return jnp.mean(preds == y_test)


class Evaluator:

  def __init__(self, predict_fn, *, mesh, batch_size, representation_layer,
               datasets, shots, l2_reg, pp_train, pp_eval, display_first,
               num_seeds=3, label_key="label", num_classes=None):
    self.mesh = mesh
    self.batch_size = batch_size
    self.datasets = datasets
    self.shots = shots
    self.l2_reg = l2_reg
    self.pp_tr, self.pp_te = pp_train, pp_eval
    self.display_first = [tuple(x) for x in display_first]
    self.num_seeds = num_seeds
    self.label_key = label_key
    self.num_classes_override = num_classes
    self._datasets = {}

    @functools.partial(jax.jit,
                       out_shardings=NamedSharding(mesh, P()))
    def _repr_fn(train_state, batch, labels, mask, pp_rng):
      # device pp is bound per dataset below; batch arrives post-host-pp.
      *_, out = predict_fn(train_state, batch)
      return tree_get(out, representation_layer), labels, mask
    self._repr_fn = _repr_fn

  def _get_dataset(self, ds_train, ds_val, split_train, split_test):
    key = repr((ds_train, ds_val, split_train, split_test))
    if key in self._datasets:
      return self._datasets[key]
    src_tr = _get_source(ds_train, split_train)
    src_te = _get_source(ds_val, split_test)
    it_tr = pipeline.make_for_inference(
        src_tr, self.pp_tr, self.mesh, self.batch_size)
    it_te = pipeline.make_for_inference(
        src_te, self.pp_te, self.mesh, self.batch_size)
    num_classes = (self.num_classes_override
                   or getattr(src_tr, "num_classes", None) or 1000)
    return self._datasets.setdefault(key, (it_tr, it_te, num_classes))

  def _get_repr(self, train_state, iterate_pack):
    iterate, device_pp, n_steps = iterate_pack
    reps, labels = [], []
    rng = jax.random.PRNGKey(0)
    for i, batch in enumerate(iterate()):
      if i >= n_steps:
        break
      rng, pp_rng = jax.random.split(rng)
      batch = dict(batch)
      if device_pp is not None:
        batch = jax.jit(device_pp)(batch, pp_rng)
      mask = batch.pop("_mask")
      y = batch.pop(self.label_key)
      # fetch_global: reps/labels are batch-sharded global arrays whose
      # shards span hosts with process_count>1 (device_get would raise);
      # every host assembles the full representation matrix, matching the
      # reference's allgather (fewshot_lsr.py predict + process gather).
      from small_vision_tpu.parallel.collectives import fetch_global
      rep, y, mask = fetch_global(
          self._repr_fn(train_state, batch, y, mask, pp_rng))
      keep = np.asarray(mask).astype(bool)
      reps.append(np.asarray(rep)[keep])
      labels.append(np.asarray(y)[keep])
    return np.concatenate(reps), np.concatenate(labels)

  def compute_fewshot_metrics(self, train_state, seed, ds_train, ds_val,
                              split_train, split_test):
    it_tr, it_te, num_classes = self._get_dataset(
        ds_train, ds_val, split_train, split_test)
    x_tr, y_tr = self._get_repr(train_state, it_tr)
    x_te, y_te = self._get_repr(train_state, it_te)

    rng = np.random.default_rng(seed)
    class_indices = [rng.permutation(np.where(y_tr == c)[0])
                     for c in range(num_classes)]
    results = {}
    for shots in self.shots:
      idx = np.concatenate([ind[:shots] for ind in class_indices])
      cache = _precompute_cache(
          jnp.asarray(x_tr[idx]), jnp.asarray(y_tr[idx]), num_classes)
      acc = _eig_fewshot_acc_fn(
          cache, jnp.asarray(x_te), jnp.asarray(y_te), self.l2_reg)
      results[shots] = float(jax.device_get(acc))
    return results

  def run(self, train_state):
    for seed in range(self.num_seeds):
      for name, dataset_args in self.datasets.items():
        result = self.compute_fewshot_metrics(
            train_state, seed, *dataset_args)
        for shots, v in result.items():
          prefix = "a/" if (name, shots) in self.display_first else "z/"
          yield f"{prefix}{name}_{shots}shot-seed-{seed}", v


def _get_source(spec, split):
  """spec: a dataset name string (incl. "arrays:<root>") or a kwargs dict;
  prefix parsing lives in ds_core.get."""
  if isinstance(spec, dict):
    spec = dict(spec)
    return ds_core.get(spec.pop("name"), split=split, **spec)
  return ds_core.get(spec, split=split)
