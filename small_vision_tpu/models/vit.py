"""ViT encoder blocks with AdaLN-zero conditioning, plus a ViT classifier.

Parity target: /root/reference/big_vision/models/vit.py — `modulate` (:13),
sincos posembs (:18), MlpBlock (:39), Encoder1DBlock with AdaLN-zero 6-way
modulation or in-context token conditioning (:60-113), scan+remat Encoder
(:115-163), MAPHead (:165), the standalone classifier (:187-274), variant
table (:280), and hi-res posemb resampling (:301).

TPU-first deviations from the reference:
  - Matmul dtype defaults to bfloat16 (the reference computes in float32 —
    ae.py:51); params and LayerNorm stay float32.
  - Attention is our own q/k/v module wired to `ops.attention` so the fused
    Pallas path can be toggled per-model (`attn_impl="pallas"`).
  - Sharding constraints use `parallel.ctx.constrain` (explicit mesh axes)
    instead of flax logical-axis rules.
"""

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from small_vision_tpu.ops import layernorm as ln_lib
from small_vision_tpu.ops.attention import attention_packed
from small_vision_tpu.ops.fused_block import fused_mha, fused_mlp
from small_vision_tpu.parallel.ctx import constrain


class _FusedLN(nn.Module):
  """LayerNorm(+optional AdaLN modulate), flax-LayerNorm-compatible params.

  Param tree matches `nn.LayerNorm` (scale/bias, f32) — instantiate with
  name="LayerNorm_N" and checkpoints are interchangeable. On TPU with a
  pallas attn_impl it runs the fused Pallas kernel (one HBM round trip
  instead of XLA's multi-output LN fusion + separate modulate, ~0.9 ms →
  ~0.3 ms per LN at UMD-B/4 bs256); elsewhere it computes the same math in
  XLA. All statistics in f32; output in x.dtype.
  """
  use_pallas: bool = False
  interpret: bool = False

  @nn.compact
  def __call__(self, x, shift=None, scale=None):
    d = x.shape[-1]
    gamma = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
    beta = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
    use_pallas = self.use_pallas and (
        self.interpret or jax.default_backend() in ("tpu", "axon"))
    if use_pallas:
      return ln_lib.fused_ln_modulate(x, gamma, beta, shift, scale, 1e-6,
                                      self.interpret)
    return ln_lib.ln_modulate_reference(x, gamma, beta, shift, scale)


def modulate(x, shift, scale):
  """AdaLN modulation; shift/scale are (B, D), x is (B, L, D)."""
  return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def posemb_sincos_2d(h, w, width, temperature=10_000., dtype=jnp.float32):
  """Fixed 2-D sincos position embedding (MoCo-v3 convention)."""
  assert width % 4 == 0, "Width must be mult of 4 for sincos posemb"
  y, x = jnp.mgrid[:h, :w]
  omega = jnp.arange(width // 4) / (width // 4 - 1)
  omega = 1. / (temperature ** omega)
  y = jnp.einsum("m,d->md", y.flatten(), omega)
  x = jnp.einsum("m,d->md", x.flatten(), omega)
  pe = jnp.concatenate([jnp.sin(x), jnp.cos(x), jnp.sin(y), jnp.cos(y)],
                       axis=1)
  return jnp.asarray(pe, dtype)[None]


def get_posemb(module, typ, seqshape, width, name, dtype=jnp.float32):
  if typ == "learn":
    return module.param(
        name, nn.initializers.normal(stddev=1 / np.sqrt(width)),
        (1, int(np.prod(seqshape)), width), dtype)
  if typ == "sincos2d":
    return posemb_sincos_2d(*seqshape, width, dtype=dtype)
  raise ValueError(f"Unknown posemb type: {typ}")


class _DenseParams(nn.Module):
  """Declares nn.Dense-identical params (same names/shapes/inits) and hands
  them to a fused Pallas kernel instead of computing the matmul here."""
  d_in: int
  features: int
  dtype_mm: str = "bfloat16"

  @nn.compact
  def __call__(self):
    kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                        (self.d_in, self.features), jnp.float32)
    bias = self.param("bias", nn.initializers.normal(stddev=1e-6),
                      (self.features,), jnp.float32)
    return kernel.astype(self.dtype_mm), bias.astype(self.dtype_mm)


class MlpBlock(nn.Module):
  """Transformer feed-forward block (Dense → gelu → Dense).

  fused="pallas"/"interpret" runs both matmuls + gelu as ONE Pallas kernel
  (the (B, L, 4D) hidden never touches HBM); param tree stays identical to
  the unfused path (Dense_0/Dense_1), so checkpoints are interchangeable.
  """
  mlp_dim: Optional[int] = None  # Defaults to 4x input width.
  dropout: float = 0.0
  dtype_mm: str = "bfloat16"
  fused: str = "none"  # "none" | "pallas" | "interpret"
  quant: str = "none"  # "none" | "int8" (dynamic int8 fwd, see ops/quant.py)

  @nn.compact
  def __call__(self, x, deterministic=True):
    d = x.shape[-1]
    dh = self.mlp_dim or 4 * d
    if self.quant in ("int8", "int8_all"):
      # Experimental int8 path: both matmuls on the int8 MXU (2x bf16
      # throughput), params/bias handling identical to the Dense path.
      from small_vision_tpu.ops.quant import int8_dot
      w1, b1 = _DenseParams(d, dh, self.dtype_mm, name="Dense_0")()
      w2, b2 = _DenseParams(dh, d, self.dtype_mm, name="Dense_1")()
      x = x.astype(self.dtype_mm)
      h = nn.gelu(int8_dot(x, w1) + b1)
      h = nn.Dropout(rate=self.dropout)(h, deterministic)
      return int8_dot(h.astype(self.dtype_mm), w2) + b2
    use_fused = self.fused in ("pallas", "interpret") and (
        self.dropout == 0.0) and (
        self.fused == "interpret"
        or jax.default_backend() in ("tpu", "axon"))
    if use_fused:
      w1, b1 = _DenseParams(d, dh, self.dtype_mm, name="Dense_0")()
      w2, b2 = _DenseParams(dh, d, self.dtype_mm, name="Dense_1")()
      return fused_mlp(x.astype(self.dtype_mm), w1, b1, w2, b2,
                       self.fused == "interpret")

    inits = dict(kernel_init=nn.initializers.xavier_uniform(),
                 bias_init=nn.initializers.normal(stddev=1e-6))
    x = nn.Dense(dh, dtype=self.dtype_mm, **inits)(x)
    x = nn.gelu(x)
    x = nn.Dropout(rate=self.dropout)(x, deterministic)
    return nn.Dense(d, dtype=self.dtype_mm, **inits)(x)


class _PackedProj(nn.Module):
  """Head projection computed on packed (B, L, H*D) tensors.

  Param tree is IDENTICAL to `nn.DenseGeneral` (kernel (d, H, D) / (H, D, d),
  bias (H, D) / (d,), init drawn on the flattened 2-D shape exactly like
  flax's `kernel_init_wrap` — flax/linen/linear.py:144-151), but the
  activation never takes the 4-D (B, L, H, D) form: XLA laid those out
  batch-minor ({0,3,2,1}) for its matmul and then paid a full layout copy at
  every Pallas-kernel boundary (~30 ms/step at UMD-B/4 bs256, measured via
  xprof). Computing on a 2-D-reshaped kernel keeps every activation
  (B, L, H*D) row-major, which is the layout the packed Pallas attention
  kernels require — so the copies vanish.
  """
  features: Sequence[int]  # (num_heads, head_dim); kernel is (d, H, D)
  dtype_mm: str = "bfloat16"
  quant: str = "none"

  @nn.compact
  def __call__(self, x, return_params=False):
    d_in = x.shape[-1]
    h, hd = self.features
    flat_out = h * hd

    def kernel_init(rng, shape, dtype):
      flat = nn.initializers.xavier_uniform()(rng, (d_in, flat_out), dtype)
      return flat.reshape(shape)

    kernel = self.param("kernel", kernel_init, (d_in, h, hd), jnp.float32)
    bias = self.param("bias", nn.initializers.zeros, (h, hd), jnp.float32)
    if return_params:
      # Fused-kernel path: hand the 2-D compute-dtype weights to the
      # caller's Pallas kernel; x is only consulted for its input width.
      return (kernel.reshape(d_in, flat_out).astype(self.dtype_mm),
              bias.reshape(flat_out).astype(self.dtype_mm))
    w2 = kernel.reshape(d_in, flat_out).astype(self.dtype_mm)
    if self.quant == "int8":
      from small_vision_tpu.ops.quant import int8_dot
      y = int8_dot(x.astype(self.dtype_mm), w2)
    else:
      y = jnp.dot(x.astype(self.dtype_mm), w2)
    return y + bias.reshape(flat_out).astype(self.dtype_mm)


class _PackedOutProj(nn.Module):
  """Out-projection on packed tensors; params match DenseGeneral(axis=(-2,-1))."""
  num_heads: int
  head_dim: int
  features: int
  dtype_mm: str = "bfloat16"
  quant: str = "none"

  @nn.compact
  def __call__(self, o, return_params=False):  # o: (B, L, H*D)
    h, hd, d = self.num_heads, self.head_dim, self.features

    def kernel_init(rng, shape, dtype):
      flat = nn.initializers.xavier_uniform()(rng, (h * hd, d), dtype)
      return flat.reshape(shape)

    kernel = self.param("kernel", kernel_init, (h, hd, d), jnp.float32)
    bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
    if return_params:
      return (kernel.reshape(h * hd, d).astype(self.dtype_mm),
              bias.astype(self.dtype_mm))
    w2 = kernel.reshape(h * hd, d).astype(self.dtype_mm)
    if self.quant == "int8":
      from small_vision_tpu.ops.quant import int8_dot
      y = int8_dot(o.astype(self.dtype_mm), w2)
    else:
      y = jnp.dot(o.astype(self.dtype_mm), w2)
    return y + bias.astype(self.dtype_mm)


class MultiHeadAttention(nn.Module):
  """Self-attention with explicit q/k/v/out projections.

  Param layout matches flax MHA (kernel shapes (d, heads, head_dim)) so
  tensor-parallel regex rules and checkpoint tooling see standard names —
  but activations stay packed (B, L, H*D) end-to-end (see _PackedProj).
  """
  num_heads: int
  dtype_mm: str = "bfloat16"
  # "xla" | "flax" | "pallas" | "pallas_interpret" | "pallas_fused"
  # | "pallas_fused_interpret"
  attn_impl: str = "xla"
  quant: str = "none"  # "int8": quantized q/k/v/out projections

  @nn.compact
  def __call__(self, x):
    d = x.shape[-1]
    assert d % self.num_heads == 0
    head_dim = d // self.num_heads

    if self.attn_impl == "flax":
      # The reference's exact implementation: stock flax MHA with
      # DenseGeneral projections (reference models/vit.py:82-87). Same
      # param tree (query/key/value/out, kernels (d, H, hd)); used by the
      # bench's reference-configuration mode so the baseline measures the
      # reference's own compute pattern, not our packed modules.
      mha = nn.MultiHeadDotProductAttention(
          num_heads=self.num_heads, dtype=self.dtype_mm,
          kernel_init=nn.initializers.xavier_uniform(),
          deterministic=True)
      nn.share_scope(self, mha)  # params live at query/key/value/out
      return mha(x, x)
    proj = lambda name: _PackedProj(
        features=(self.num_heads, head_dim), name=name,
        dtype_mm=self.dtype_mm, quant=self.quant)
    out_proj = _PackedOutProj(
        num_heads=self.num_heads, head_dim=head_dim, features=d,
        name="out", dtype_mm=self.dtype_mm, quant=self.quant)
    interp = self.attn_impl.endswith("interpret")

    if self.attn_impl.startswith("pallas_fused") and (
        interp or jax.default_backend() in ("tpu", "axon")):
      # One kernel for projections + attention + out-projection: q/k/v and
      # per-head scores never leave VMEM (2 HBM passes instead of ~9).
      # Note: the "save_attn" remat name doesn't exist on this path.
      wq, bq = proj("query")(x, return_params=True)
      wk, bk = proj("key")(x, return_params=True)
      wv, bv = proj("value")(x, return_params=True)
      wo, bo = out_proj(x, return_params=True)
      return fused_mha(x.astype(self.dtype_mm), wq, bq, wk, bk, wv, bv,
                       wo, bo, self.num_heads, interp)

    q, k, v = proj("query")(x), proj("key")(x), proj("value")(x)

    o = attention_packed(q, k, v, self.num_heads,
                         use_pallas=self.attn_impl.startswith("pallas"),
                         interpret=interp)
    # Named for remat: policy "save_attn" keeps this (cheap, (B,L,D)-sized)
    # so backward skips recomputing the attention forward.
    o = checkpoint_name(o, "attn_out")

    return out_proj(o)


class Block(nn.Module):
  """Pre-LN transformer block, optionally AdaLN-zero conditioned.

  With `adaln`: a zero-init Dense maps the conditioning vector to 6
  modulation vectors (shift/scale/gate for attention and MLP sub-blocks), so
  at init the block is an identity residual (DiT's AdaLN-zero discipline —
  load-bearing for training stability).
  Without `adaln` but with cond: the conditioning vector joins the sequence
  as an extra token (in-context conditioning) and is stripped after.
  """
  mlp_dim: Optional[int] = None
  num_heads: int = 12
  dropout: float = 0.0
  adaln: bool = False
  dtype_mm: str = "bfloat16"
  attn_impl: str = "xla"
  quant: str = "none"

  @nn.compact
  def __call__(self, x, cond=None, deterministic=True):
    use_adaln = cond is not None and self.adaln
    if use_adaln:
      mods = nn.Dense(6 * x.shape[-1], kernel_init=nn.initializers.zeros,
                      dtype=self.dtype_mm)(cond)
      (shift_a, scale_a, gate_a,
       shift_m, scale_m, gate_m) = jnp.split(mods, 6, axis=-1)
    elif cond is not None:
      x = jnp.concatenate([cond[:, None, :], x], axis=1)

    x = constrain(x, "batch", None, "embed")
    # LayerNorm statistics in fp32, output cast back to the compute dtype so
    # the residual stream stays bf16 (fp32 LN outputs would silently promote
    # every downstream tensor and double HBM traffic). The LN and the AdaLN
    # modulate run as ONE fused Pallas kernel on TPU (see _FusedLN).
    fused_pallas = self.attn_impl.startswith("pallas")
    interp = self.attn_impl.endswith("interpret")
    fln = lambda name: _FusedLN(use_pallas=fused_pallas, interpret=interp,
                                name=name)
    y = fln("LayerNorm_0")(
        x, shift_a if use_adaln else None,
        scale_a if use_adaln else None).astype(self.dtype_mm)
    y = MultiHeadAttention(num_heads=self.num_heads, dtype_mm=self.dtype_mm,
                           attn_impl=self.attn_impl,
                           quant="int8" if self.quant == "int8_all"
                           else "none")(y)
    if use_adaln:
      y = gate_a[:, None, :] * y
    y = constrain(y, "batch", None, "embed")
    y = nn.Dropout(rate=self.dropout)(y, deterministic)
    x = x + y

    y = fln("LayerNorm_1")(
        x, shift_m if use_adaln else None,
        scale_m if use_adaln else None).astype(self.dtype_mm)
    mlp_fused = ("none" if not self.attn_impl.startswith("pallas_fused")
                 else ("interpret" if interp else "pallas"))
    y = MlpBlock(mlp_dim=self.mlp_dim, dropout=self.dropout,
                 dtype_mm=self.dtype_mm, fused=mlp_fused,
                 quant=self.quant)(y, deterministic)
    # Named for remat: "save_attn_mlp" keeps this (B, L, D) tensor so the
    # backward recompute stops at the down-projection instead of re-running
    # the (B, L, 4D) up-projection + gelu.
    y = checkpoint_name(y, "mlp_out")
    if use_adaln:
      y = gate_m[:, None, :] * y
    y = nn.Dropout(rate=self.dropout)(y, deterministic)
    x = x + y
    x = constrain(x, "batch", None, "embed")

    if cond is not None and not self.adaln:
      x = x[:, 1:]
    # (carry, ys) pair: required by nn.scan over the depth dimension.
    return x, ()


class Encoder(nn.Module):
  """Stack of Blocks; `scan=True` compiles one block program iterated with
  lax.scan + rematerialization (remat policy configurable).

  `pipe_stages > 1` pipelines the stack over the mesh's 'pipe' axis
  (parallel/pipeline.py): params keep the scan layout [depth, ...] —
  sharded P('pipe') on the depth dim, each stage's devices hold only their
  contiguous layers — and activations flow stage-to-stage via ppermute on
  the GPipe schedule. Requires scan=True (param layout), an active mesh
  (parallel.ctx) with a 'pipe' axis of exactly pipe_stages, dropout 0.
  """
  depth: int
  mlp_dim: Optional[int] = None
  num_heads: int = 12
  dropout: float = 0.0
  scan: bool = False
  adaln: bool = False
  remat_policy: str = "nothing_saveable"
  dtype_mm: str = "bfloat16"
  attn_impl: str = "xla"
  quant: str = "none"
  pipe_stages: int = 0
  pipe_microbatches: int = 0

  @nn.compact
  def __call__(self, x, cond=None, deterministic=True):
    kw = dict(mlp_dim=self.mlp_dim, num_heads=self.num_heads,
              dropout=self.dropout, adaln=self.adaln,
              dtype_mm=self.dtype_mm, attn_impl=self.attn_impl,
              quant=self.quant)

    if self.pipe_stages > 1 and not self.is_initializing():
      # Params were created by the nn.scan path at init (identical tree);
      # here they are fed through the explicit pipeline schedule instead.
      from small_vision_tpu.parallel import ctx as ctx_lib
      from small_vision_tpu.parallel import mesh as mesh_lib
      from small_vision_tpu.parallel import pipeline as pl

      mesh = ctx_lib.current_mesh()
      assert self.scan, "pipe_stages needs scan=True (stacked param layout)"
      assert mesh is not None and "pipe" in mesh.axis_names, (
          "pipe_stages needs an active mesh (parallel.ctx.activate_mesh) "
          f"with a 'pipe' axis; got {mesh}")
      assert mesh.shape["pipe"] == self.pipe_stages, (
          f"mesh pipe axis {mesh.shape['pipe']} != pipe_stages "
          f"{self.pipe_stages}")
      assert self.dropout == 0.0, "pipeline path supports dropout=0 only"
      stacked = self.get_variable("params", "blocks")
      block = Block(**kw)

      def block_fn(lp, h, *aux):
        # Sharding constraints are GSPMD-only; inside shard_map the axes
        # are manual, so deactivate the mesh ctx for the block trace.
        with ctx_lib.activate_mesh(None):
          h, _ = block.apply({"params": lp}, h,
                             aux[0] if aux else None, deterministic)
        return h

      n_mb = self.pipe_microbatches or 4 * self.pipe_stages
      x = pl.pipeline_apply_stacked(
          block_fn, stacked, x, mesh=mesh,
          n_microbatches=n_mb, batch_axes=mesh_lib.batch_axes(mesh),
          aux=cond)
      return nn.LayerNorm(name="encoder_norm")(x)

    def remat_block(prevent_cse):
      if self.remat_policy == "save_attn":
        policy = jax.checkpoint_policies.save_only_these_names("attn_out")
      elif self.remat_policy == "save_attn_mlp":
        # Save only the (B, L, D)-sized attention and MLP outputs per block:
        # ~3 residual-stream tensors per block live in HBM instead of the
        # full activation set (the (B, L, 4D) MLP hidden alone is 4x the
        # stream). Backward recomputes the LNs and the q/k/v/out/up
        # projections — cheap next to letting XLA auto-remat under HBM
        # pressure, which cascades (observed .remat3 recomputes) and
        # degrades matmul layouts.
        policy = jax.checkpoint_policies.save_only_these_names(
            "attn_out", "mlp_out")
      else:
        policy = getattr(jax.checkpoint_policies, self.remat_policy, None)
      # prevent_cse: REQUIRED when blocks are unrolled — otherwise XLA CSEs
      # the backward's recomputation with the forward values, silently
      # reinstating the full activation set (observed: identical HLO temp
      # size with and without the policy). Under nn.scan the loop structure
      # already blocks that CSE, and prevent_cse=False compiles faster.
      return nn.remat(
          Block,
          prevent_cse=prevent_cse,
          static_argnums=(-1,),  # deterministic
          policy=policy)

    if self.scan:
      if self.remat_policy in ("none", None):
        # No rematerialization: with fused attention kernels, recomputing
        # the forward in backward costs ~20% of step time, and B-scale
        # activations fit HBM comfortably. Scan still bounds compile size.
        block_cls = Block
      else:
        block_cls = remat_block(prevent_cse=False)
      x, _ = nn.scan(
          block_cls,
          variable_axes={"params": 0},
          split_rngs={"params": True, "dropout": True},
          in_axes=nn.broadcast,
          length=self.depth,
          metadata_params={nn.PARTITION_NAME: None},
      )(**kw, name="blocks")(x, cond, deterministic)
    else:
      # Unrolled path: selective "save_*" policies apply explicit per-block
      # remat; the legacy full policies keep the historical no-remat
      # behavior (XLA decides, which is fine when activations fit HBM).
      if self.remat_policy in ("save_attn", "save_attn_mlp"):
        block_cls = remat_block(prevent_cse=True)
      else:
        block_cls = Block
      for i in range(self.depth):
        x, _ = block_cls(**kw, name=f"blocks_{i:02d}")(x, cond, deterministic)
    return nn.LayerNorm(name="encoder_norm")(x)


class MAPHead(nn.Module):
  """Multihead attention pooling head for the classifier."""
  mlp_dim: Optional[int] = None
  num_heads: int = 12

  @nn.compact
  def __call__(self, x):
    n, _, d = x.shape
    probe = self.param("probe", nn.initializers.xavier_uniform(), (1, 1, d),
                       x.dtype)
    probe = jnp.tile(probe, [n, 1, 1])
    x = nn.MultiHeadDotProductAttention(
        num_heads=self.num_heads,
        kernel_init=nn.initializers.xavier_uniform())(probe, x)
    y = nn.LayerNorm()(x)
    x = x + MlpBlock(mlp_dim=self.mlp_dim, dtype_mm="float32")(y)
    return x[:, 0]


class _ViT(nn.Module):
  """Plain ViT classifier (reference vit.py:187-274) — used by FID's
  inception stand-ins, linear-probe baselines, and as a zoo model."""
  num_classes: Optional[int] = None
  patch_size: Sequence[int] = (16, 16)
  width: int = 768
  depth: int = 12
  mlp_dim: Optional[int] = None
  num_heads: int = 12
  posemb: str = "learn"
  rep_size: Union[int, bool] = False
  dropout: float = 0.0
  pool_type: str = "gap"  # "map" | "gap" | "0" | "tok"
  head_zeroinit: bool = True
  scan: bool = False
  remat_policy: str = "nothing_saveable"
  dtype_mm: str = "bfloat16"
  attn_impl: str = "xla"

  @nn.compact
  def __call__(self, image, *, train=False):
    out = {}
    image = jnp.asarray(image, self.dtype_mm)
    x = out["stem"] = nn.Conv(
        self.width, self.patch_size, strides=self.patch_size,
        padding="VALID", name="embedding", dtype=self.dtype_mm)(image)
    n, h, w, c = x.shape
    x = jnp.reshape(x, [n, h * w, c])

    x = out["with_posemb"] = x + get_posemb(
        self, self.posemb, (h, w), c, "pos_embedding", x.dtype)

    if self.pool_type == "tok":
      cls = self.param("cls", nn.initializers.zeros, (1, 1, c), x.dtype)
      x = jnp.concatenate([jnp.tile(cls, [n, 1, 1]), x], axis=1)

    x = nn.Dropout(rate=self.dropout)(x, not train)
    x = Encoder(
        depth=self.depth, mlp_dim=self.mlp_dim, num_heads=self.num_heads,
        dropout=self.dropout, scan=self.scan,
        remat_policy=self.remat_policy, dtype_mm=self.dtype_mm,
        attn_impl=self.attn_impl, name="Transformer")(
            x, deterministic=not train)
    encoded = out["encoded"] = x

    if self.pool_type == "map":
      x = out["head_input"] = MAPHead(
          num_heads=self.num_heads, mlp_dim=self.mlp_dim)(x)
    elif self.pool_type == "gap":
      x = out["head_input"] = jnp.mean(x, axis=1)
    elif self.pool_type in ("0", "tok"):
      x = out["head_input"] = x[:, 0]
      if self.pool_type == "tok":
        encoded = encoded[:, 1:]
    else:
      raise ValueError(f"Unknown pool type: '{self.pool_type}'")

    x_2d = jnp.reshape(encoded, [n, h, w, -1])

    if self.rep_size:
      rep_size = self.width if self.rep_size is True else self.rep_size
      hid = nn.Dense(rep_size, name="pre_logits")
      x_2d = nn.tanh(hid(x_2d))
      x = nn.tanh(hid(x))

    out["pre_logits_2d"] = x_2d
    out["pre_logits"] = x

    if self.num_classes:
      kw = {"kernel_init": nn.initializers.zeros} if self.head_zeroinit else {}
      head = nn.Dense(self.num_classes, name="head", **kw)
      out["logits_2d"] = head(x_2d)
      x = out["logits"] = head(x)

    return x, out


def decode_variant(variant):
  """Decodes "B/16"-style variant strings into ViT dims (std. table)."""
  if variant is None:
    return {}
  v, patch = variant, {}
  if "/" in variant:
    v, p = variant.split("/")
    patch = {"patch_size": (int(p), int(p))}
  return {
      "width": {"mu": 32, "Ti": 192, "S": 384, "M": 512, "B": 768,
                "L": 1024, "H": 1280, "g": 1408, "G": 1664}[v],
      "depth": {"mu": 1, "Ti": 12, "S": 12, "M": 12, "B": 12,
                "L": 24, "H": 32, "g": 40, "G": 48}[v],
      "mlp_dim": {"mu": 128, "Ti": 768, "S": 1536, "M": 2048, "B": 3072,
                  "L": 4096, "H": 5120, "g": 6144, "G": 8192}[v],
      "num_heads": {"mu": 2, "Ti": 3, "S": 6, "M": 8, "B": 12,
                    "L": 16, "H": 16, "g": 16, "G": 16}[v],
      **patch,
  }


def ViT(num_classes=None, *, variant=None, **kw):  # noqa: N802
  return _ViT(num_classes, **{**decode_variant(variant), **kw})


Model = ViT  # Factory alias for `models.get_model_module("vit").Model`.


def resample_posemb(old, new):
  """Bilinear posemb grid resize for hi-res finetuning."""
  import scipy.ndimage
  if old.shape == new.shape:
    return old
  gs_old = int(np.sqrt(old.shape[1]))
  gs_new = int(np.sqrt(new.shape[1]))
  grid = np.asarray(old).reshape(gs_old, gs_old, -1)
  grid = scipy.ndimage.zoom(grid, (gs_new / gs_old, gs_new / gs_old, 1),
                            order=1)
  return jnp.asarray(grid.reshape(1, gs_new * gs_new, -1), old.dtype)
