"""VideoMAE-style video Vision Transformer backbone, TPU-native.

Capability parity with the reference ViT (ref: model/modeling_slot.py:70-177,
219-377 and model/modeling_finetune.py:178-325), re-designed for XLA/TPU:

* channels-last input [B, T, H, W, C] (TPU-native layout; the reference is
  NCTHW).
* tubelet patch embedding as reshape + one big matmul (maps straight onto
  the MXU; the reference uses cuDNN Conv3d with kernel == stride, which is
  mathematically the same linear map — ref model/modeling_slot.py:155-177).
* fused QKV projection with the VideoMAE bias convention: learnable q/v
  biases, zero k bias (ref model/modeling_slot.py:83-99).
* fixed (non-learned) sinusoid position table added with stop_gradient
  (ref model/modeling_slot.py:181-191, 354-355).
* static shapes, scan-free block stack (12 blocks unrolled — XLA fuses),
  optional remat for memory.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

trunc02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def sinusoid_position_table(n_position: int, d_hid: int) -> np.ndarray:
    """Fixed sine/cosine table, bit-identical to the reference
    (ref: model/modeling_slot.py:181-191): angle[p, j] = p / 10000^(2(j//2)/d);
    even dims sin, odd dims cos."""
    pos = np.arange(n_position, dtype=np.float64)[:, None]
    j = np.arange(d_hid, dtype=np.float64)[None, :]
    angle = pos / np.power(10000.0, 2.0 * (j // 2) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table.astype(np.float32)


def drop_path(
    x: jax.Array, rate, deterministic: bool, rng: Optional[jax.Array]
) -> jax.Array:
    """Per-sample stochastic depth (timm `drop_path` semantics: scale kept
    samples by 1/keep_prob). `rate` may be a traced scalar (the pipeline-
    parallel stage scan selects the per-block linspace rate at runtime,
    core/pipeline.py); the zero-rate shortcut only applies to static rates."""
    if deterministic or (isinstance(rate, float) and rate == 0.0):
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape=shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


import functools as _functools


def _row_means(*terms):
    """Per-row means over the feature (minor/lane) dim via an MXU dot.

    VPU cross-lane reductions over the minor dim are the slow path on TPU:
    XLA output-fuses them into the producer matmul and stalls it ~3x
    (profiled: fc2 [12,1568,3072]x[3072,768] alone 0.48 ms, fused with the
    following LayerNorm's mean/var rows 1.43 ms). A dot against a constant
    runs the same reduction on the MXU instead. The RHS is 128 lanes wide
    (col 0 = 1/C, rest zero): XLA canonicalizes a [C,1] dot straight back
    into the VPU reduce (verified: bit-identical executable), but leaves a
    [C,128] dot on the MXU — 128x redundant math that is still ~20x faster
    than the fused cross-lane reduction. Each term is [..., C]; returns one
    [..., 1] mean per term."""
    C = terms[0].shape[-1]
    w = jnp.zeros((C, 128), jnp.float32).at[:, 0].set(1.0 / C)
    nd = terms[0].ndim
    return tuple(
        jax.lax.dot_general(
            t, w, (((nd - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[..., :1]
        for t in terms
    )


@_functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layer_norm(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean, meansq = _row_means(xf, jnp.square(xf))
    var = meansq - jnp.square(mean)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias
    return y.astype(x.dtype)


def _layer_norm_fwd(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean, meansq = _row_means(xf, jnp.square(xf))
    var = meansq - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * inv * scale + bias
    return y.astype(x.dtype), (x, mean, inv, scale)


def _layer_norm_bwd(eps, res, dy):
    x, mean, inv, scale = res
    xhat = (x.astype(jnp.float32) - mean) * inv
    dyf = dy.astype(jnp.float32)
    t = dyf * scale
    m1, m2 = _row_means(t, t * xhat)
    dx = (inv * (t - m1 - xhat * m2)).astype(x.dtype)
    red = tuple(range(dy.ndim - 1))
    return dx, (dyf * xhat).sum(red), dyf.sum(red)


_layer_norm.defvjp(_layer_norm_fwd, _layer_norm_bwd)


class FastLayerNorm(nn.Module):
    """LayerNorm with f32 statistics but low-precision residuals.

    Same math as nn.LayerNorm (fast-variance form, f32 stats) and the same
    param names/shapes, but the custom VJP saves only the bf16 activations
    plus the tiny f32 (mean, rsqrt) rows. flax's LayerNorm promotes x to f32
    and autodiff then saves the full f32 activation tensor to HBM — at
    [12,1568,768] x 24 norms that materialization dominated the train-step
    profile (~1.4 ms per norm per step on v5e)."""

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        return _layer_norm(x.astype(self.dtype), scale, bias, self.epsilon)


class Mlp(nn.Module):
    """Transformer MLP: fc1 -> GELU -> fc2 -> dropout
    (ref: model/modeling_slot.py:50-67 — note the reference drops only after
    fc2, not between)."""

    hidden_dim: int
    out_dim: int
    drop: float = 0.0
    # None: tanh GELU in bf16 (fast path), exact erf otherwise. Explicit
    # True/False overrides — exact_gelu=True at the model level keeps
    # bf16 runs erf-exact for parity studies (torch uses exact GELU).
    gelu_approx: Optional[bool] = None
    int8_dense: bool = False  # w8a8 MXU GEMMs (frozen-inference only)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.int8_dense:
            from devias_tpu.nn.quant import Int8Dense as _Dense
        else:
            _Dense = nn.Dense
        x = _Dense(self.hidden_dim, dtype=self.dtype, kernel_init=trunc02, name="fc1")(x)
        # exact erf GELU in f32 (torch-parity tests run f32); tanh form in
        # the bf16 compute path — XLA's erf lowering costs ~35 ms/step at
        # batch 12 (20% of the whole train step), while the tanh form
        # differs by at most 4.7e-4 absolute (measured over [-12, 12]),
        # an order of magnitude below bf16 resolution at unit scale
        approx = self.gelu_approx
        if approx is None:
            approx = self.dtype == jnp.bfloat16
        x = nn.gelu(x, approximate=approx)
        x = _Dense(self.out_dim, dtype=self.dtype, kernel_init=trunc02, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    """Multi-head self-attention with the VideoMAE fused-QKV bias trick:
    one [D, 3D] kernel, learnable q_bias and v_bias, k bias fixed to zero
    (ref: model/modeling_slot.py:70-117).

    fused=True routes through the Pallas fused-attention kernel
    (devias_tpu.kernels.attention) — same math, no [B, H, N, N]
    materialization in HBM. Requires attn_drop == 0 (the published DEVIAS
    recipes never enable attention dropout)."""

    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    fused: bool = False
    fused_interpret: bool = False  # Pallas interpreter (CPU tests)
    # Sequence parallelism: when set to a mesh axis name (and running under
    # shard_map with tokens sharded over that axis), each shard attends its
    # local query rows against the all_gather'd K/V; autodiff turns the
    # gather into the reduce-scatter of dK/dV. Beyond reference parity
    # (SURVEY §2.8 lists SP as absent upstream) — pays at longer clips /
    # higher resolutions where N grows past one chip's comfort.
    seq_axis: Optional[str] = None
    int8_dense: bool = False  # w8a8 qkv/proj GEMMs (frozen-inference only)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, return_attn: bool = False):
        B, N, C = x.shape
        head_dim = C // self.num_heads
        scale = self.qk_scale or head_dim**-0.5

        qkv_kernel = self.param("qkv_kernel", trunc02, (C, 3 * C), jnp.float32)
        if self.int8_dense:
            from devias_tpu.nn.quant import Int8Dense as _proj_cls
            from devias_tpu.nn.quant import int8_dot

            qkv = int8_dot(x, qkv_kernel).astype(self.dtype)
        else:
            _proj_cls = nn.Dense
            qkv = jnp.einsum("bnc,cd->bnd", x, qkv_kernel.astype(self.dtype))
        if self.qkv_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros, (C,), jnp.float32)
            v_bias = self.param("v_bias", nn.initializers.zeros, (C,), jnp.float32)
            bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
            qkv = qkv + bias.astype(self.dtype)

        if self.seq_axis is not None:
            if return_attn:
                raise NotImplementedError("return_attn under sequence parallelism")
            if self.attn_drop > 0.0:
                # the single-chip paths apply attention-probability dropout;
                # silently training without it under SP would be a config-
                # dependent regularization change (never used by the
                # published DEVIAS recipes, so fail loudly instead)
                raise NotImplementedError("attn_drop > 0 under sequence parallelism")
            q = qkv[..., :C]
            kv = jax.lax.all_gather(qkv[..., C:], self.seq_axis, axis=1, tiled=True)
            if self.fused and self.attn_drop == 0.0:
                from devias_tpu.kernels.attention import fused_attention_q_kv

                out = fused_attention_q_kv(
                    q, kv, self.num_heads, scale, None, self.fused_interpret
                )
            else:
                Nk = kv.shape[1]
                qh = q.reshape(B, N, self.num_heads, head_dim)
                kh = kv[..., :C].reshape(B, Nk, self.num_heads, head_dim)
                vh = kv[..., C:].reshape(B, Nk, self.num_heads, head_dim)
                attn = jnp.einsum("bnhd,bmhd->bhnm", qh * scale, kh)
                attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
                out = jnp.einsum("bhnm,bmhd->bnhd", attn, vh).reshape(B, N, C)
        elif self.fused and not return_attn and self.attn_drop == 0.0:
            from devias_tpu.kernels.attention import fused_attention_qkv

            # the kernel indexes head/component slices of the fused [B, N,
            # 3C] projection directly and emits [B, N, C] — no head
            # split/merge transposes in fwd or bwd (they cost ~20 ms/step
            # at batch 12 as XLA layout copies)
            out = fused_attention_qkv(
                qkv, self.num_heads, scale, None, self.fused_interpret
            )
        else:
            qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, d]
            attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
            attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
            if return_attn:
                out = _proj_cls(C, dtype=self.dtype, kernel_init=trunc02, name="proj")(out)
                out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
                return out, attn

        out = _proj_cls(C, dtype=self.dtype, kernel_init=trunc02, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class Block(nn.Module):
    """Pre-norm transformer block with DropPath and optional LayerScale
    (ref: model/modeling_slot.py:120-152)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    init_values: float = 0.0
    norm_eps: float = 1e-6
    fused_attention: bool = False
    fused_interpret: bool = False
    seq_axis: Optional[str] = None
    exact_gelu: bool = False  # force erf GELU even in bf16 (parity runs)
    int8_dense: bool = False  # w8a8 GEMMs (frozen-inference only)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, drop_path_override=None):
        # drop_path_override: traced per-block rate for callers that scan one
        # Block over stacked per-block params (core/pipeline.py) — a module
        # attribute can't vary inside the scan, so the linspace rate is
        # selected at runtime and passed in.
        dp_rate = (
            self.drop_path_rate if drop_path_override is None else drop_path_override
        )
        C = x.shape[-1]
        y = FastLayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm1")(x)
        y = Attention(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            fused=self.fused_attention,
            fused_interpret=self.fused_interpret,
            seq_axis=self.seq_axis,
            int8_dense=self.int8_dense,
            dtype=self.dtype,
            name="attn",
        )(y, deterministic=deterministic)
        if self.init_values > 0:
            gamma_1 = self.param(
                "gamma_1", nn.initializers.constant(self.init_values), (C,), jnp.float32
            )
            y = y * gamma_1.astype(self.dtype)
        rng = None if deterministic else self.make_rng("drop_path")
        x = x + drop_path(y, self.drop_path_rate, deterministic, rng)

        y = FastLayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm2")(x)
        y = Mlp(
            hidden_dim=int(C * self.mlp_ratio),
            out_dim=C,
            drop=self.drop,
            gelu_approx=False if self.exact_gelu else None,
            int8_dense=self.int8_dense,
            dtype=self.dtype,
            name="mlp",
        )(y, deterministic=deterministic)
        if self.init_values > 0:
            gamma_2 = self.param(
                "gamma_2", nn.initializers.constant(self.init_values), (C,), jnp.float32
            )
            y = y * gamma_2.astype(self.dtype)
        rng = None if deterministic else self.make_rng("drop_path")
        x = x + drop_path(y, self.drop_path_rate, deterministic, rng)
        return x


def patchify_video(x, tubelet: int = 2, patch: int = 16):
    """[B, T, H, W, C] -> [B, t*h*w, tubelet*p*p*C] flattened tubelet
    patches in (t, ph, pw, c) order — PatchEmbed3D's kernel layout.

    Producers that end in elementwise work (FAME's mix/normalize epilogue)
    should call this ON their output: XLA emits the transpose as the
    producer fusion's output layout, and the patch embed then runs as a
    pure [B*N, K] @ [K, D] GEMM at MXU peak instead of the strided conv
    (~10% MXU) + relayout copies the 5-D path costs (docs/PERF.md)."""
    B, T, H, W, C = x.shape
    if H % patch or W % patch or T % tubelet:
        raise ValueError(f"input {x.shape} not divisible by patch {tubelet}x{patch}x{patch}")
    t, h, w = T // tubelet, H // patch, W // patch
    x = x.reshape(B, t, tubelet, h, patch, w, patch, C)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(B, t * h * w, tubelet * patch * patch * C)


class PatchEmbed3D(nn.Module):
    """Tubelet patch embedding (ref: model/modeling_slot.py:155-177).

    Token order is (t, h, w), matching the reference's flatten(2) of
    [B, D, T', H', W']. Kernel is stored as [tubelet*p*p*C, D] with the
    flattened patch laid out in (t, ph, pw, c) order.

    Three lowerings, selected by `mode` (`use_conv` kept as the legacy
    boolean switch between the first two):
      * 'conv' (space-to-depth `conv_general_dilated`) — best when the
        input arrives straight from HBM in video layout;
      * 'patchify' + one [B*N, K] @ [K, D] matmul — best when an
        elementwise producer (FAME's mix/normalize epilogue) can absorb the
        patchify transpose, leaving a pure MXU-peak GEMM; also lets the
        student and teacher share one patchified tensor via CSE;
      * 'dot' — one `dot_general` over the 8-D patch view with FOUR
        contracting dims (dt, ph, pw, c): no explicit transpose in the
        graph; XLA plans the single operand relayout it prefers instead of
        the profile's back-to-back copy (2.3 ms) + reshape (1.0 ms) pair
        the 'patchify' form produces (docs/PERF.md round-3 breakdown).
    All are exactly the same math and parameter layout.
    """

    embed_dim: int = 768
    patch_size: int = 16
    tubelet_size: int = 2
    use_conv: bool = True
    mode: Optional[str] = None  # overrides use_conv: 'conv'|'patchify'|'dot'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p, tb = self.patch_size, self.tubelet_size
        B, T, H, W, C = x.shape
        if H % p or W % p or T % tb:
            raise ValueError(f"input {x.shape} not divisible by patch {tb}x{p}x{p}")
        t, h, w = T // tb, H // p, W // p
        mode = self.mode or ("conv" if self.use_conv else "patchify")
        if mode not in ("conv", "patchify", "dot"):
            raise ValueError(f"unknown patch-embed mode {mode!r}")
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (tb * p * p * C, self.embed_dim),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.embed_dim,), jnp.float32)
        if mode == "dot":
            x8 = x.astype(self.dtype).reshape(B, t, tb, h, p, w, p, C)
            k5 = kernel.reshape(tb, p, p, C, self.embed_dim).astype(self.dtype)
            out = jax.lax.dot_general(
                x8, k5, (((2, 4, 6, 7), (0, 1, 2, 3)), ((), ()))
            )  # [B, t, h, w, D]
            return out.reshape(B, t * h * w, self.embed_dim) + bias.astype(self.dtype)
        if mode == "patchify":
            patches = patchify_video(x.astype(self.dtype), tb, p)
            return patches @ kernel.astype(self.dtype) + bias.astype(self.dtype)
        x = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.reshape(tb, p, p, C, self.embed_dim).astype(self.dtype),
            window_strides=(tb, p, p),
            padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        x = x.reshape(B, t * h * w, self.embed_dim) + bias.astype(self.dtype)
        return x


class VideoViT(nn.Module):
    """ViT-B/16 video backbone producing patch tokens [B, N, D].

    Matches the reference's forward_features (ref: model/modeling_slot.py:350-377):
    patch embed -> +fixed sinusoid pos (stop_gradient) -> pos dropout ->
    depth x Block -> LayerNorm (or Identity when `final_norm=False`, used by
    the mean-pooling classifier variant, ref modeling_finetune.py:236).

    `use_cls_token=True` prepends a learned CLS token (scene-model variant,
    ref modeling_finetune.py:214-218); `num_extra_suffix_tokens` appends
    learned tokens (multi-task scene token, ref modeling_multi_task.py:296-298).
    """

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    init_values: float = 0.0
    patch_size: int = 16
    tubelet_size: int = 2
    norm_eps: float = 1e-6
    use_learnable_pos_emb: bool = False
    use_cls_token: bool = False
    num_extra_suffix_tokens: int = 0
    final_norm: bool = True
    remat: bool = False
    fused_attention: bool = False
    fused_interpret: bool = False
    exact_gelu: bool = False  # force erf GELU even in bf16 (parity runs)
    # patch-embed lowering: conv (space-to-depth) vs patchify+matmul — same
    # math; see PatchEmbed3D. matmul wins when an elementwise producer
    # (FAME) absorbs the patchify transpose.
    patch_embed_conv: bool = True
    patch_embed_mode: Optional[str] = None  # 'conv'|'patchify'|'dot' (wins over the bool)
    # input_norm=True moves ImageNet normalization onto the device: the
    # pipeline ships uint8 (or [0,1] float) clips — 4x smaller host->device
    # transfers and no host-side float pass; the affine fuses into the
    # patch-embed matmul under XLA. Mathematically identical to host
    # normalization (ref kinetics.py:262-264).
    input_norm: bool = False
    # Sequence parallelism (run under shard_map with the video's FRAME axis
    # sharded over `seq_axis`; token order (t, h, w) makes frame shards ==
    # contiguous token shards). seq_shards is the static axis size, needed
    # to build the full positional table. Incompatible with cls/suffix
    # tokens (the teacher/multi-task variants are small enough not to need
    # SP). See core/dist.py:seq_parallel_tokens.
    seq_axis: Optional[str] = None
    seq_shards: int = 1
    # w8a8 int8 MXU GEMMs for qkv/proj/fc1/fc2 — FROZEN-INFERENCE ONLY
    # (round() has zero gradient; see nn/quant.py). Opt-in, not the
    # parity path: quantization perturbs logits.
    int8_dense: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.seq_axis is not None:
            if self.use_cls_token or self.num_extra_suffix_tokens:
                raise NotImplementedError(
                    "sequence parallelism with cls/suffix tokens"
                )
            if self.use_learnable_pos_emb:
                raise NotImplementedError("learnable pos emb under seq parallelism")
        if self.input_norm:
            if x.dtype == jnp.uint8:
                x = x.astype(self.dtype) / 255.0
            mean = jnp.asarray([0.485, 0.456, 0.406], self.dtype)
            std = jnp.asarray([0.229, 0.224, 0.225], self.dtype)
            x = (x - mean) / std
        x = PatchEmbed3D(
            embed_dim=self.embed_dim,
            patch_size=self.patch_size,
            tubelet_size=self.tubelet_size,
            use_conv=self.patch_embed_conv,
            mode=self.patch_embed_mode,
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        B, num_patches, D = x.shape

        if self.seq_axis is not None:
            # this shard's slice of the full sinusoid table; blocks below
            # are shared with the single-chip path (seq_axis threads through)
            table = jnp.asarray(
                sinusoid_position_table(num_patches * self.seq_shards, D), self.dtype
            )
            start = jax.lax.axis_index(self.seq_axis) * num_patches
            pos = jax.lax.dynamic_slice_in_dim(table, start, num_patches, axis=0)
            x = x + jax.lax.stop_gradient(pos)[None]
            x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
            return self._blocks(x, deterministic)

        n_tokens = num_patches
        if self.use_cls_token:
            cls = self.param("cls_token", trunc02, (1, 1, D), jnp.float32)
            x = jnp.concatenate([jnp.tile(cls.astype(self.dtype), (B, 1, 1)), x], axis=1)
            n_tokens += 1
        if self.num_extra_suffix_tokens:
            extra = self.param(
                "suffix_tokens",
                trunc02,
                (1, self.num_extra_suffix_tokens, D),
                jnp.float32,
            )
            x = jnp.concatenate([x, jnp.tile(extra.astype(self.dtype), (B, 1, 1))], axis=1)
            n_tokens += self.num_extra_suffix_tokens

        if self.use_learnable_pos_emb:
            pos = self.param("pos_embed", trunc02, (1, n_tokens, D), jnp.float32)
            x = x + pos.astype(self.dtype)
        else:
            pos = sinusoid_position_table(n_tokens, D)
            x = x + jax.lax.stop_gradient(jnp.asarray(pos, self.dtype))[None]
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        return self._blocks(x, deterministic)

    def _blocks(self, x, deterministic):
        dpr = np.linspace(0.0, self.drop_path_rate, self.depth)
        block_cls = Block
        if self.remat:
            block_cls = nn.remat(Block, static_argnums=(2,))
        for i in range(self.depth):
            x = block_cls(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path_rate=float(dpr[i]),
                init_values=self.init_values,
                norm_eps=self.norm_eps,
                fused_attention=self.fused_attention,
                fused_interpret=self.fused_interpret,
                seq_axis=self.seq_axis,
                exact_gelu=self.exact_gelu,
                int8_dense=self.int8_dense,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, deterministic)
        if self.final_norm:
            x = FastLayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm")(x)
        return x
