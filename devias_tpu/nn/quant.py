"""w8a8 int8 dense layers for frozen-model inference (opt-in).

TPU v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 vs 197
TOPS). The frozen scene teacher (a full ViT-B forward per train step, ref
engine_for_slot.py:52-54) and the deterministic eval/serving forward are
pure inference — their big GEMMs (qkv, attn proj, fc1, fc2) can run int8
with dynamic per-row activation scales and per-output-channel weight
scales. This is NOT the parity path: quantization perturbs logits (bounded,
see tests/test_quant.py), so it is opt-in via `--teacher_int8` /
`int8_dense=True` and never used by the golden/parity tests.

Measured in-step (docs/PERF.md round-3 rejected experiments): at ViT-B
1568-token geometry the int8 teacher is throughput-NEUTRAL inside the
training step — the per-step dynamic-quant passes and the broken
mega-fusions cancel the 2x MXU rate. Its remaining use case is frozen
serving with weights quantized once ahead of time.

Design notes (TPU-first):
  * weights are quantized from the live f32 params inside the jitted step
    (cheap: one elementwise pass over ~85 MB of weights, ~0.2 ms) — the
    param pytree stays IDENTICAL to the bf16 model, so torch-checkpoint
    import, orbax save/resume, and every existing test keep working.
  * activation scales are per-row (amax over the feature axis): one VPU
    pass per GEMM input, no calibration data needed.
  * the int32 accumulator is rescaled as f32 * s_x[row] * s_w[col] — both
    scale applications fuse into the dequant epilogue under XLA.
  * round() has zero gradient, which is correct here: these layers serve
    frozen params only (the teacher never receives gradients; training the
    student through int8 would silently zero its updates — don't).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def int8_dot(x: jax.Array, w: jax.Array) -> jax.Array:
    """[..., K] @ [K, M] as int8 x int8 -> int32 on the MXU, dequantized to
    f32. Dynamic symmetric quantization: per-row scales for x (amax over
    K), per-column scales for w."""
    xf = x.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    sw = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0  # [1, M]
    sw = jnp.maximum(sw, 1e-12)
    wq = jnp.round(wf / sw).astype(jnp.int8)
    sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0  # [..., 1]
    sx = jnp.maximum(sx, 1e-12)
    xq = jnp.round(xf / sx).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq,
        (((xf.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * sx * sw


class Int8Dense(nn.Module):
    """Drop-in for nn.Dense with int8 MXU matmuls.

    Same param names ('kernel', 'bias'), shapes, dtypes, and init as
    nn.Dense — a params pytree initialized or loaded for one works for the
    other unchanged."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features), jnp.float32
        )
        y = int8_dot(x, kernel)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            y = y + bias
        return y.astype(self.dtype)
