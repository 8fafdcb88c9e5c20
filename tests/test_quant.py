"""int8 w8a8 inference path (nn/quant.py) — frozen teacher / serving opt-in.

Checks the quantized GEMMs are (a) drop-in param-compatible with the bf16
path and (b) numerically bounded, so the opt-in `--teacher_int8` /
`int8_dense=True` flag can be reasoned about: it perturbs teacher logits
by a measured, small amount rather than an unknown one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from devias_tpu.nn import create_model
from devias_tpu.nn.quant import Int8Dense, int8_dot

import flax.linen as nn


def test_int8_dot_close_to_f32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 64, 96)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(96, 128)) * 0.05, jnp.float32)
    ref = x @ w
    q = int8_dot(x, w)
    # per-row/per-col symmetric int8: worst-case relative error ~1/127 per
    # operand; allow 3% relative on the matmul output scale
    err = np.abs(np.asarray(q - ref)).max()
    scale = np.abs(np.asarray(ref)).max()
    assert err < 0.03 * scale, (err, scale)


def test_int8_dense_param_compatible():
    x = jnp.ones((2, 16), jnp.float32)
    d = nn.Dense(24)
    q = Int8Dense(24)
    pd = d.init(jax.random.PRNGKey(0), x)["params"]
    pq = q.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(pd) == jax.tree_util.tree_structure(pq)
    for a, b in zip(jax.tree.leaves(pd), jax.tree.leaves(pq)):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # one params pytree serves both layers
    out_d = d.apply({"params": pd}, x)
    out_q = q.apply({"params": pd}, x)
    assert out_q.shape == out_d.shape
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_d), atol=0.05)


@pytest.mark.parametrize("name,kwargs", [
    ("vit_base_patch16_224", dict(num_classes=7, use_mean_pooling=False)),
    ("slot_vit_base_patch16_224",
     dict(num_classes=7, num_scene_classes=5, num_latents=2, agg_depth=2)),
])
def test_int8_model_matches_f32_model(name, kwargs):
    tiny = dict(depth=2, embed_dim=64, num_heads=4)
    m32 = create_model(name, **kwargs, **tiny)
    m8 = create_model(name, **kwargs, **tiny, int8_dense=True)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 4, 32, 32, 3)), jnp.float32
    )
    params = m32.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    # identical param pytree: the int8 model consumes the f32 model's params
    p8 = m8.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p8)

    out32 = m32.apply({"params": params}, x, deterministic=True)
    out8 = m8.apply({"params": params}, x, deterministic=True)
    key = "logits" if "logits" in out32 else "action_logit"
    a = np.asarray(out32[key], np.float32)
    b = np.asarray(out8[key], np.float32)
    assert np.isfinite(b).all()
    # quantization noise accumulates over the depth; bound it relative to
    # the logit dynamic range
    rng_scale = np.abs(a).max() + 1e-6
    assert np.abs(a - b).max() < 0.15 * rng_scale, np.abs(a - b).max()
    # cosine similarity of the logit vectors stays high
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > 0.99, cos


def test_int8_teacher_argmax_agreement():
    """Pseudo-label (argmax) agreement between the bf16 and int8 teacher on
    random inputs with a structured head. With random near-uniform logits
    agreement is not meaningful, so sharpen the head weights first."""
    tiny = dict(depth=2, embed_dim=64, num_heads=4)
    m32 = create_model("vit_base_patch16_224", num_classes=16,
                       use_mean_pooling=False, **tiny)
    m8 = create_model("vit_base_patch16_224", num_classes=16,
                      use_mean_pooling=False, int8_dense=True, **tiny)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(8, 4, 32, 32, 3)), jnp.float32)
    params = m32.init({"params": jax.random.PRNGKey(3)}, x)["params"]
    params = jax.tree_util.tree_map_with_path(
        lambda kp, v: v * 20.0 if "head" in jax.tree_util.keystr(kp) else v, params
    )
    a = np.asarray(m32.apply({"params": params}, x, deterministic=True)["logits"])
    b = np.asarray(m8.apply({"params": params}, x, deterministic=True)["logits"])
    agree = (a.argmax(-1) == b.argmax(-1)).mean()
    assert agree >= 0.75, agree
