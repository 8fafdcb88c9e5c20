"""Pallas kernel tests (interpreter mode on CPU): numerical parity of the
fused attention fwd/bwd against the pure-JAX reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from devias_tpu.kernels.attention import fused_attention, _pick_block


def _ref_attention(q, k, v, scale):
    s = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k).astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)


def test_pick_block():
    assert _pick_block(1568) == 224
    assert 1568 % _pick_block(1568) == 0
    assert _pick_block(128) == 128
    assert _pick_block(64) == 64
    assert _pick_block(8) == 8  # fallback: whole axis


@pytest.mark.parametrize("N,D,H", [(64, 16, 2), (96, 32, 4)])
def test_fused_attention_fwd_matches_reference(N, D, H):
    rng = np.random.default_rng(0)
    B = 2
    q = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    scale = D**-0.5
    out = fused_attention(q, k, v, scale, 32, True)  # interpret=True
    ref = _ref_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_attention_bwd_matches_reference():
    rng = np.random.default_rng(1)
    B, H, N, D = 1, 2, 64, 16
    q = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)
    scale = D**-0.5
    cot = jnp.asarray(rng.normal(size=(B, H, N, D)), jnp.float32)

    def f_fused(q, k, v):
        return (fused_attention(q, k, v, scale, 32, True) * cot).sum()

    def f_ref(q, k, v):
        return (_ref_attention(q, k, v, scale) * cot).sum()

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fused, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4, err_msg=name
        )


def test_fused_attention_in_model_matches_pure():
    """End-to-end: SlotViT with fused attention == pure attention."""
    from devias_tpu.nn import create_model

    kw = dict(
        num_classes=5, num_scene_classes=4, num_latents=2, agg_depth=2,
        depth=2, embed_dim=64, num_heads=4,
    )
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 4, 32, 32, 3)), jnp.float32)
    pure = create_model("slot_vit_base_patch16_224", **kw)
    fused = create_model(
        "slot_vit_base_patch16_224", fused_attention=True, fused_interpret=True, **kw
    )
    vs = pure.init({"params": jax.random.PRNGKey(0)}, x)
    out_pure = pure.apply(vs, x)
    out_fused = fused.apply(vs, x)
    np.testing.assert_allclose(
        np.asarray(out_fused["slots_head"]), np.asarray(out_pure["slots_head"]),
        rtol=1e-4, atol=1e-5,
    )


def test_fused_attention_grad_in_model():
    from devias_tpu.nn import create_model

    kw = dict(
        num_classes=5, num_scene_classes=4, num_latents=2, agg_depth=2,
        depth=2, embed_dim=64, num_heads=4,
    )
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 4, 32, 32, 3)), jnp.float32)
    pure = create_model("slot_vit_base_patch16_224", **kw)
    fused = create_model(
        "slot_vit_base_patch16_224", fused_attention=True, fused_interpret=True, **kw
    )
    vs = pure.init({"params": jax.random.PRNGKey(0)}, x)

    def loss(model, params):
        return (model.apply({"params": params}, x)["slots_head"] ** 2).sum()

    g_pure = jax.grad(lambda p: loss(pure, p))(vs["params"])
    g_fused = jax.grad(lambda p: loss(fused, p))(vs["params"])
    for a, b in zip(jax.tree.leaves(g_pure), jax.tree.leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)


def test_fused_slot_attention_matches_reference():
    from devias_tpu.kernels.slot_attention import (
        fused_slot_attention,
        slot_attention_reference,
    )

    rng = np.random.default_rng(4)
    B, S, N, D, heads, dh = 2, 2, 96, 32, 4, 16
    x = jnp.asarray(rng.normal(size=(B, S, D)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    wq = jnp.asarray(rng.normal(size=(D, heads * dh)) * 0.05, jnp.float32)
    wk = jnp.asarray(rng.normal(size=(D, heads * dh)) * 0.05, jnp.float32)
    wv = jnp.asarray(rng.normal(size=(D, heads * dh)) * 0.05, jnp.float32)
    wo = jnp.asarray(rng.normal(size=(heads * dh, D)) * 0.05, jnp.float32)
    bo = jnp.asarray(rng.normal(size=(D,)) * 0.05, jnp.float32)

    out_f, sim_f = fused_slot_attention(x, ctx, wq, wk, wv, wo, bo, heads, dh, 32, True)
    out_r, sim_r = slot_attention_reference(x, ctx, wq, wk, wv, wo, bo, heads, dh)
    np.testing.assert_allclose(np.asarray(sim_f), np.asarray(sim_r), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r), rtol=1e-4, atol=1e-5)

    # grads flow through the XLA-replay backward
    def loss_fused(x, wq):
        o, s = fused_slot_attention(x, ctx, wq, wk, wv, wo, bo, heads, dh, 32, True)
        return (o**2).sum() + (s**2).sum()

    def loss_ref(x, wq):
        o, s = slot_attention_reference(x, ctx, wq, wk, wv, wo, bo, heads, dh)
        return (o**2).sum() + (s**2).sum()

    g_f = jax.grad(loss_fused, argnums=(0, 1))(x, wq)
    g_r = jax.grad(loss_ref, argnums=(0, 1))(x, wq)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_slot_model_fused_agg_matches_pure():
    from devias_tpu.nn import create_model

    kw = dict(
        num_classes=5, num_scene_classes=4, num_latents=2, agg_depth=2,
        depth=2, embed_dim=64, num_heads=4,
    )
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 4, 32, 32, 3)), jnp.float32)
    pure = create_model("slot_vit_base_patch16_224", **kw)
    fused = create_model(
        "slot_vit_base_patch16_224", fused_attention=True, fused_interpret=True, **kw
    )
    vs = pure.init({"params": jax.random.PRNGKey(0)}, x)
    # identical param trees (checkpoint compatibility between modes)
    vs_fused = fused.init({"params": jax.random.PRNGKey(0)}, x)
    t1 = jax.tree_util.tree_structure(vs)
    t2 = jax.tree_util.tree_structure(vs_fused)
    assert t1 == t2
    out_pure = pure.apply(vs, x)
    out_fused = fused.apply(vs, x)
    np.testing.assert_allclose(
        np.asarray(out_fused["slots_head"]), np.asarray(out_pure["slots_head"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_fused["attn"]), np.asarray(out_pure["attn"]),
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.parametrize("N", [32, 9])  # 9: odd token count (CLS), teacher case
def test_fused_attention_qkv_matches_reference(N):
    """The transpose-free qkv-fused entry point: fwd and bwd vs pure einsum."""
    from devias_tpu.kernels.attention import fused_attention_qkv

    B, H, D = 2, 3, 8
    rng = np.random.default_rng(7)
    qkv = jnp.asarray(rng.normal(size=(B, N, 3 * H * D)), jnp.float32)
    scale = D**-0.5
    cot = jnp.asarray(rng.normal(size=(B, N, H * D)), jnp.float32)

    def ref(qkv):
        q, k, v = [
            qkv[..., i * H * D : (i + 1) * H * D].reshape(B, N, H, D)
            for i in range(3)
        ]
        s = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhnm,bmhd->bnhd", p, v).reshape(B, N, H * D)

    out = fused_attention_qkv(qkv, H, scale, None, True)  # interpret
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(qkv)), rtol=2e-5, atol=2e-5)

    g = jax.grad(lambda x: (fused_attention_qkv(x, H, scale, None, True) * cot).sum())(qkv)
    g_ref = jax.grad(lambda x: (ref(x) * cot).sum())(qkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=2e-4, atol=2e-4)


def test_vmem_block_and_stats_width():
    from devias_tpu.kernels.attention import _stats_width, _vmem_block

    # flagship geometry: caps leave tuned picks untouched
    assert _vmem_block(1568, 784, 2.5) == 784
    assert _vmem_block(1568, 1568, 3.5) == 1568
    # long sequences shrink the q block instead of overflowing VMEM
    assert _vmem_block(9216, 784, 2.5) == 384
    assert _vmem_block(9216, 1568, 3.5) == 288
    # no 16-multiple divisor under the cap -> loud error, not an OOM
    with pytest.raises(ValueError, match="no 16-multiple divisor"):
        _vmem_block(9000, 784, 2.5)  # 9000 = 2^3*3^2*5^3: max 2-power is 8
    # stats lanes follow the head grouping (hpb=8 at head_dim 16)
    assert _stats_width(2) == 8
    assert _stats_width(8) == 16
