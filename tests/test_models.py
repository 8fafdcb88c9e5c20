"""Shape/semantics tests for the four model families."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from devias_tpu.nn import create_model

TINY = dict(depth=2, embed_dim=64, num_heads=4)


def _video(b=2, t=4, hw=32):
    return jnp.asarray(np.random.default_rng(0).normal(size=(b, t, hw, hw, 3)), jnp.float32)


def test_slot_vit_shapes():
    m = create_model(
        "slot_vit_base_patch16_224",
        num_classes=10, num_scene_classes=5, num_latents=2, agg_depth=2, **TINY,
    )
    x = _video()
    vs = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(vs, x)
    n_tokens = (4 // 2) * (32 // 16) ** 2
    assert out["slots"].shape == (2, 2, 64)
    assert out["slots_head"].shape == (2, 2, 15)
    assert out["mask_predictions"].shape == (2, 2, (32 // 16) ** 2)
    assert out["attn"].shape == (2, 4, 2, n_tokens)
    assert out["action_feat"].shape == (2, 64)
    assert out["action_logit"].shape == (2, 15)


def test_slot_selection_consistency():
    """Selected feats/logits must equal the slot at the argmax index
    (ref modeling_slot.py:395-406)."""
    m = create_model(
        "slot_vit_base_patch16_224",
        num_classes=10, num_scene_classes=5, num_latents=3, agg_depth=2, **TINY,
    )
    x = _video()
    vs = m.init({"params": jax.random.PRNGKey(1)}, x)
    out = m.apply(vs, x)
    probs = jax.nn.softmax(out["slots_head"], axis=-1)
    a_idx = jnp.argmax(probs[..., :10].max(-1), axis=1)
    np.testing.assert_array_equal(out["action_idx"], a_idx)
    for b in range(2):
        np.testing.assert_allclose(
            out["action_feat"][b], out["slots"][b, a_idx[b]], rtol=1e-6
        )


def test_hard_select_mode():
    m = create_model(
        "slot_vit_base_patch16_224",
        num_classes=10, num_scene_classes=5, num_latents=2, agg_depth=2,
        slot_matching_method="hard_select", **TINY,
    )
    x = _video()
    vs = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(vs, x)
    np.testing.assert_allclose(out["action_feat"], out["slots"][:, 0])
    np.testing.assert_allclose(out["scene_feat"], out["slots"][:, 1])


def test_plain_vit_mean_pool_vs_cls():
    x = _video()
    for pool in (True, False):
        m = create_model("vit_base_patch16_224", num_classes=10, use_mean_pooling=pool, **TINY)
        vs = m.init({"params": jax.random.PRNGKey(0)}, x)
        out = m.apply(vs, x)
        assert out["token"].shape == (2, 64)
        assert out["logits"].shape == (2, 10)
    # cls variant must actually create a cls token param
    assert "cls_token" in vs["params"]["backbone"]


def test_multi_task_heads():
    x = _video()
    m = create_model("disentangle_vit_base_patch16_224", num_classes=10, num_scene_classes=5, **TINY)
    vs = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(vs, x)
    assert out["action_logit"].shape == (2, 10)
    assert out["scene_logit"].shape == (2, 5)
    m2 = create_model(
        "disentangle_vit_base_patch16_224",
        num_classes=10, num_scene_classes=5, unified_head=True, **TINY,
    )
    vs2 = m2.init({"params": jax.random.PRNGKey(0)}, x)
    out2 = m2.apply(vs2, x)
    assert out2["action_logit"].shape == (2, 15)
    assert out2["scene_logit"].shape == (2, 15)


def test_slot_fusion_concat_and_gap():
    x = _video()
    m = create_model(
        "slot_fusion_vit_base_patch16_224",
        num_classes=10, num_scene_classes=5, downstream_nb_classes=7, agg_depth=2, **TINY,
    )
    vs = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(vs, x)
    assert out["logits"].shape == (2, 7)
    assert out["feat"].shape == (2, 128)

    g = create_model(
        "slot_fusion_vit_base_patch16_224",
        num_classes=10, num_scene_classes=5, downstream_nb_classes=7,
        slot_fusion_method="gap", agg_depth=2, **TINY,
    )
    vsg = g.init({"params": jax.random.PRNGKey(0)}, x)
    outg = g.apply(vsg, x)
    assert outg["logits"].shape == (2, 7)


def test_agg_weight_tying_param_count():
    from devias_tpu.nn import AggregationBlock

    ctx = jnp.zeros((1, 8, 64))
    tied = AggregationBlock(num_latents=2, latent_dim=64, depth=4, weight_tie=True)
    untied = AggregationBlock(num_latents=2, latent_dim=64, depth=4, weight_tie=False)
    n_tied = sum(p.size for p in jax.tree.leaves(tied.init(jax.random.PRNGKey(0), ctx)))
    n_untied = sum(p.size for p in jax.tree.leaves(untied.init(jax.random.PRNGKey(0), ctx)))
    assert n_untied > n_tied * 2


def test_droppath_train_vs_eval():
    m = create_model(
        "vit_base_patch16_224", num_classes=10, drop_path_rate=0.5, **TINY
    )
    x = _video()
    vs = m.init({"params": jax.random.PRNGKey(0)}, x)
    out_eval = m.apply(vs, x, deterministic=True)
    out_eval2 = m.apply(vs, x, deterministic=True)
    np.testing.assert_allclose(out_eval["logits"], out_eval2["logits"])
    out_train = m.apply(
        vs, x, deterministic=False,
        rngs={"drop_path": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
    )
    assert not np.allclose(out_train["logits"], out_eval["logits"])


def test_slot_round_custom_vjp_matches_autodiff():
    """The hand-written slot_round backward (agg.py) must equal plain
    autodiff of the same math — including the sim_distill cotangent path
    the last round's distill loss feeds (ref train_loss.py:94-97)."""
    import jax
    import jax.numpy as jnp

    from devias_tpu.nn.agg import _slot_round_fwd_math, slot_round

    B, S, N, h, dh, D = 2, 3, 40, 4, 16, 32
    rng = np.random.default_rng(0)
    args = (
        jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(B, N, h, dh)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(B, N, h, dh)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(D, h * dh)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(h * dh, D)).astype(np.float32) * 0.1),
        jnp.asarray(rng.normal(size=(D,)).astype(np.float32)),
    )
    scale = dh**-0.5
    w_out = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    w_p = jnp.asarray(rng.normal(size=(B, h, S, N)).astype(np.float32))

    def loss_custom(*a):
        out, P = slot_round(*a, scale, h, dh)
        return (out * w_out).sum() + (P * w_p).sum()

    def loss_auto(*a):
        out, P, _, _, _ = _slot_round_fwd_math(*a, scale, h, dh)
        return (out * w_out).sum() + (P * w_p).sum()

    g_c = jax.grad(loss_custom, argnums=tuple(range(6)))(*args)
    g_a = jax.grad(loss_auto, argnums=tuple(range(6)))(*args)
    for i, (a, b) in enumerate(zip(g_c, g_a)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5,
            err_msg=f"grad arg {i}",
        )


def test_tied_stack_matches_per_round_loop():
    """tied_agg_stack (one custom VJP over all rounds, stacked dK/dV
    reduction) must equal the per-round loop in outputs AND gradients,
    including the last-round sim cotangent."""
    import jax
    import jax.numpy as jnp

    from devias_tpu.nn.agg import TORCH_LN_EPS, _round_fwd, tied_agg_stack

    B, S, N, h, dh, D, T = 2, 2, 48, 4, 16, 32, 3
    rng = np.random.default_rng(3)
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.2)
    x = f(B, S, D)
    k = f(B, N, h, dh)
    v = f(B, N, h, dh)
    w = (
        jnp.ones(D), f(D), f(D, h * dh), f(h * dh, D), f(D),
        jnp.ones(D), f(D), f(D, 4 * D), f(4 * D), f(4 * D, D), f(D),
    )
    w_out = f(B, S, D)
    w_p = f(B, h, S, N)
    scale = dh**-0.5

    def loop_ref(x, k, v, w):
        P = None
        for _ in range(T):
            x, P, _ = _round_fwd(x, k, v, w, scale, h, dh, TORCH_LN_EPS)
        return x, P

    def loss(fn, x, k, v, w):
        out, P = fn(x, k, v, w)
        return (out * w_out).sum() + (P * w_p).sum()

    stacked = lambda x, k, v, w: tied_agg_stack(x, k, v, T, h, dh, TORCH_LN_EPS, w)
    o_s = stacked(x, k, v, w)
    o_r = loop_ref(x, k, v, w)
    np.testing.assert_allclose(np.asarray(o_s[0]), np.asarray(o_r[0]), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(o_s[1]), np.asarray(o_r[1]), rtol=2e-5, atol=2e-5)

    g_s = jax.grad(lambda *a: loss(stacked, *a), argnums=(0, 1, 2, 3))(x, k, v, w)
    g_r = jax.grad(lambda *a: loss(loop_ref, *a), argnums=(0, 1, 2, 3))(x, k, v, w)
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4
        )


def test_tied_stack_kv_fused_matches_explicit_projection():
    """tied_agg_stack_kv (K/V projections inside the VJP, factored
    d_wk/d_wv/d_ctx — dK/dV never materialized) must equal autodiff of the
    explicit ctx@wk / ctx@wv projection followed by the per-round loop, in
    outputs and in every gradient (ctx_k, ctx_v, wk, wv, x, round weights)."""
    import jax
    import jax.numpy as jnp

    from devias_tpu.nn.agg import (
        TORCH_LN_EPS, _round_fwd, tied_agg_stack_kv,
    )

    B, S, N, h, dh, D, T = 2, 2, 48, 4, 16, 32, 3
    inner = h * dh
    rng = np.random.default_rng(7)
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.2)
    x = f(B, S, D)
    ctx_k = f(B, N, D)
    ctx_v = f(B, N, D)
    wk = f(D, inner)
    wv = f(D, inner)
    w = (
        jnp.ones(D), f(D), f(D, inner), f(inner, D), f(D),
        jnp.ones(D), f(D), f(D, 4 * D), f(4 * D), f(4 * D, D), f(D),
    )
    w_out = f(B, S, D)
    w_p = f(B, h, S, N)
    scale = dh**-0.5

    def loop_ref(x, ctx_k, ctx_v, wk, wv, w):
        k = (ctx_k @ wk).reshape(B, N, h, dh)
        v = (ctx_v @ wv).reshape(B, N, h, dh)
        P = None
        for _ in range(T):
            x, P, _ = _round_fwd(x, k, v, w, scale, h, dh, TORCH_LN_EPS)
        return x, P

    def fused(x, ctx_k, ctx_v, wk, wv, w):
        return tied_agg_stack_kv(x, ctx_k, ctx_v, T, h, dh, TORCH_LN_EPS, wk, wv, w)

    def loss(fn, *a):
        out, P = fn(*a)
        return (out * w_out).sum() + (P * w_p).sum()

    args = (x, ctx_k, ctx_v, wk, wv, w)
    o_f = fused(*args)
    o_r = loop_ref(*args)
    np.testing.assert_allclose(np.asarray(o_f[0]), np.asarray(o_r[0]), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(o_f[1]), np.asarray(o_r[1]), rtol=2e-5, atol=2e-5)

    g_f = jax.grad(lambda *a: loss(fused, *a), argnums=tuple(range(6)))(*args)
    g_r = jax.grad(lambda *a: loss(loop_ref, *a), argnums=tuple(range(6)))(*args)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4
        )
