"""Round-2 performance primitives keep exact semantics:

* FusedAdamW.fused_apply == its optax-compatible `update` + apply_updates
  == the original optax chain (scale_by_adam + scheduled wd + scheduled lr)
* FastLayerNorm == flax nn.LayerNorm (values and gradients)
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from devias_tpu.nn.vit import FastLayerNorm
from devias_tpu.train import OptimConfig, TrainState, make_optimizer
from devias_tpu.train.optim import (
    _add_scheduled_weight_decay,
    _scale_by_scheduled_lr,
    build_lr_scale_tree,
    build_wd_mask_tree,
)
from devias_tpu.core.schedules import cosine_schedule


def _toy_params(rng):
    return {
        "blocks_0": {"w": jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)),
                      "bias": jnp.asarray(rng.normal(size=(16,)).astype(np.float32))},
        "agg_block": {"w": jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))},
        "pos_embed": jnp.asarray(rng.normal(size=(1, 5, 8)).astype(np.float32)),
        "head": {"kernel": jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))},
    }


def test_fused_adamw_matches_optax_chain():
    rng = np.random.default_rng(0)
    params = _toy_params(rng)
    grads = jax.tree.map(lambda p: jnp.asarray(rng.normal(size=p.shape).astype(np.float32)), params)
    cfg = OptimConfig(lr=3e-4, weight_decay=0.05, layer_decay=0.75,
                      agg_block_scale=0.1, total_steps=20, warmup_steps=2)

    tx, lr_fn = make_optimizer(params, cfg)
    assert hasattr(tx, "fused_apply")

    # the reference chain (what make_optimizer built before round 2)
    wd_fn = cosine_schedule(cfg.weight_decay, cfg.weight_decay, cfg.total_steps, 0)
    chain = optax.chain(
        optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps),
        _add_scheduled_weight_decay(wd_fn, build_wd_mask_tree(params)),
        _scale_by_scheduled_lr(lr_fn, build_lr_scale_tree(params, cfg)),
    )

    p_f, s_f = params, tx.init(params)
    p_u, s_u = params, tx.init(params)
    p_c, s_c = params, chain.init(params)
    for step in range(3):
        p_f, s_f, gsq = tx.fused_apply(p_f, grads, s_f)
        u, s_u = tx.update(grads, s_u, p_u)
        p_u = optax.apply_updates(p_u, u)
        uc, s_c = chain.update(grads, s_c, p_c)
        p_c = optax.apply_updates(p_c, uc)

    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_c)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    gn = float(jnp.sqrt(gsq))
    ref = float(jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads))))
    np.testing.assert_allclose(gn, ref, rtol=1e-6)


def test_fused_adamw_clip_grad_falls_back_to_chain():
    params = _toy_params(np.random.default_rng(1))
    tx, _ = make_optimizer(params, OptimConfig(clip_grad=1.0, total_steps=10))
    assert not hasattr(tx, "fused_apply")  # optax chain


def test_fused_adamw_train_state_and_ema_path():
    """EMA tracking takes the generic path and still advances params."""
    from devias_tpu.train.step import _apply_optimizer

    params = _toy_params(np.random.default_rng(2))
    tx, _ = make_optimizer(params, OptimConfig(total_steps=10))
    grads = jax.tree.map(jnp.ones_like, params)
    state = TrainState.create(params, tx, use_ema=True)
    new_state, gnorm = _apply_optimizer(tx, state, grads)
    assert new_state.step == 1
    assert float(gnorm) > 0
    moved = [float(jnp.abs(a - b).max()) for a, b in
             zip(jax.tree.leaves(new_state.params), jax.tree.leaves(params))]
    assert max(moved) > 0
    assert new_state.ema_params is not None


def test_fast_layernorm_matches_flax():
    rng = np.random.default_rng(3)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.normal(size=(2, 7, 32)).astype(np.float32), dtype)
        ours = FastLayerNorm(epsilon=1e-6, dtype=dtype)
        ref = nn.LayerNorm(epsilon=1e-6, dtype=dtype)
        v = ref.init(jax.random.PRNGKey(0), x)
        v = jax.tree.map(
            lambda p: jnp.asarray(rng.normal(size=p.shape).astype(np.float32)), v
        )
        y_ours = ours.apply(v, x)
        y_ref = ref.apply(v, x)
        tol = 1e-6 if dtype == jnp.float32 else 5e-2  # bf16: 1-ulp rounding-path differences
        np.testing.assert_allclose(
            np.asarray(y_ours, np.float32), np.asarray(y_ref, np.float32),
            rtol=tol, atol=tol,
        )

        def loss(mod, vv, xx):
            return (mod.apply(vv, xx).astype(jnp.float32) ** 2).sum()

        g_ours = jax.grad(lambda vv, xx: loss(ours, vv, xx), argnums=(0, 1))(v, x)
        g_ref = jax.grad(lambda vv, xx: loss(ref, vv, xx), argnums=(0, 1))(v, x)
        for a, b in zip(jax.tree.leaves(g_ours), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=5e-2 if dtype == jnp.bfloat16 else 1e-5,
                atol=5e-2 if dtype == jnp.bfloat16 else 1e-5,
            )


def test_unsupported_opt_raises():
    import pytest

    params = _toy_params(np.random.default_rng(0))
    with pytest.raises(ValueError, match="not supported"):
        make_optimizer(params, OptimConfig(opt="lamb", total_steps=10))


def test_sgd_family_matches_torch():
    """--opt sgd/nesterov/momentum/adam run the torch.optim math
    (ref utils/optim_factory.py:124-134): L2 wd into the grad, momentum
    buffer, nesterov lookahead. 3 steps vs torch on the same toy tree,
    constant lr (no warmup), constant wd, layer_decay handled via the
    per-group lr scale."""
    import pytest

    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    base = _toy_params(rng)
    grads = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape).astype(np.float32)), base
    )

    for opt_name, t_kwargs in [
        ("sgd", dict(momentum=0.9, nesterov=True)),
        ("momentum", dict(momentum=0.9, nesterov=False)),
        ("adam", dict()),
    ]:
        cfg = OptimConfig(
            lr=1e-2, weight_decay=0.05, layer_decay=0.75, agg_block_scale=0.1,
            total_steps=100, warmup_steps=0, min_lr=1e-2,  # constant lr
            weight_decay_end=0.05, opt=opt_name, momentum=0.9,
        )
        tx, lr_fn = make_optimizer(base, cfg)
        scales = build_lr_scale_tree(base, cfg)
        wd_mask = build_wd_mask_tree(base)

        # torch side: one param group per leaf with its scaled lr / wd mask
        leaves, treedef = jax.tree.flatten(base)
        g_leaves = jax.tree.leaves(grads)
        s_leaves = jax.tree.leaves(scales)
        m_leaves = jax.tree.leaves(wd_mask)
        t_params = [torch.nn.Parameter(torch.from_numpy(np.asarray(p)).clone()) for p in leaves]
        groups = [
            {"params": [tp], "lr": 1e-2 * float(s), "weight_decay": 0.05 if m else 0.0}
            for tp, s, m in zip(t_params, s_leaves, m_leaves)
        ]
        if opt_name == "adam":
            topt = torch.optim.Adam(groups, eps=cfg.eps, betas=(cfg.beta1, cfg.beta2))
        else:
            topt = torch.optim.SGD(groups, **t_kwargs)

        p, s = base, tx.init(base)
        for _ in range(3):
            u, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, u)
            for tp, g in zip(t_params, g_leaves):
                tp.grad = torch.from_numpy(np.asarray(g)).clone()
            topt.step()

        for ours, theirs in zip(jax.tree.leaves(p), t_params):
            np.testing.assert_allclose(
                np.asarray(ours), theirs.detach().numpy(), rtol=2e-5, atol=2e-6,
                err_msg=opt_name,
            )
