"""Pipeline parallelism for the video ViT backbone (beyond reference
parity — the reference is DP-only, SURVEY §2.8).

On the 8-virtual-device CPU mesh: split the block stack into pipe stages,
stream microbatches through a GPipe schedule (one lax.scan of ticks with
ppermute shifts — core/pipeline.py), and check tokens and gradients match
the unsharded model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from devias_tpu.core.pipeline import PIPE_AXIS, make_pp_mesh, pipeline_tokens
from devias_tpu.nn.vit import VideoViT

TINY = dict(embed_dim=64, depth=4, num_heads=4, patch_size=16, tubelet_size=2)
B, T, HW = 8, 4, 32


def _videos():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(B, T, HW, HW, 3)).astype(np.float32))


@pytest.mark.parametrize("data,pipe,n_micro", [(2, 4, 4), (4, 2, 2), (1, 8, None)])
def test_pp_tokens_match_unsharded(data, pipe, n_micro):
    if n_micro is None:
        # depth 8 for the 8-stage case
        tiny = dict(TINY, depth=8)
        n_micro = 4
    else:
        tiny = TINY
    mesh = make_pp_mesh(pipe)
    assert mesh.shape["data"] == data
    assert mesh.shape[PIPE_AXIS] == pipe

    ref = VideoViT(**tiny)
    videos = _videos()
    params = ref.init({"params": jax.random.PRNGKey(0)}, videos)["params"]

    tok_ref = ref.apply({"params": params}, videos)
    tok_pp = pipeline_tokens(ref, params, videos, mesh, n_micro=n_micro)
    np.testing.assert_allclose(
        np.asarray(tok_pp), np.asarray(tok_ref), rtol=2e-5, atol=2e-5
    )


def test_pp_grads_match_unsharded():
    mesh = make_pp_mesh(4)
    ref = VideoViT(**TINY)
    videos = _videos()
    params = ref.init({"params": jax.random.PRNGKey(1)}, videos)["params"]
    w = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 1, TINY["embed_dim"]))
    ).astype(jnp.float32)

    def loss_ref(p, v):
        return (ref.apply({"params": p}, v) * w).mean()

    def loss_pp(p, v):
        return (pipeline_tokens(ref, p, v, mesh, n_micro=4) * w).mean()

    l_r, g_r = jax.value_and_grad(loss_ref)(params, videos)
    l_p, g_p = jax.value_and_grad(loss_pp)(params, videos)
    np.testing.assert_allclose(float(l_p), float(l_r), rtol=1e-5)
    flat_r = jax.tree_util.tree_leaves_with_path(g_r)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(g_p))
    for path, leaf in flat_r:
        np.testing.assert_allclose(
            np.asarray(flat_p[path]), np.asarray(leaf), rtol=5e-5, atol=5e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_pp_validation_errors():
    mesh = make_pp_mesh(4)
    ref = VideoViT(**dict(TINY, depth=6))  # 6 % 4 != 0
    videos = _videos()
    params = ref.init({"params": jax.random.PRNGKey(0)}, videos)["params"]
    with pytest.raises(ValueError, match="not divisible by pipe"):
        pipeline_tokens(ref, params, videos, mesh, n_micro=4)
    with pytest.raises(ValueError, match="requires rng"):
        pipeline_tokens(
            VideoViT(**TINY), params, videos, mesh, n_micro=4, deterministic=False
        )


def test_pp_stochastic_trains():
    """deterministic=False: dropout + the linspace drop_path schedule run
    inside the pipe (rng folded by data shard / global block / microbatch —
    core/pipeline.py docstring). Checks: finite loss + grads; a zero-rate
    stochastic pass equals the deterministic pass exactly (the rng plumbing
    itself must not perturb the math); two different keys give different
    losses; the same key reproduces."""
    mesh = make_pp_mesh(4)
    videos = _videos()
    sto = VideoViT(**{**TINY, "drop_rate": 0.1, "drop_path_rate": 0.2})
    zero = VideoViT(**TINY)
    params = zero.init({"params": jax.random.PRNGKey(0)}, videos)["params"]

    def loss(model, p, v, key, det=False):
        toks = pipeline_tokens(
            model, p, v, mesh, n_micro=4, deterministic=det, rng=key
        )
        return (toks.astype(jnp.float32) ** 2).mean()

    with mesh:
        # rng plumbing is a no-op at rate 0
        l_det = float(jax.jit(lambda p, v: loss(zero, p, v, None, det=True))(params, videos))
        l_zero = float(
            jax.jit(lambda p, v, k: loss(zero, p, v, k))(
                params, videos, jax.random.PRNGKey(1)
            )
        )
        assert l_zero == pytest.approx(l_det, rel=1e-6)

        f = jax.jit(jax.value_and_grad(lambda p, v, k: loss(sto, p, v, k)))
        l1, g1 = f(params, videos, jax.random.PRNGKey(1))
        l1b, _ = f(params, videos, jax.random.PRNGKey(1))
        l2, _ = f(params, videos, jax.random.PRNGKey(2))
    assert np.isfinite(float(l1))
    assert float(l1) == float(l1b), "same key must reproduce"
    assert float(l1) != float(l2), "different keys must differ"
    for path, leaf in jax.tree_util.tree_leaves_with_path(g1):
        assert np.isfinite(np.asarray(leaf)).all(), jax.tree_util.keystr(path)
