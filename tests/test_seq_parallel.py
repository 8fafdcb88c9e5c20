"""Sequence parallelism for the video ViT backbone (beyond reference
parity — SURVEY §2.8 lists SP as absent upstream).

On the 8-virtual-device CPU mesh: shard the frame axis over a `seq` mesh
axis, run the backbone under shard_map (attention all_gathers K/V), and
check tokens and parameter gradients match the unsharded model exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from devias_tpu.core.dist import SEQ_AXIS, make_sp_mesh, seq_parallel_tokens
from devias_tpu.nn.vit import VideoViT

TINY = dict(embed_dim=64, depth=2, num_heads=4, patch_size=16, tubelet_size=2)
B, T, HW = 2, 16, 32


def _videos():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(B, T, HW, HW, 3)).astype(np.float32))


@pytest.mark.parametrize("data,seq", [(1, 8), (2, 4)])
def test_sp_tokens_match_unsharded(data, seq):
    mesh = make_sp_mesh(seq)
    assert mesh.shape["data"] == data

    ref = VideoViT(**TINY)
    sp = VideoViT(**TINY, seq_axis=SEQ_AXIS, seq_shards=seq)
    videos = _videos()
    params = ref.init({"params": jax.random.PRNGKey(0)}, videos)["params"]

    tok_ref = ref.apply({"params": params}, videos)
    tok_sp = seq_parallel_tokens(sp, params, videos, mesh)
    np.testing.assert_allclose(
        np.asarray(tok_sp), np.asarray(tok_ref), rtol=2e-5, atol=2e-5
    )


def test_sp_grads_match_unsharded():
    seq = 4
    mesh = make_sp_mesh(seq)
    ref = VideoViT(**TINY)
    sp = VideoViT(**TINY, seq_axis=SEQ_AXIS, seq_shards=seq)
    videos = _videos()
    params = ref.init({"params": jax.random.PRNGKey(1)}, videos)["params"]

    def loss_ref(p):
        return (ref.apply({"params": p}, videos).astype(jnp.float32) ** 2).sum()

    def loss_sp(p):
        return (
            seq_parallel_tokens(sp, p, videos, mesh).astype(jnp.float32) ** 2
        ).sum()

    g_ref = jax.grad(loss_ref)(params)
    g_sp = jax.jit(jax.grad(loss_sp))(params)
    for a, b in zip(jax.tree.leaves(g_sp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4
        )


def test_sp_fused_kernel_path_matches():
    """The Pallas q/kv-split kernel (interpret mode) under shard_map."""
    seq = 4
    mesh = make_sp_mesh(seq)
    ref = VideoViT(**TINY)
    sp = VideoViT(
        **TINY, seq_axis=SEQ_AXIS, seq_shards=seq,
        fused_attention=True, fused_interpret=True,
    )
    videos = _videos()
    params = ref.init({"params": jax.random.PRNGKey(2)}, videos)["params"]
    tok_ref = ref.apply({"params": params}, videos)
    tok_sp = seq_parallel_tokens(sp, params, videos, mesh)
    np.testing.assert_allclose(
        np.asarray(tok_sp), np.asarray(tok_ref), rtol=2e-5, atol=2e-5
    )


def test_sp_rejects_cls_token_and_bad_shards():
    mesh = make_sp_mesh(8)
    bad = VideoViT(**TINY, seq_axis=SEQ_AXIS, seq_shards=8, use_cls_token=True)
    videos = _videos()
    with pytest.raises(NotImplementedError):
        seq_parallel_tokens(bad, {}, videos, mesh)
    sp = VideoViT(**TINY, seq_axis=SEQ_AXIS, seq_shards=8)
    with pytest.raises(ValueError):
        # 12 frames not divisible by 8 shards x tubelet 2
        seq_parallel_tokens(sp, {}, videos[:, :12], mesh)


def test_sp_stochastic_requires_rng():
    mesh = make_sp_mesh(4)
    sp = VideoViT(**TINY, seq_axis=SEQ_AXIS, seq_shards=4)
    with pytest.raises(ValueError, match="requires rng"):
        seq_parallel_tokens(sp, {}, _videos(), mesh, deterministic=False)


def test_sp_drop_path_consistent_across_token_shards():
    """Per-sample drop_path decisions must agree on every token shard of a
    sample: the sharded run must equal an unsharded run whose drop_path
    stream is the same per-data-shard folded key (VERDICT r2 item 7)."""
    seq = 4
    mesh = make_sp_mesh(seq)  # data axis = 2
    cfg = dict(TINY, drop_path_rate=0.7)
    ref = VideoViT(**cfg)
    sp = VideoViT(**cfg, seq_axis=SEQ_AXIS, seq_shards=seq)
    videos = _videos()
    params = ref.init({"params": jax.random.PRNGKey(0)}, videos)["params"]

    key = jax.random.PRNGKey(5)
    tok_sp = seq_parallel_tokens(
        sp, params, videos, mesh, deterministic=False, rng=key
    )

    # reproduce per-data-shard folding on the unsharded model (data=2)
    _, dp_key = jax.random.split(key)
    outs = []
    b_local = videos.shape[0] // mesh.shape["data"]
    for di in range(mesh.shape["data"]):
        v = videos[di * b_local : (di + 1) * b_local]
        outs.append(
            ref.apply(
                {"params": params}, v, False,
                rngs={"drop_path": jax.random.fold_in(dp_key, di)},
            )
        )
    tok_ref = jnp.concatenate(outs, axis=0)
    np.testing.assert_allclose(
        np.asarray(tok_sp), np.asarray(tok_ref), rtol=2e-5, atol=2e-5
    )


def test_sp_dropout_masks_differ_per_shard_and_match_expectation():
    """Token-level dropout must draw a different mask on every token shard
    (a shared stream would repeat the pattern), and the stochastic SP run
    must stay finite and differ between keys."""
    seq = 4
    mesh = make_sp_mesh(seq)
    cfg = dict(TINY, depth=1, drop_rate=0.5)
    sp = VideoViT(**cfg, seq_axis=SEQ_AXIS, seq_shards=seq)
    ref = VideoViT(**cfg)
    videos = _videos()
    params = ref.init({"params": jax.random.PRNGKey(0)}, videos)["params"]

    tok = np.asarray(
        seq_parallel_tokens(
            sp, params, videos, mesh, deterministic=False,
            rng=jax.random.PRNGKey(1),
        )
    )
    assert np.isfinite(tok).all()
    # shard-block token patterns must differ between shards: compare the
    # dropout-mask fingerprint (zeros pattern of the pos_drop output ripple)
    # via pairwise shard-block differences on a sample
    N = tok.shape[1]
    blocks = tok[:, : N // seq], tok[:, N // seq : 2 * (N // seq)]
    assert not np.allclose(blocks[0], blocks[1])
    # different keys -> different draws
    tok2 = np.asarray(
        seq_parallel_tokens(
            sp, params, videos, mesh, deterministic=False,
            rng=jax.random.PRNGKey(2),
        )
    )
    assert not np.allclose(tok, tok2)


def test_sp_stochastic_grads_finite():
    """A full stochastic SP backward (dropout 0.1 + drop_path 0.2, the
    published UCF recipe's regularization, docs/TRAIN.md:118)."""
    seq = 4
    mesh = make_sp_mesh(seq)
    cfg = dict(TINY, drop_rate=0.1, drop_path_rate=0.2)
    sp = VideoViT(**cfg, seq_axis=SEQ_AXIS, seq_shards=seq)
    videos = _videos()
    # init with the unsharded twin (axis_index is unbound outside shard_map)
    params = VideoViT(**cfg).init({"params": jax.random.PRNGKey(0)}, videos)["params"]

    def loss(p):
        t = seq_parallel_tokens(
            sp, p, videos, mesh, deterministic=False, rng=jax.random.PRNGKey(3)
        )
        return (t.astype(jnp.float32) ** 2).mean()

    g = jax.jit(jax.grad(loss))(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
