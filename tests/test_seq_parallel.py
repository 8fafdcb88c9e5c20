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
