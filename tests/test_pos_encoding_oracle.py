"""Aggregation-block positional encodings vs the actual reference
implementation (ref agg_block/pos_encoding.py — torch+einops, importable).

Every published DEVIAS config uses pos_enc_type='none' (ref
agg_block/agg_block.py:21), so these builders are capability-parity
surface; this pins them anyway since they feed the context KEYS when
enabled (ref agg_block/attention.py:125).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("einops")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from _ref_oracle import load_reference  # noqa: E402
from devias_tpu.nn.pos_encoding import (  # noqa: E402
    Learned1D,
    Learned2D,
    sine_1d,
    sine_2d,
)

load_reference()

from agg_block import pos_encoding as ref_pe  # noqa: E402


def test_sine_1d_matches_reference():
    n, dim = 24, 32
    # build_position_encoding('sine', axis=1) -> Sine1D(dim, normalize=True)
    ref_mod = ref_pe.PositionEmbeddingSine1D(dim, normalize=True)
    ref = ref_mod(torch.zeros(1, n, 7)).numpy()[0]  # [n, dim]
    ours = sine_1d(n, dim)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_sine_2d_matches_reference():
    h, w, dim = 6, 8, 64
    # build_position_encoding 2D passes N_steps = dim // 2 per axis
    ref_mod = ref_pe.PositionEmbeddingSine2D(dim // 2, normalize=True)
    ref = ref_mod(torch.zeros(1, h, w, 7)).numpy()[0]  # [(h w), dim]
    ours = sine_2d(h, w, dim)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_learned_2d_matches_reference_layout():
    """Channel order: the reference concatenates the COLUMN (x) embedding
    first (ref pos_encoding.py:91-99). Copy one table into both and compare."""
    h, w, dim = 5, 7, 16
    ref_mod = ref_pe.PositionEmbeddingLearned2D(dim // 2)
    ref = ref_mod(torch.zeros(1, h, w, 3)).detach().numpy()[0]

    ours_mod = Learned2D(max_hw=50)
    params = ours_mod.init(jax.random.PRNGKey(0), h, w, dim)
    params = {
        "params": {
            "row_embed": jnp.asarray(ref_mod.row_embed.weight.detach().numpy()),
            "col_embed": jnp.asarray(ref_mod.col_embed.weight.detach().numpy()),
        }
    }
    ours = np.asarray(ours_mod.apply(params, h, w, dim))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


def test_learned_1d_matches_reference_layout():
    n, dim = 9, 12
    ref_mod = ref_pe.PositionEmbeddingLearned1D(dim)
    ref = ref_mod(torch.zeros(1, n, 3)).detach().numpy()[0]
    ours_mod = Learned1D(max_len=100)
    params = {"params": {"embed": jnp.asarray(ref_mod.row_embed.weight.detach().numpy())}}
    ours = np.asarray(ours_mod.apply(params, n, dim))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)
