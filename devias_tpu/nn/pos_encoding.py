"""Positional encodings for the aggregation block context.

ref: agg_block/pos_encoding.py — sine/learned 1D/2D builders added to the
context keys before to_k (ref agg_block/attention.py:125 `context + k_pos`).
Every published DEVIAS config uses 'none' (ref agg_block/agg_block.py:21,
pos_encoding.py:133-134); the builders are provided for capability parity.

Functional (stateless) for sine; learned variants are flax modules.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def sine_1d(n: int, dim: int, temperature: float = 10000.0, normalize: bool = True,
            scale: Optional[float] = None) -> np.ndarray:
    """1-D sine embedding over token positions (ref pos_encoding.py:44-74)."""
    scale = scale if scale is not None else 2 * math.pi
    pos = np.arange(1, n + 1, dtype=np.float64)
    if normalize:
        pos = pos / (pos[-1] + 1e-6) * scale
    dim_t = temperature ** (2 * (np.arange(dim, dtype=np.float64) // 2) / dim)
    x = pos[:, None] / dim_t[None, :]
    out = np.empty((n, dim))
    out[:, 0::2] = np.sin(x[:, 0::2])
    out[:, 1::2] = np.cos(x[:, 1::2])
    return out.astype(np.float32)


def sine_2d(h: int, w: int, dim: int, temperature: float = 10000.0,
            normalize: bool = True, scale: Optional[float] = None) -> np.ndarray:
    """2-D sine embedding flattened to (h*w, dim): half the channels encode
    y, half encode x (ref pos_encoding.py:7-42)."""
    assert dim % 2 == 0
    half = dim // 2
    scale = scale if scale is not None else 2 * math.pi
    ys = np.arange(1, h + 1, dtype=np.float64)[:, None] * np.ones((1, w))
    xs = np.ones((h, 1)) * np.arange(1, w + 1, dtype=np.float64)[None, :]
    if normalize:
        ys = ys / (ys[-1:, :] + 1e-6) * scale
        xs = xs / (xs[:, -1:] + 1e-6) * scale
    dim_t = temperature ** (2 * (np.arange(half, dtype=np.float64) // 2) / half)
    py = ys[:, :, None] / dim_t
    px = xs[:, :, None] / dim_t
    def interleave(p):
        out = np.empty_like(p)
        out[..., 0::2] = np.sin(p[..., 0::2])
        out[..., 1::2] = np.cos(p[..., 1::2])
        return out
    emb = np.concatenate([interleave(py), interleave(px)], axis=-1)
    return emb.reshape(h * w, dim).astype(np.float32)


class Learned1D(nn.Module):
    """Learned per-position embedding (ref pos_encoding.py:104-124)."""

    max_len: int = 2048

    @nn.compact
    def __call__(self, n: int, dim: int):
        table = self.param("embed", nn.initializers.uniform(1.0), (self.max_len, dim))
        return table[:n]


class Learned2D(nn.Module):
    """Learned col+row embedding — the reference concatenates the COLUMN
    (x) embedding first (ref pos_encoding.py:91-99)."""

    max_hw: int = 64

    @nn.compact
    def __call__(self, h: int, w: int, dim: int):
        rows = self.param("row_embed", nn.initializers.uniform(1.0), (self.max_hw, dim // 2))
        cols = self.param("col_embed", nn.initializers.uniform(1.0), (self.max_hw, dim // 2))
        out = jnp.concatenate(
            [
                jnp.repeat(cols[:w][None, :, :], h, axis=0),
                jnp.repeat(rows[:h][:, None, :], w, axis=1),
            ],
            axis=-1,
        )
        return out.reshape(h * w, dim)


def build_position_encoding(pos_enc_type: str, n: int, dim: int,
                            hw: Optional[tuple] = None):
    """'none' | 'sine1d' | 'sine2d' -> array or None (learned variants are
    modules the caller instantiates; ref pos_encoding.py:127-138)."""
    if pos_enc_type in ("none", "", None):
        return None
    if pos_enc_type == "sine1d":
        return jnp.asarray(sine_1d(n, dim))
    if pos_enc_type == "sine2d":
        assert hw is not None
        return jnp.asarray(sine_2d(hw[0], hw[1], dim))
    raise ValueError(f"unknown pos_enc_type {pos_enc_type}")
