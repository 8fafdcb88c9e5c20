"""Device-side Hungarian slot<->label matching.

The reference solves a per-sample (num_slots x 2) assignment with
scipy.optimize.linear_sum_assignment on the CPU — a device->host sync for
every sample every step (ref: utils/loss/train_loss.py:112-125). DEVIAS
only ever matches against TWO labels (action=col 0, scene=col 1), so the
optimal assignment is argmin over ordered slot pairs (i, j), i != j, of
cost_action[i] + cost_scene[j] — an O(S^2) vectorized reduction that stays
on device and inside jit. This is *exact* (identical argmin to the
Hungarian algorithm on an S x 2 rectangular cost matrix) for any S >= 2.
"""

from __future__ import annotations

import jax.numpy as jnp


def match_action_scene_slots(cost_action: jnp.ndarray, cost_scene: jnp.ndarray):
    """Args: cost_action, cost_scene — [B, S] per-slot costs (lower better).
    Returns (action_idx [B], scene_idx [B]) int32, the exact minimizers of
    cost_action[i] + cost_scene[j] subject to i != j.

    Tie-breaking matches scipy's row-major scan order: among equal totals the
    pair with the smallest flattened (i * S + j) index wins — jnp.argmin on
    the flattened pair-cost matrix has exactly that semantics.
    """
    B, S = cost_action.shape
    if S < 2:
        raise ValueError("need at least 2 slots to assign action and scene")
    pair = cost_action[:, :, None] + cost_scene[:, None, :]  # [B, S, S]
    eye = jnp.eye(S, dtype=bool)
    pair = jnp.where(eye[None], jnp.inf, pair)
    flat_idx = jnp.argmin(pair.reshape(B, S * S), axis=-1)
    return (flat_idx // S).astype(jnp.int32), (flat_idx % S).astype(jnp.int32)
