"""Full-geometry training-trajectory golden (VERDICT r3 item 2).

The four engine trajectory goldens prove the composed training semantics
at reduced geometry (depth 2, 4 frames, agg_depth 2 —
test_trajectory_golden.py:57-58). What that leaves unproven: layer-decay
across the REAL 12 transformer layers (ref utils/optim_factory.py:38-46
assigns 0.75^(13-i) per block id — only ids 0..3 exist at depth 2), the
8-round TIED aggregation stack (gradient accumulation across 8 reuses of
one parameter set vs 2), and the schedule/optimizer behavior on the real
~121M-param pytree. This test reruns the same harness — the actual
reference train_one_epoch + optim_factory + cosine_scheduler vs
make_optimizer/make_slot_train_step from identical imported weights — at
the published flagship geometry: ViT-B/16, 12 layers, 16 frames (1568
tokens), agg_depth 8 tied, batch 2, f32 CPU, 2 optimizer steps.

Slow (~10-20 min on one core: two full-size torch steps + the JAX-CPU
compile); deselect with `-m "not slow"`.
"""

import pytest

import test_trajectory_golden as tg


@pytest.mark.slow
def test_full_geometry_trajectory(monkeypatch):
    monkeypatch.setattr(tg, "DEPTH", 12)
    monkeypatch.setattr(tg, "FRAMES", 16)
    monkeypatch.setattr(tg, "AGG_DEPTH", 8)
    tg.test_training_trajectory_matches_reference(update_freq=1, n_opt_steps=2)
