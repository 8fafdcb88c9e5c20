"""DEVIAS-TPU: a TPU-native JAX framework for disentangled video
representation learning (action/scene), re-designed from scratch with the
capabilities of KHU-VLL/DEVIAS (ECCV 2024, arXiv:2312.00826).

Layers (bottom-up):
  core/    mesh + distributed init, precision policy, schedules, config
  kernels/ Pallas TPU kernels (flash attention, fused slot attention)
  nn/      flax models: VideoMAE-style ViT, slot aggregation block, heads
  losses/  device-side Hungarian slot matching + DEVIAS loss terms
  aug/     FAME foreground/background mix augmentation (pure JAX)
  data/    filelists, samplers, host-side augmentation, video decode, loaders
  train/   jitted train/eval steps, optimizer factory, EMA, train state
  eval/    multi-view merge, SCUBA/HAT/HVU/kNN protocols
  ckpt/    orbax checkpointing + PyTorch (VideoMAE/DEVIAS) state-dict import
  cli/     entry points mirroring the reference scripts' surface
"""

__version__ = "0.1.0"
