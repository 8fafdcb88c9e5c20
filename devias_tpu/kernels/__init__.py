from devias_tpu.kernels.attention import fused_attention
