from devias_tpu.nn.vit import VideoViT, sinusoid_position_table
from devias_tpu.nn.agg import AggregationBlock
from devias_tpu.nn.heads import MLPHead, MaskPredictor
from devias_tpu.nn.models import (
    SlotViT,
    PlainViT,
    MultiTaskViT,
    SlotFusionViT,
    create_model,
)
