from devias_tpu.train.optim import OptimConfig, make_optimizer, build_lr_scale_tree, build_wd_mask_tree
from devias_tpu.train.state import TrainState
from devias_tpu.train.step import (
    TrainStepConfig,
    make_slot_train_step,
    make_hvu_train_step,
    make_classification_train_step,
    make_multi_task_train_step,
    make_eval_step,
    place_data_parallel,
)
