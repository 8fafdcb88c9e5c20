from devias_tpu.data.filelist import read_filelist, FilelistEntry
from devias_tpu.data.samplers import (
    train_window_indices,
    test_stride_indices,
    tsn_train_indices,
    tsn_test_indices,
    test_view_offsets,
)
from devias_tpu.data.datasets import build_dataset, VideoDataset, DataConfig
from devias_tpu.data.loader import DataLoader
