from devias_tpu.ckpt.torch_import import (
    import_torch_state_dict,
    load_torch_checkpoint_file,
    interpolate_pos_embed,
)
from devias_tpu.ckpt.orbax_io import (
    save_checkpoint,
    load_checkpoint,
    auto_resume,
    latest_checkpoint_step,
)
