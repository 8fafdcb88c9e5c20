from devias_tpu.core.precision import Policy, DEFAULT_POLICY
from devias_tpu.core.dist import make_mesh, device_count, local_batch_slice
from devias_tpu.core.schedules import cosine_schedule, cosine_wd_schedule
