from devias_tpu.utils.logging import MetricLogger, SmoothedValue, TensorLogger
from devias_tpu.utils.profiling import profile_trace, StepTimer
