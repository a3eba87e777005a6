from fastvim_tpu.utils.profiling import (
    StepTimer,
    device_memory_stats,
    trace,
)

__all__ = ["StepTimer", "device_memory_stats", "trace"]
