from segmentation_factory_tpu.utils.logging import (  # noqa: F401
    MetricLogger,
    SmoothedValue,
    device_memory_mb,
)
