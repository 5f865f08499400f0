from segmentation_factory_tpu.models.build import (  # noqa: F401
    SegmentationModel,
    build_model,
)
