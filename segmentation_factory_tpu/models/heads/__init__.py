"""Decode-head zoo. Importing this package registers every head."""

import segmentation_factory_tpu.models.heads.segformer  # noqa: F401

from segmentation_factory_tpu.models.heads.segformer import SegFormerHead  # noqa: F401
