"""Decode-head zoo. Importing this package registers every head."""

import segmentation_factory_tpu.models.heads.deeplabv3  # noqa: F401
import segmentation_factory_tpu.models.heads.efficientvitseg  # noqa: F401
import segmentation_factory_tpu.models.heads.fpn  # noqa: F401
import segmentation_factory_tpu.models.heads.mask2former  # noqa: F401
import segmentation_factory_tpu.models.heads.maskrcnn_head  # noqa: F401
import segmentation_factory_tpu.models.heads.segformer  # noqa: F401
import segmentation_factory_tpu.models.heads.upernet  # noqa: F401

from segmentation_factory_tpu.models.heads.deeplabv3 import DeepLabV3Head  # noqa: F401
from segmentation_factory_tpu.models.heads.fpn import FPNHead  # noqa: F401
from segmentation_factory_tpu.models.heads.segformer import SegFormerHead  # noqa: F401
from segmentation_factory_tpu.models.heads.upernet import UPerHead  # noqa: F401
