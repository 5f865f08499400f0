"""Backbone zoo. Importing this package registers every backbone."""

import segmentation_factory_tpu.models.backbones.casvit  # noqa: F401
import segmentation_factory_tpu.models.backbones.convnext  # noqa: F401
import segmentation_factory_tpu.models.backbones.convnextv2  # noqa: F401
import segmentation_factory_tpu.models.backbones.crossformer  # noqa: F401
import segmentation_factory_tpu.models.backbones.efficientvit  # noqa: F401
import segmentation_factory_tpu.models.backbones.iformer  # noqa: F401
import segmentation_factory_tpu.models.backbones.kat  # noqa: F401
import segmentation_factory_tpu.models.backbones.metaformer  # noqa: F401
import segmentation_factory_tpu.models.backbones.mit  # noqa: F401
import segmentation_factory_tpu.models.backbones.mobilenet  # noqa: F401
import segmentation_factory_tpu.models.backbones.mobilenetv4  # noqa: F401
import segmentation_factory_tpu.models.backbones.resnet  # noqa: F401

from segmentation_factory_tpu.models.backbones.convnext import ConvNeXt  # noqa: F401
from segmentation_factory_tpu.models.backbones.mit import MiT  # noqa: F401
from segmentation_factory_tpu.models.backbones.mobilenet import MobileNet  # noqa: F401
