"""Backbone zoo. Importing this package registers every backbone."""

import segmentation_factory_tpu.models.backbones.mit  # noqa: F401

from segmentation_factory_tpu.models.backbones.mit import MiT  # noqa: F401
