"""TPU-native semantic-segmentation framework (JAX/Flax/Pallas).

A ground-up rebuild of the capabilities of the PyTorch reference
``jiaowoguanren0615/Segmentation_Factory`` designed for TPU hardware:

- NHWC layouts, bfloat16 compute / fp32 params (no AMP GradScaler machinery),
- functional train/eval steps jitted over a ``jax.sharding.Mesh`` (DP x TP),
- device-resident streaming confusion-matrix metrics merged with ``psum``,
- Pallas kernels for fusion hotspots (multi-scale deformable attention, ...),
- orbax checkpoints, StableHLO export in place of ONNX.

See SURVEY.md for the reference layer map this framework mirrors.
"""

__version__ = "0.1.0"

from segmentation_factory_tpu.registry import (  # noqa: F401
    BACKBONES,
    HEADS,
    register_backbone,
    register_head,
)
