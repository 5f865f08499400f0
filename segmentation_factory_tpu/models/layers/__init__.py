from segmentation_factory_tpu.models.layers.act import ACTIVATIONS, build_act  # noqa: F401
from segmentation_factory_tpu.models.layers.common import (  # noqa: F401
    ConvModule,
    ConvParams,
    DenseParams,
    DWConvParams,
    DropPath,
    LNParams,
    ln_apply,
    Mlp,
    SqueezeExcite,
    drop_path_rates,
    resize,
    resize_align_corners,
    resize_nearest_legacy,
    resize_torch_bicubic,
    resize_like,
    trunc_normal_init,
)
from segmentation_factory_tpu.models.layers.norm import (  # noqa: F401
    GRN,
    NORMS,
    BatchNorm,
    GroupNorm,
    LayerNorm,
    build_norm,
    set_norm_eps,
)
