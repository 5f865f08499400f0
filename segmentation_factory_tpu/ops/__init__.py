from segmentation_factory_tpu.ops.msdeform import (  # noqa: F401
    ms_deform_attn,
    ms_deform_attn_fast,
)
from segmentation_factory_tpu.ops.pallas_attention import sra_attention  # noqa: F401
