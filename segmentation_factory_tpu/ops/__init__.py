from segmentation_factory_tpu.ops.msdeform import ms_deform_attn  # noqa: F401
from segmentation_factory_tpu.ops.pallas_attention import sra_attention  # noqa: F401
