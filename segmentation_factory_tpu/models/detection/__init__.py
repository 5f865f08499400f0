from segmentation_factory_tpu.models.detection.anchors import (  # noqa: F401
    anchors_for_pyramid,
    base_anchors,
    grid_anchors,
)
from segmentation_factory_tpu.models.detection.boxes import (  # noqa: F401
    batched_nms_mask,
    box_area,
    box_iou,
    clip_boxes_to_image,
    nms_mask,
    small_box_mask,
)
from segmentation_factory_tpu.models.detection.det_utils import (  # noqa: F401
    balanced_sample,
    decode_boxes,
    encode_boxes,
    match_proposals,
    smooth_l1_loss,
)
from segmentation_factory_tpu.models.detection.faster_rcnn import FasterRCNN  # noqa: F401
from segmentation_factory_tpu.models.detection.roi_align import (  # noqa: F401
    multiscale_roi_align,
    roi_align,
)
from segmentation_factory_tpu.models.detection.roi_heads import (  # noqa: F401
    FastRCNNPredictor,
    MaskRCNNHeads,
    MaskRCNNPredictor,
    TwoMLPHead,
)
from segmentation_factory_tpu.models.detection.transform import (  # noqa: F401
    ImageList,
    batch_images,
    expand_boxes,
    expand_masks,
    paste_mask_in_image,
    paste_masks_in_image,
    resize_boxes,
)
