from segmentation_factory_tpu.data.datasets import (  # noqa: F401
    DATASETS,
    ADE20K,
    Cityscapes,
    COCOStuff,
    KvasirClinicDB,
    SegDataset,
    Synthetic,
    SynapseCT,
    VOCSegmentation,
    build_dataset,
    download_voc,
    voc_colormap,
)
from segmentation_factory_tpu.data.pipeline import Loader, prefetch_to_device  # noqa: F401
from segmentation_factory_tpu.data.transforms import (  # noqa: F401
    augment_batch,
    center_pad_to,
    normalize,
    preprocess_eval,
    random_scale_crop,
    resize_pair,
    resize_short_side,
)
