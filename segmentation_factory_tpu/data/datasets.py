"""Dataset manifests: file discovery, label encoding, palettes.

Rebuild of /root/reference/datasets/ as thin *manifest* classes: each dataset
is a list of (image_path, label_path) pairs plus a pure-numpy ``load(i)``
that returns ``(image_u8 HWC, label_i32 HW)`` with labels already encoded to
train ids. All heavy lifting (augmentation, normalisation) happens later —
geometric on host threads, photometric on device (see transforms.py).

Datasets covered (ref datasets/build_datasets.py:13-100):
Cityscapes (cityscapes.py), ADE20K (ade.py), VOC (voc.py), COCO-Stuff
(coco_stuff.py), Kvasir+CVC-ClinicDB (kvasir.py), Synapse CT (synapse.py),
plus a synthetic dataset for CI/benchmarks.
"""

from __future__ import annotations

import glob
import os
import random
from typing import List, Optional, Sequence, Tuple

import numpy as np

from segmentation_factory_tpu.data import class_names

try:
    from PIL import Image
except Exception:  # pragma: no cover
    Image = None


def _imread(path: str) -> np.ndarray:
    img = Image.open(path).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def _maskread(path: str) -> np.ndarray:
    return np.asarray(Image.open(path), dtype=np.int32)


class SegDataset:
    """Base manifest. Subclasses fill ``pairs`` and class metadata."""

    CLASSES: Sequence[str] = ()
    PALETTE: Optional[np.ndarray] = None  # (C, 3) uint8
    ignore_index: int = 255

    def __init__(self):
        self.pairs: List[Tuple[str, str]] = []

    @property
    def num_classes(self) -> int:
        return len(self.CLASSES)

    def __len__(self) -> int:
        return len(self.pairs)

    def encode_label(self, lbl: np.ndarray) -> np.ndarray:
        return lbl

    def load(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        img_path, lbl_path = self.pairs[i]
        return _imread(img_path), self.encode_label(_maskread(lbl_path))


# ---------------------------------------------------------------------------
# Cityscapes (ref datasets/cityscapes.py:35-180)
# ---------------------------------------------------------------------------

# Standard Cityscapes spec: 34 label ids -> 19 train ids (255 = ignore).
_CITYSCAPES_ID_TO_TRAIN = np.full(256, 255, dtype=np.int32)
for _id, _tid in [
    (7, 0), (8, 1), (11, 2), (12, 3), (13, 4), (17, 5), (19, 6), (20, 7),
    (21, 8), (22, 9), (23, 10), (24, 11), (25, 12), (26, 13), (27, 14),
    (28, 15), (31, 16), (32, 17), (33, 18),
]:
    _CITYSCAPES_ID_TO_TRAIN[_id] = _tid

_CITYSCAPES_PALETTE = np.asarray(
    [
        [128, 64, 128], [244, 35, 232], [70, 70, 70], [102, 102, 156],
        [190, 153, 153], [153, 153, 153], [250, 170, 30], [220, 220, 0],
        [107, 142, 35], [152, 251, 152], [70, 130, 180], [220, 20, 60],
        [255, 0, 0], [0, 0, 142], [0, 0, 70], [0, 60, 100], [0, 80, 100],
        [0, 0, 230], [119, 11, 32],
    ],
    dtype=np.uint8,
)


class Cityscapes(SegDataset):
    CLASSES = (
        "road", "sidewalk", "building", "wall", "fence", "pole",
        "traffic light", "traffic sign", "vegetation", "terrain", "sky",
        "person", "rider", "car", "truck", "bus", "train", "motorcycle",
        "bicycle",
    )
    PALETTE = _CITYSCAPES_PALETTE

    def __init__(self, root: str, split: str = "train"):
        super().__init__()
        img_dir = os.path.join(root, "leftImg8bit", split)
        lbl_dir = os.path.join(root, "gtFine", split)
        # dir-walk pairing leftImg8bit <-> gtFine_labelIds (ref :119-127)
        for img_path in sorted(
            glob.glob(os.path.join(img_dir, "*", "*_leftImg8bit.png"))
        ):
            city = os.path.basename(os.path.dirname(img_path))
            base = os.path.basename(img_path).replace(
                "_leftImg8bit.png", "_gtFine_labelIds.png"
            )
            self.pairs.append((img_path, os.path.join(lbl_dir, city, base)))

    def encode_label(self, lbl: np.ndarray) -> np.ndarray:
        return _CITYSCAPES_ID_TO_TRAIN[np.clip(lbl, 0, 255)]


# ---------------------------------------------------------------------------
# VOC 2012 (ref datasets/voc.py:76-253)
# ---------------------------------------------------------------------------


def voc_colormap(n: int = 256) -> np.ndarray:
    """Bit-twiddling VOC palette (ref voc.py:55-73)."""
    cmap = np.zeros((n, 3), dtype=np.uint8)
    for i in range(n):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        cmap[i] = [r, g, b]
    return cmap


# official trainval tarballs (ref voc.py:15-52 DATASET_YEAR_DICT)
VOC_YEAR_URLS = {
    "2012": (
        "http://host.robots.ox.ac.uk/pascal/VOC/voc2012/VOCtrainval_11-May-2012.tar",
        "6cd6e144f989b92b3379bac3b3de84fd",
    ),
    "2011": (
        "http://host.robots.ox.ac.uk/pascal/VOC/voc2011/VOCtrainval_25-May-2011.tar",
        "6c3384ef61512963050cb5d687e5bf1e",
    ),
    "2010": (
        "http://host.robots.ox.ac.uk/pascal/VOC/voc2010/VOCtrainval_03-May-2010.tar",
        "da459979d0c395079b5c75ee67908abb",
    ),
    "2009": (
        "http://host.robots.ox.ac.uk/pascal/VOC/voc2009/VOCtrainval_11-May-2009.tar",
        "59065e4b188729180974ef6572f6a212",
    ),
    "2008": (
        "http://host.robots.ox.ac.uk/pascal/VOC/voc2008/VOCtrainval_14-Jul-2008.tar",
        "2629fa636546599198acfcfbfcf1904a",
    ),
    "2007": (
        "http://host.robots.ox.ac.uk/pascal/VOC/voc2007/VOCtrainval_06-Nov-2007.tar",
        "c52e279531787c972589f7e41ab4ae64",
    ),
}


def download_voc(root: str, year: str = "2012") -> str:
    """Download + extract the official VOC trainval tarball into ``root``.

    Equivalent of the reference's ``download_extract``
    (/root/reference/datasets/voc.py:256-259, wired by ``download=True``
    at :181-182) without the torchvision dependency: stdlib urllib +
    md5 verification + tarfile. Skips the download when the archive is
    already present and verified. Returns the extracted VOCdevkit dir.
    """
    import hashlib
    import tarfile
    import urllib.request

    if year not in VOC_YEAR_URLS:
        raise KeyError(f"unknown VOC year {year!r}; have {sorted(VOC_YEAR_URLS)}")
    url, md5 = VOC_YEAR_URLS[year]
    os.makedirs(root, exist_ok=True)
    tar_path = os.path.join(root, os.path.basename(url))

    def verified() -> bool:
        if not os.path.isfile(tar_path):
            return False
        h = hashlib.md5()
        with open(tar_path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        return h.hexdigest() == md5

    if not verified():
        try:
            urllib.request.urlretrieve(url, tar_path)
        except Exception as e:
            raise RuntimeError(
                f"could not download {url} ({e}); on an air-gapped machine, "
                f"place the verified tarball at {tar_path} and re-run"
            ) from e
        if not verified():
            raise RuntimeError(f"md5 mismatch for {tar_path} (expected {md5})")
    with tarfile.open(tar_path, "r") as tar:
        tar.extractall(path=root)
    return os.path.join(root, "VOCdevkit")


class VOCSegmentation(SegDataset):
    CLASSES = (
        "background", "aeroplane", "bicycle", "bird", "boat", "bottle",
        "bus", "car", "cat", "chair", "cow", "diningtable", "dog", "horse",
        "motorbike", "person", "pottedplant", "sheep", "sofa", "train",
        "tvmonitor",
    )
    PALETTE = voc_colormap()[:21]

    def __init__(self, root: str, split: str = "train", year: str = "2012_aug"):
        super().__init__()
        base = os.path.join(root, "VOCdevkit", "VOC2012")
        if not os.path.isdir(base):
            base = root  # allow pointing straight at the VOC2012 dir
        aug = year.endswith("aug")
        mask_dir = os.path.join(
            base, "SegmentationClassAug" if aug else "SegmentationClass"
        )
        if aug and not os.path.isdir(mask_dir):
            aug = False
            mask_dir = os.path.join(base, "SegmentationClass")
        if aug and split == "train":
            # the aug TRAIN list is train_aug.txt (10582 images, ref
            # voc.py:188-192 reads it from the dataset root) — NOT the
            # 1464-image ImageSets/Segmentation/train.txt
            candidates = [
                os.path.join(base, "ImageSets", "Segmentation", "train_aug.txt"),
                os.path.join(base, "train_aug.txt"),
                os.path.join(root, "train_aug.txt"),
            ]
            split_file = next((c for c in candidates if os.path.isfile(c)),
                              None)
            if split_file is None:
                import warnings

                warnings.warn(
                    "SegmentationClassAug present but train_aug.txt not "
                    "found; falling back to the 1464-image train.txt list"
                )
                split_file = os.path.join(
                    base, "ImageSets", "Segmentation", "train.txt"
                )
        else:
            split_file = os.path.join(
                base, "ImageSets", "Segmentation", f"{split}.txt"
            )
        with open(split_file) as f:
            # robust to both bare-name lists and the "path path" variant of
            # train_aug.txt circulating with the SBD aug masks
            names = []
            for ln in f:
                tok = ln.split()[0] if ln.strip() else ""
                if not tok:
                    continue
                if "/" in tok:
                    tok = os.path.splitext(os.path.basename(tok))[0]
                names.append(tok)
        ext = ".png"
        for n in names:
            self.pairs.append(
                (
                    os.path.join(base, "JPEGImages", n + ".jpg"),
                    os.path.join(mask_dir, n + ext),
                )
            )


# ---------------------------------------------------------------------------
# ADE20K (ref datasets/ade.py:11-132)
# ---------------------------------------------------------------------------


class ADE20K(SegDataset):
    CLASSES = class_names.ADE20K_CLASSES  # real names (ref ade.py:20-46)
    ignore_index = 255

    def __init__(self, root: str, split: str = "training"):
        super().__init__()
        split = {"train": "training", "val": "validation"}.get(split, split)
        img_dir = os.path.join(root, "images", split)
        ann_dir = os.path.join(root, "annotations", split)
        for img_path in sorted(glob.glob(os.path.join(img_dir, "*.jpg"))):
            base = os.path.splitext(os.path.basename(img_path))[0]
            self.pairs.append((img_path, os.path.join(ann_dir, base + ".png")))
        self.PALETTE = class_names.ADE20K_PALETTE

    def encode_label(self, lbl: np.ndarray) -> np.ndarray:
        # stored labels are 0=void, 1..150 -> train ids 0..149, void -> 255
        out = lbl.astype(np.int32) - 1
        out[out < 0] = 255
        return out


# ---------------------------------------------------------------------------
# COCO-Stuff 171 (ref datasets/coco_stuff.py:10-106)
# ---------------------------------------------------------------------------

_COCO_UNUSED = (
    11, 25, 28, 29, 44, 65, 67, 68, 70, 82, 90,
)  # 0-indexed thing ids absent from COCO (ref coco_stuff.py:55)


def _coco_label_map() -> np.ndarray:
    lut = np.full(256, 255, dtype=np.int32)
    new_id = 0
    for old in range(182):
        if old in _COCO_UNUSED:
            continue
        lut[old] = new_id
        new_id += 1
    return lut


class COCOStuff(SegDataset):
    CLASSES = class_names.COCOSTUFF_CLASSES  # real names (ref coco_stuff.py:19-32)

    def __init__(self, root: str, split: str = "train2017"):
        super().__init__()
        split = {"train": "train2017", "val": "val2017"}.get(split, split)
        img_dir = os.path.join(root, "images", split)
        ann_dir = os.path.join(root, "annotations", split)
        for img_path in sorted(glob.glob(os.path.join(img_dir, "*.jpg"))):
            base = os.path.splitext(os.path.basename(img_path))[0]
            self.pairs.append((img_path, os.path.join(ann_dir, base + ".png")))
        self._lut = _coco_label_map()
        self.PALETTE = class_names.COCOSTUFF_PALETTE

    def encode_label(self, lbl: np.ndarray) -> np.ndarray:
        return self._lut[np.clip(lbl, 0, 255)]


# ---------------------------------------------------------------------------
# Kvasir-SEG + CVC-ClinicDB polyp (ref datasets/kvasir.py:91-145)
# ---------------------------------------------------------------------------


class KvasirClinicDB(SegDataset):
    CLASSES = ("background", "polyp")
    PALETTE = np.asarray([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)

    def __init__(self, root: str, split: str = "train", val_frac: float = 0.2,
                 seed: int = 0, preset_recipe: bool = False):
        super().__init__()
        if preset_recipe:
            # the reference's *intended* (but dead-code) polyp preset,
            # repaired — see transforms.kvasir_train_augment docstring
            from .transforms import kvasir_train_augment

            self.train_augment = (
                lambda img, lbl, rng, out_hw: kvasir_train_augment(
                    img, lbl, rng, out_hw, self.ignore_index
                )
            )
        pairs = []
        kv = os.path.join(root, "Kvasir-SEG")
        if os.path.isdir(kv):
            for p in sorted(glob.glob(os.path.join(kv, "images", "*.jpg"))):
                m = os.path.join(kv, "masks", os.path.basename(p))
                pairs.append((p, m))
        cdb = os.path.join(root, "CVC-ClinicDB")
        if os.path.isdir(cdb):
            for p in sorted(glob.glob(os.path.join(cdb, "images", "*.png"))):
                m = os.path.join(cdb, "masks", os.path.basename(p))
                pairs.append((p, m))
        # deterministic split (the reference uses unseeded random.sample,
        # kvasir.py:106-108 — non-reproducible eval; we fix that)
        r = random.Random(seed)
        idx = list(range(len(pairs)))
        r.shuffle(idx)
        n_val = int(len(pairs) * val_frac)
        keep = set(idx[:n_val]) if split == "val" else set(idx[n_val:])
        self.pairs = [pairs[i] for i in sorted(keep)]

    def encode_label(self, lbl: np.ndarray) -> np.ndarray:
        if lbl.ndim == 3:
            lbl = lbl[..., 0]
        return (lbl > 127).astype(np.int32)  # /255 binarise (ref :124, :137)


# ---------------------------------------------------------------------------
# Synapse multi-organ CT (ref datasets/synapse.py:52-81)
# ---------------------------------------------------------------------------


class SynapseCT(SegDataset):
    """Train: per-slice .npz {'image','label'}; val: per-case .h5 volumes.

    The reference's dataset returns dicts the engine can't consume
    (synapse.py:65-81); here train slices flow through the standard (img,
    lbl) pipeline and ``volumes()`` exposes per-case arrays for the
    sliding-window / per-case dice eval (BASELINE.md config #4).
    """

    CLASSES = (
        "background", "aorta", "gallbladder", "kidney_l", "kidney_r",
        "liver", "pancreas", "spleen", "stomach",
    )

    def __init__(self, root: str, split: str = "train", list_dir: Optional[str] = None):
        super().__init__()
        self.root = root
        self.split = split
        list_dir = list_dir or os.path.join(root, "lists")
        name = "train" if split == "train" else "test_vol"
        list_path = os.path.join(list_dir, f"{name}.txt")
        with open(list_path) as f:
            self.names = [ln.strip() for ln in f if ln.strip()]
        self.pairs = [(n, n) for n in self.names]
        from segmentation_factory_tpu.data.visualize import random_palette

        self.PALETTE = random_palette(9, seed=2)

    def load(self, i: int):
        name = self.names[i]
        if self.split == "train":
            d = np.load(os.path.join(self.root, "train_npz", name + ".npz"))
            img = d["image"].astype(np.float32)  # (H, W) in [0, 1]
            img_u8 = np.clip(img * 255.0, 0, 255).astype(np.uint8)
            img_u8 = np.repeat(img_u8[..., None], 3, axis=-1)
            return img_u8, d["label"].astype(np.int32)
        raise IndexError("val split is volumetric; use volumes()")

    def train_augment(self, img, lbl, rng, out_hw):
        """The reference's Synapse train recipe (synapse.py:14-49):
        rot90/flip or NEAREST +-20deg rotation, then zoom to out_hw."""
        from segmentation_factory_tpu.data.transforms import synapse_train_augment

        return synapse_train_augment(img, lbl, rng, out_hw)

    def volumes(self):
        """Yield (name, image_vol (D,H,W) f32, label_vol (D,H,W) i32)."""
        import h5py

        for name in self.names:
            path = os.path.join(self.root, "test_vol_h5", name + ".npy.h5")
            with h5py.File(path, "r") as f:
                yield name, np.asarray(f["image"]), np.asarray(f["label"]).astype(np.int32)


# ---------------------------------------------------------------------------
# Synthetic (CI / benchmarks; no reference equivalent)
# ---------------------------------------------------------------------------


class Synthetic(SegDataset):
    """Procedural blobs: learnable in a few steps, zero I/O."""

    def __init__(self, num_classes: int = 8, size: int = 512, length: int = 64, seed: int = 0):
        super().__init__()
        self.CLASSES = tuple(f"class_{i}" for i in range(num_classes))
        self._size = size
        self._seed = seed
        self.pairs = [(str(i), str(i)) for i in range(length)]
        from segmentation_factory_tpu.data.visualize import random_palette

        self.PALETTE = random_palette(num_classes, seed=3)

    def load(self, i: int):
        rng = np.random.default_rng(self._seed * 100003 + i)
        s, c = self._size, self.num_classes
        yy, xx = np.mgrid[0:s, 0:s]
        lbl = np.zeros((s, s), np.int32)
        for k in range(1, c):
            cy, cx = rng.integers(0, s, 2)
            r = rng.integers(s // 16, s // 4)
            lbl[(yy - cy) ** 2 + (xx - cx) ** 2 < r * r] = k
        img = (lbl[..., None] * (255 // max(c - 1, 1))).astype(np.float32)
        img = img + rng.normal(0, 8, (s, s, 3))
        return np.clip(img, 0, 255).astype(np.uint8), lbl


DATASETS = {
    "cityscapes": (Cityscapes, 19),
    "voc": (VOCSegmentation, 21),
    "ade20k": (ADE20K, 150),
    "cocostuff": (COCOStuff, 171),
    "kvasir": (KvasirClinicDB, 2),
    "synapse": (SynapseCT, 9),
    "synthetic": (Synthetic, 8),
}


def build_dataset(name: str, root: str, split: str, **kwargs):
    """Dispatch + class-count cross-check (ref build_datasets.py:32-99)."""
    key = name.lower()
    if key not in DATASETS:
        raise KeyError(f"unknown dataset {name!r}; available: {sorted(DATASETS)}")
    cls, n_classes = DATASETS[key]
    if key == "synthetic":
        ds = cls(**kwargs)
    else:
        ds = cls(root, split=split, **kwargs)
    assert ds.num_classes == n_classes or key == "synthetic", (
        f"{name}: expected {n_classes} classes, manifest has {ds.num_classes}"
    )
    return ds
