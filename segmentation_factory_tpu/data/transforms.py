"""Paired image/label transforms, split TPU-first.

Rebuild of /root/reference/datasets/extra_transform.py with a deliberate
host/device split:

- **Host (numpy/PIL, per sample, in loader threads):** the geometric ops
  whose output shapes depend on random draws — random scale, random crop
  with pad-to-crop, val resize. Cheap on CPU, and doing them host-side keeps
  every device array static-shaped.
- **Device (jitted, per batch):** the photometric float ops — hflip, color
  jitter (brightness/contrast/saturation), normalize. These ride the VPU
  fused into the train step, and the host->device transfer stays uint8
  (4x less PCIe/DMA traffic than fp32).

Labels always use NEAREST (ref extra_transform.py:92, :419); images bilinear.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from PIL import Image
except Exception:  # pragma: no cover
    Image = None

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------------------
# Host-side geometric (numpy / PIL)
# ---------------------------------------------------------------------------


def _pil_resize(arr: np.ndarray, size_wh: Tuple[int, int], nearest: bool) -> np.ndarray:
    mode = Image.NEAREST if nearest else Image.BILINEAR
    out = Image.fromarray(arr if arr.dtype == np.uint8 else arr.astype(np.int32)).resize(
        size_wh, mode
    )
    return np.asarray(out)


def resize_pair(img: np.ndarray, lbl: np.ndarray, hw: Tuple[int, int]):
    """Deterministic resize (val pipeline; ref ExtResize :395-423)."""
    h, w = hw
    img = _pil_resize(img, (w, h), nearest=False)
    lbl = _pil_resize(lbl.astype(np.int32), (w, h), nearest=True).astype(np.int32)
    return img, lbl


def random_rotation(
    img: np.ndarray,
    lbl: np.ndarray,
    degrees: Tuple[float, float],
    rng: np.random.Generator,
    img_fill: int = 0,
    lbl_fill: int = 0,
    expand: bool = False,
    nearest_img: bool = False,
):
    """Paired rotation (ref ExtRandomRotation, extra_transform.py:129-194).

    Image bilinear (or NEAREST with ``nearest_img``, the Synapse order=0
    convention), label always NEAREST. Fill defaults to 0 exactly like the
    reference's F.rotate; pass ``lbl_fill=ignore_index`` to keep rotated-in
    corners out of the loss instead (a documented improvement over the
    reference, which pollutes class 0).
    """
    angle = float(rng.uniform(degrees[0], degrees[1]))
    if not expand and img.ndim == 3 and img.shape[-1] == 3:
        from segmentation_factory_tpu import native

        if native.available():  # fused C++ path (no PIL, no GIL)
            return native.rotate_pair(
                np.ascontiguousarray(img), np.ascontiguousarray(lbl), angle,
                nearest_img=nearest_img, img_fill=img_fill, lbl_fill=lbl_fill,
            )
    im = Image.fromarray(img).rotate(
        angle,
        resample=Image.NEAREST if nearest_img else Image.BILINEAR,
        expand=expand,
        fillcolor=(img_fill,) * (3 if img.ndim == 3 else 1),
    )
    lb = Image.fromarray(lbl.astype(np.int32)).rotate(
        angle, resample=Image.NEAREST, expand=expand, fillcolor=lbl_fill
    )
    return np.asarray(im), np.asarray(lb).astype(np.int32)


def synapse_train_augment(
    img: np.ndarray,
    lbl: np.ndarray,
    rng: np.random.Generator,
    out_hw: Tuple[int, int],
):
    """The Synapse CT train recipe (ref datasets/synapse.py:14-49
    RandomGenerator): p=.5 (rot90 x k + random-axis flip), elif p=.5
    (NEAREST rotate in [-20, 20)), then zoom to the output size
    (image bicubic / order-3, label NEAREST / order-0).
    """
    if rng.random() > 0.5:
        k = int(rng.integers(0, 4))
        img = np.rot90(img, k, axes=(0, 1))
        lbl = np.rot90(lbl, k, axes=(0, 1))
        axis = int(rng.integers(0, 2))
        img = np.flip(img, axis=axis)
        lbl = np.flip(lbl, axis=axis)
    elif rng.random() > 0.5:
        # ndimage.rotate(order=0, reshape=False, cval=0) == NEAREST, no expand
        img, lbl = random_rotation(
            np.ascontiguousarray(img), np.ascontiguousarray(lbl),
            (-20.0, 20.0), rng, nearest_img=True,
        )
    h, w = lbl.shape[:2]
    oh, ow = out_hw
    if (h, w) != (oh, ow):
        im = Image.fromarray(np.ascontiguousarray(img)).resize((ow, oh), Image.BICUBIC)
        lb = Image.fromarray(np.ascontiguousarray(lbl).astype(np.int32)).resize(
            (ow, oh), Image.NEAREST
        )
        img, lbl = np.asarray(im), np.asarray(lb).astype(np.int32)
    return np.ascontiguousarray(img), np.ascontiguousarray(lbl)


def kvasir_train_augment(
    img: np.ndarray,
    lbl: np.ndarray,
    rng: np.random.Generator,
    out_hw: Tuple[int, int],
    ignore_index: int = 255,
):
    """The Kvasir/ClinicDB polyp preset the reference *intends* (ref
    datasets/kvasir.py:13-34): RandomResize(0.5-1.2 x base, short side) +
    HFlip(p=.5) + VFlip(p=.5) + RandomCrop(crop, pad-if-needed).

    The reference's own preset is dead code — ``SegmentationPresetTrain``
    calls ``T.RandomResize``/``T.RandomCrop``/``T.ToTensor`` which do not
    exist in datasets/extra_transform.py (only Ext*-prefixed variants do),
    so constructing it raises AttributeError, and its call sites
    (kvasir.py:174, :182) are commented out; the live path routes Kvasir
    through the generic recipe (build_datasets.py:13-20). This function
    repairs the intended recipe using torchvision-reference semantics
    (short-side resize to a uniform int in [0.5*base, 1.2*base]); opt in
    via ``KvasirClinicDB(preset_recipe=True)``. See PARITY.md.
    """
    crop = out_hw[0]
    base = crop
    short = int(rng.integers(int(0.5 * base), int(1.2 * base) + 1))
    h, w = img.shape[:2]
    scale = short / min(h, w)
    img = _pil_resize(img, (max(1, int(w * scale)), max(1, int(h * scale))), nearest=False)
    lbl = _pil_resize(lbl.astype(np.int32), (max(1, int(w * scale)), max(1, int(h * scale))), nearest=True).astype(np.int32)
    if rng.random() < 0.5:  # hflip (preset hflip_prob=0.5)
        img, lbl = img[:, ::-1], lbl[:, ::-1]
    if rng.random() < 0.5:  # vflip (preset vflip_prob=0.5)
        img, lbl = img[::-1], lbl[::-1]
    # random crop, pad-if-needed (image 0, label ignore_index)
    ph, pw = max(crop - img.shape[0], 0), max(crop - img.shape[1], 0)
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)), constant_values=0)
        lbl = np.pad(lbl, ((0, ph), (0, pw)), constant_values=ignore_index)
    top = int(rng.integers(0, img.shape[0] - crop + 1))
    left = int(rng.integers(0, img.shape[1] - crop + 1))
    return (
        np.ascontiguousarray(img[top : top + crop, left : left + crop]),
        np.ascontiguousarray(lbl[top : top + crop, left : left + crop]),
    )


def resize_short_side(img: np.ndarray, lbl: np.ndarray, short: int, divisor: int = 32):
    """Scale so the short side == ``short``, then ceil both sides to /divisor
    (inference preprocessing; ref estimate_model.py:85-98)."""
    h, w = img.shape[:2]
    scale = short / min(h, w)
    nh = int(np.ceil(h * scale / divisor) * divisor)
    nw = int(np.ceil(w * scale / divisor) * divisor)
    return resize_pair(img, lbl, (nh, nw))


def draw_scale_crop_params(
    rng: np.random.Generator,
    h: int,
    w: int,
    crop: int,
    scale_range: Tuple[float, float] = (0.5, 2.0),
) -> Tuple[float, int, int]:
    """The (scale, top, left) draws of random_scale_crop's native path, as a
    shared helper so the Loader's batched fast path (one C++ call per batch,
    pipeline.py) consumes the SAME per-sample rng stream — batches are
    bit-identical whichever path runs."""
    scale = rng.uniform(*scale_range)
    nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
    top = int(rng.integers(0, max(nh - crop, 0) + 1))
    left = int(rng.integers(0, max(nw - crop, 0) + 1))
    return scale, top, left


def random_scale_crop(
    img: np.ndarray,
    lbl: np.ndarray,
    crop: int,
    scale_range: Tuple[float, float] = (0.5, 2.0),
    ignore_index: int = 255,
    rng: Optional[np.random.Generator] = None,
    use_native: bool = True,
):
    """Random-scale + random-crop + pad-to-crop (ref ExtRandomScale :75-97 +
    ExtRandomCrop w/ pad :319-392). Output is exactly (crop, crop).

    Uses the C++ transform engine (native/transform_engine.cpp) when built:
    the scale+crop+pad runs fused in one pass without PIL or the GIL.
    """
    rng = rng or np.random.default_rng()
    h, w = img.shape[:2]
    if use_native:
        from segmentation_factory_tpu import native

        if native.available():
            scale, top, left = draw_scale_crop_params(
                rng, h, w, crop, scale_range)
            oi, ol = native.batch_scale_crop(
                img[None], lbl[None].astype(np.int32),
                np.asarray([scale], np.float32),
                np.asarray([top], np.int32), np.asarray([left], np.int32),
                crop, ignore_index, num_threads=1,
            )
            return oi[0], ol[0]
    scale = rng.uniform(*scale_range)
    nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
    img = _pil_resize(img, (nw, nh), nearest=False)
    lbl = _pil_resize(lbl.astype(np.int32), (nw, nh), nearest=True).astype(np.int32)
    # pad to at least crop
    ph, pw = max(crop - nh, 0), max(crop - nw, 0)
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)), constant_values=0)
        lbl = np.pad(lbl, ((0, ph), (0, pw)), constant_values=ignore_index)
    nh, nw = img.shape[:2]
    top = rng.integers(0, nh - crop + 1)
    left = rng.integers(0, nw - crop + 1)
    return (
        img[top : top + crop, left : left + crop],
        lbl[top : top + crop, left : left + crop],
    )


def center_pad_to(img: np.ndarray, lbl: np.ndarray, hw: Tuple[int, int], ignore_index=255):
    """Pad (bottom/right) to a static eval canvas; mask stays valid-only via
    ignore_index so padded pixels never touch the confusion matrix."""
    h, w = hw
    ph, pw = max(h - img.shape[0], 0), max(w - img.shape[1], 0)
    img = np.pad(img, ((0, ph), (0, pw), (0, 0)), constant_values=0)
    lbl = np.pad(lbl, ((0, ph), (0, pw)), constant_values=ignore_index)
    return img[:h, :w], lbl[:h, :w]


# ---------------------------------------------------------------------------
# Device-side photometric (jitted; folded into the train step)
# ---------------------------------------------------------------------------


def normalize(images_f32: jax.Array) -> jax.Array:
    """uint8-scale float -> ImageNet-normalized (ref ExtNormalize :288-316)."""
    mean = jnp.asarray(IMAGENET_MEAN) * 255.0
    std = jnp.asarray(IMAGENET_STD) * 255.0
    return (images_f32 - mean) / std


def augment_batch(
    rng: jax.Array,
    images_u8: jax.Array,
    labels: jax.Array,
    hflip: bool = True,
    vflip: bool = False,
    color_jitter: float = 0.5,
):
    """Per-sample hflip/vflip + brightness/contrast/saturation jitter +
    normalize, all on device (replaces ExtColorJitter :426-517 and
    ExtRandomHorizontalFlip :196-218). Returns (images f32 normalized, labels).
    """
    b = images_u8.shape[0]
    img = images_u8.astype(jnp.float32)
    k_flip, k_vflip, k_b, k_c, k_s, k_order = jax.random.split(rng, 6)

    if hflip:
        do = jax.random.bernoulli(k_flip, 0.5, (b, 1, 1, 1))
        img = jnp.where(do, img[:, :, ::-1, :], img)
        labels = jnp.where(do[..., 0], labels[:, :, ::-1], labels)
    if vflip:
        do = jax.random.bernoulli(k_vflip, 0.5, (b, 1, 1, 1))
        img = jnp.where(do, img[:, ::-1, :, :], img)
        labels = jnp.where(do[..., 0], labels[:, ::-1, :], labels)

    if color_jitter > 0:
        # torchvision ColorJitter semantics (ref ExtColorJitter :426-517):
        # brightness/contrast/saturation each blend toward their reference
        # point and clamp; contrast blends against the scalar mean of the
        # GRAYSCALE image, saturation against the per-pixel ITU-R 601 luma,
        # and the op ORDER is randomly shuffled per call.
        j = color_jitter
        br = jax.random.uniform(k_b, (b, 1, 1, 1), minval=1 - j, maxval=1 + j)
        ct = jax.random.uniform(k_c, (b, 1, 1, 1), minval=1 - j, maxval=1 + j)
        st = jax.random.uniform(k_s, (b, 1, 1, 1), minval=1 - j, maxval=1 + j)
        luma_w = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)

        def _bright(x):
            return jnp.clip(x * br, 0.0, 255.0)

        def _contrast(x):
            gray_mean = jnp.mean(
                x @ luma_w, axis=(1, 2), keepdims=True
            )[..., None]
            return jnp.clip(x * ct + gray_mean * (1.0 - ct), 0.0, 255.0)

        def _saturation(x):
            gray = (x @ luma_w)[..., None]
            return jnp.clip(x * st + gray * (1.0 - st), 0.0, 255.0)

        # PER-SAMPLE op order (torchvision shuffles per image): compute all
        # three candidate outputs per step and select per sample — 3x the
        # (cheap elementwise) jitter math, no per-sample switch needed
        orders = jax.vmap(lambda k: jax.random.permutation(k, 3))(
            jax.random.split(k_order, b)
        )  # (B, 3)
        for step in range(3):
            outs = jnp.stack(
                [_bright(img), _contrast(img), _saturation(img)]
            )  # (3, B, H, W, C)
            img = jnp.take_along_axis(
                outs, orders[None, :, step, None, None, None], axis=0
            )[0]

    return normalize(img), labels


def preprocess_eval(images_u8: jax.Array) -> jax.Array:
    return normalize(images_u8.astype(jnp.float32))


# --- extra photometric ops (ref extra_transform.py :537-685) ---------------


def adjust_gamma(img: jax.Array, gamma: float, gain: float = 1.0) -> jax.Array:
    """uint8-scale gamma correction (ref AdjustGamma :537-560)."""
    x = jnp.clip(img, 0.0, 255.0) / 255.0
    # torchvision clamps the gained result back into the uint8 range
    return jnp.clip(255.0 * gain * x**gamma, 0.0, 255.0)


def gaussian_blur(img: jax.Array, sigma: float = 1.0, radius: int = 2) -> jax.Array:
    """Separable gaussian blur over NHWC (ref gaussian-blur :650-660)."""
    xs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (xs / sigma) ** 2)
    k = k / k.sum()
    # depthwise separable: convolve H then W per channel
    c = img.shape[-1]
    img_ = jnp.moveaxis(img, -1, 1)  # NCHW for conv_general
    kernel_h = k.reshape(1, 1, -1, 1)
    kernel_w = k.reshape(1, 1, 1, -1)
    x = img_.reshape(-1, 1, img.shape[1], img.shape[2])
    # torchvision gaussian_blur pads REFLECT; zero padding would darken the
    # borders by the out-of-image kernel mass
    x = jnp.pad(x, ((0, 0), (0, 0), (radius, radius), (radius, radius)),
                mode="reflect")
    out = jax.lax.conv_general_dilated(x, kernel_h, (1, 1), "VALID")
    out = jax.lax.conv_general_dilated(out, kernel_w, (1, 1), "VALID")
    out = out.reshape(img.shape[0], c, img.shape[1], img.shape[2])
    return jnp.moveaxis(out, 1, -1)


def to_grayscale(img: jax.Array) -> jax.Array:
    """Luma conversion, broadcast back to 3 channels (ref grayscale :661-666)."""
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    g = jnp.sum(img * w, axis=-1, keepdims=True)
    return jnp.broadcast_to(g, img.shape)


def posterize(img: jax.Array, bits: int = 4) -> jax.Array:
    """Keep the top ``bits`` bits per channel (ref posterize :680-685)."""
    shift = 8 - bits
    x = img.astype(jnp.int32) >> shift << shift
    return x.astype(img.dtype)


def adjust_sharpness(img: jax.Array, factor: float = 2.0) -> jax.Array:
    """blend(blurred, img, factor) (ref sharpness :622-633)."""
    blurred = gaussian_blur(img, sigma=1.0, radius=1)
    return jnp.clip(blurred + factor * (img - blurred), 0.0, 255.0)


def autocontrast(img: jax.Array) -> jax.Array:
    """Per-image/channel min-max stretch (ref autocontrast :634-649)."""
    lo = jnp.min(img, axis=(1, 2), keepdims=True)
    hi = jnp.max(img, axis=(1, 2), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-3)
    out = jnp.clip((img - lo) * scale, 0.0, 255.0)
    # torchvision returns the input unchanged for flat channels (min == max)
    return jnp.where(hi > lo, out, img)


def equalize(img: jax.Array) -> jax.Array:
    """Histogram equalization per image/channel over uint8 values
    (ref equalize :667-679)."""
    def eq_channel(ch):  # (H, W) float in [0, 255]
        v = jnp.clip(ch, 0, 255).astype(jnp.int32).reshape(-1)
        hist = jnp.bincount(v, length=256).astype(jnp.float32)
        cdf = jnp.cumsum(hist)
        cdf_min = cdf[jnp.argmax(hist > 0)]
        span = cdf[-1] - cdf_min
        lut = jnp.clip(
            (cdf - cdf_min) / jnp.maximum(span, 1.0) * 255.0, 0.0, 255.0
        )
        # torchvision F.equalize returns the input unchanged when the
        # histogram has a single occupied bin (step == 0)
        out = lut[v]
        return jnp.where(span > 0, out, v.astype(out.dtype)).reshape(ch.shape)

    return jax.vmap(jax.vmap(eq_channel, in_axes=-1, out_axes=-1))(img)
