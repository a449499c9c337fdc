"""Online data-augmentation transforms.

Functional re-implementations of the reference generator's per-image pipeline
(`/root/reference/data_generator/batch_generator.py:268-387`), with the same
semantics and ordering but explicit, deterministic randomness: every random
transform takes a ``numpy.random.Generator``, so a run is reproducible from a
single seed (the reference uses the global ``np.random``/``random`` state and
is unreproducible).

Transform order in the reference pipeline (and in ``BatchGenerator``):
random_crop -> crop -> resize -> brightness -> flip -> translate -> scale ->
gray. Images resize bilinearly; ground truth always nearest-neighbor; blank
space created by crop/translate/scale is filled with ``void_class_id`` on GT
and black on images.
"""

from __future__ import annotations

import cv2
import numpy as np


def random_crop_with_void(rng, image, gt_image, crop_hw, void_class_id):
    """Random (h, w) crop; if the crop is larger than the image in either
    dim, the image is placed at a random offset on a black/void canvas
    (reference `:268-322`)."""
    img_h, img_w = image.shape[:2]
    crop_h, crop_w = crop_hw
    y_range = img_h - crop_h
    x_range = img_w - crop_w
    y0 = rng.integers(0, abs(y_range) + 1)
    x0 = rng.integers(0, abs(x_range) + 1)

    def place(arr, fill, out_dtype):
        shape = (crop_h, crop_w) + arr.shape[2:]
        if y_range >= 0 and x_range >= 0:
            return np.copy(arr[y0 : y0 + crop_h, x0 : x0 + crop_w])
        canvas = np.full(shape, fill, dtype=out_dtype)
        if y_range >= 0:  # crop vertical, place horizontal
            patch = arr[y0 : y0 + crop_h]
            canvas[:, x0 : x0 + img_w] = patch
        elif x_range >= 0:  # crop horizontal, place vertical
            patch = arr[:, x0 : x0 + crop_w]
            canvas[y0 : y0 + img_h, :] = patch
        else:  # place both
            canvas[y0 : y0 + img_h, x0 : x0 + img_w] = arr
        return canvas

    image = place(image, 0, np.uint8)
    if gt_image is not None:
        gt_image = place(gt_image, void_class_id, gt_image.dtype)
    return image, gt_image


def fixed_crop(image, gt_image, crop):
    """Crop (top, bottom, left, right) pixels off each side (reference `:324-326`)."""
    top, bottom, left, right = crop
    h, w = image.shape[:2]
    image = np.copy(image[top : h - bottom, left : w - right])
    if gt_image is not None:
        gt_image = np.copy(gt_image[top : h - bottom, left : w - right])
    return image, gt_image


def resize_pair(image, gt_image, size_hw):
    """Bilinear for images, nearest for GT (reference `:328-331`) — nearest
    on GT is load-bearing for mIoU parity (SURVEY.md §7 hard parts)."""
    h, w = size_hw
    image = cv2.resize(image, dsize=(w, h), interpolation=cv2.INTER_LINEAR)
    if gt_image is not None:
        gt_image = cv2.resize(gt_image, dsize=(w, h), interpolation=cv2.INTER_NEAREST)
    return image, gt_image


def brightness_hsv(rng, image, lo, hi):
    """Scale the HSV V channel by U(lo, hi), overflow-clamped to 255
    (reference `_brightness`, `batch_generator.py:471-488`)."""
    hsv = cv2.cvtColor(image, cv2.COLOR_RGB2HSV)
    factor = rng.uniform(lo, hi)
    v = hsv[:, :, 2].astype(np.float64) * factor
    hsv[:, :, 2] = np.where(v > 255, 255, v).astype(hsv.dtype)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)


def horizontal_flip(image, gt_image):
    """cv2.flip(.., 1) (reference `:338-342`)."""
    image = cv2.flip(image, 1)
    if gt_image is not None:
        gt_image = cv2.flip(gt_image, 1)
    return image, gt_image


def translate(rng, image, gt_image, x_range, y_range, void_class_id):
    """Shift by +/-U{x_range} horizontally and +/-U{y_range} vertically with
    random sign, border filled black / void (reference `:344-356`)."""
    x = int(rng.integers(x_range[0], x_range[1] + 1))
    y = int(rng.integers(y_range[0], y_range[1] + 1))
    x_shift = x if rng.random() < 0.5 else -x
    y_shift = y if rng.random() < 0.5 else -y
    h, w = image.shape[:2]
    matrix = np.float32([[1, 0, x_shift], [0, 1, y_shift]])
    image = cv2.warpAffine(src=image, M=matrix, dsize=(w, h))
    if gt_image is not None:
        gt_image = cv2.warpAffine(
            src=gt_image, M=matrix, dsize=(w, h), flags=cv2.INTER_NEAREST,
            borderValue=int(void_class_id) if void_class_id is not None else 0,
        )
    return image, gt_image


def scale_zoom(rng, image, gt_image, lo, hi, void_class_id):
    """Zoom by U(lo, hi): <=1 shrinks onto a centered void canvas, >1 crops
    the center back to the original size (reference `:358-384`)."""
    img_h, img_w = image.shape[:2]
    factor = rng.uniform(lo, hi)
    sh, sw = int(img_h * factor), int(img_w * factor)
    y_off = abs(int((img_h - sh) / 2))
    x_off = abs(int((img_w - sw) / 2))

    patch = cv2.resize(image, dsize=(sw, sh), interpolation=cv2.INTER_LINEAR)
    if factor <= 1:
        canvas = np.zeros((img_h, img_w) + image.shape[2:], dtype=np.uint8)
        canvas[y_off : y_off + sh, x_off : x_off + sw] = patch
        image = canvas
    else:
        image = np.copy(patch[y_off : img_h + y_off, x_off : img_w + x_off])

    if gt_image is not None:
        gt_patch = cv2.resize(gt_image, dsize=(sw, sh), interpolation=cv2.INTER_NEAREST)
        if factor <= 1:
            canvas = np.full((img_h, img_w), void_class_id, dtype=gt_image.dtype)
            canvas[y_off : y_off + sh, x_off : x_off + sw] = gt_patch
            gt_image = canvas
        else:
            gt_image = np.copy(gt_patch[y_off : img_h + y_off, x_off : img_w + x_off])
    return image, gt_image


def grayscale(image):
    """RGB -> single-channel grayscale, keeping a channel dim (reference `:386-387`)."""
    return np.expand_dims(cv2.cvtColor(image, cv2.COLOR_RGB2GRAY), axis=2)


# ---------------------------------------------------------------------------
# Beyond-reference photometric transforms — host twins of the device set
# (ops/augment_device.py random_contrast/saturation/hue/gamma). Formulas are
# identical (float32 Rec.601 gray, round once), so the two pipelines agree to
# uint8 rounding; cross-checked in tests/test_data.py.
# ---------------------------------------------------------------------------
def _gray601(image_f32):
    return (image_f32[..., 0] * 0.299 + image_f32[..., 1] * 0.587
            + image_f32[..., 2] * 0.114)


def contrast(rng, image, lo, hi):
    """Blend toward the image's grayscale mean by f ~ U(lo, hi)."""
    f = np.float32(rng.uniform(lo, hi))
    x = image.astype(np.float32)
    mean = _gray601(x).mean(dtype=np.float32)
    return np.clip(np.round(mean + f * (x - mean)), 0, 255).astype(np.uint8)


def saturation(rng, image, lo, hi):
    """Blend toward the per-pixel grayscale by f ~ U(lo, hi)."""
    f = np.float32(rng.uniform(lo, hi))
    x = image.astype(np.float32)
    g = _gray601(x)[..., None]
    return np.clip(np.round(g + f * (x - g)), 0, 255).astype(np.uint8)


def gamma(rng, image, lo, hi):
    """Power-law ``255*(x/255)**g`` with g ~ U(lo, hi)."""
    g = np.float32(rng.uniform(lo, hi))
    x = image.astype(np.float32) / np.float32(255.0)
    return np.clip(np.round(255.0 * x**g), 0, 255).astype(np.uint8)


def hue_rotate(rng, image, max_delta):
    """Rotate hue by delta ~ U(-max_delta, max_delta) turns, S and V
    preserved (float-exact HSV round trip, same math as the device twin)."""
    delta = np.float32(rng.uniform(-max_delta, max_delta))
    x = image.astype(np.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = np.max(x, axis=-1)
    mn = np.min(x, axis=-1)
    c = mx - mn
    safe_c = np.maximum(c, np.float32(1e-12))
    h = np.where(
        c == 0, 0.0,
        np.where(mx == r, np.mod((g - b) / safe_c, 6.0),
                 np.where(mx == g, (b - r) / safe_c + 2.0,
                          (r - g) / safe_c + 4.0)))
    h = np.mod(h + delta * 6.0, 6.0)
    cx = c * (1.0 - np.abs(np.mod(h, 2.0) - 1.0))
    sector = np.floor(h).astype(np.int32)
    zeros = np.zeros_like(c)
    r1 = np.select([sector == 0, sector == 1, sector == 2, sector == 3,
                    sector == 4], [c, cx, zeros, zeros, cx], c)
    g1 = np.select([sector == 0, sector == 1, sector == 2, sector == 3,
                    sector == 4], [cx, c, c, cx, zeros], zeros)
    b1 = np.select([sector == 0, sector == 1, sector == 2, sector == 3,
                    sector == 4], [zeros, zeros, cx, c, c], cx)
    out = np.stack([r1, g1, b1], axis=-1) + mn[..., None]
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
