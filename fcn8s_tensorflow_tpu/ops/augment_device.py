"""Device-resident (in-jit) data augmentation.

The reference augments on the host with OpenCV, serially with the training
step (SURVEY.md §3.2). This module provides the TPU-native alternative: the
geometric/photometric transforms expressed as jit-safe JAX ops on *batches*,
so they fuse into the training step — the host ships raw uint8 images + uint8
ID maps and the augmentations cost ~zero wall-clock (VPU work overlapped with
the conv pipeline).

Static shapes are preserved by construction: flips are selects, translations
and zoom-out are pad+dynamic-slice with void fill, brightness is arithmetic.
Per-sample randomness comes from a single folded PRNG key.

Semantics mirror the host pipeline (data/augment.py): images fill with black,
GT with ``void_class_id``; each transform applies with its own probability
per sample. Every ``BatchGenerator.generate`` transform has a device twin
here: random_crop / resize / brightness (exact HSV-V) / flip / translate /
scale-zoom / grayscale — host-equivalence golden tests in
tests/test_device_augment.py.

Geometric resampling matches the host's cv2 conventions (probed empirically,
pinned by the golden tests): nearest-neighbor (GT) samples
``src = floor(dst * src_size/dst_size)``; bilinear (images) uses half-pixel
centers ``src = (dst + 0.5) * src_size/dst_size - 0.5`` with edge clamp,
agreeing with cv2's fixed-point result to +/-1. Brightness implements the
*float-exact* HSV-V scaling (per-pixel factor clamp preserves hue and
saturation even where V saturates); the residual vs the host is cv2's
integer H/S quantization only, bounded by test to max<=8 / mean<=1.

Measured cost (v5e, benchmarks/device_augment_bench.py, in-process A/B at
the headline 8x1024x512 train config): the full flip 0.5 + brightness
(0.8,1.2,0.5) + translate((0,16),(0,8),0.5) + scale(0.8,1.2,0.5) set adds
3.2 ms to the 109.4 ms train step (+2.9%; round 4 — translate∘scale fused
into one separable resample, down from 5.2 ms as two passes) — the
resample gathers dominate; flip/brightness and all four photometric
extras fuse to ~zero (+0.2 ms marginal). The reference's equivalent host
OpenCV pass is serial with the step and costs hundreds of ms per batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_axis_coords(out_positions, src_size, patch_size):
    """cv2 INTER_LINEAR half-pixel-center source coordinates for sampling a
    ``src_size``-long axis at patch positions (float), before edge clamp."""
    return (out_positions + 0.5) * (src_size / patch_size) - 0.5


def _bilinear_sample_hw(img, fy, fx, valid_y, valid_x):
    """Sample (H,W,C) float at per-axis fractional coords (separable, like
    cv2), edge-clamped; invalid output rows/cols become 0 (black)."""
    h, w = img.shape[:2]
    arr = img.astype(jnp.float32)
    yf = jnp.clip(fy, 0.0, h - 1.0)
    y0 = jnp.floor(yf).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    wy = (yf - y0)[:, None, None]
    rows = jnp.take(arr, y0, axis=0) * (1.0 - wy) + jnp.take(arr, y1, axis=0) * wy
    xf = jnp.clip(fx, 0.0, w - 1.0)
    x0 = jnp.floor(xf).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wx = (xf - x0)[None, :, None]
    out = jnp.take(rows, x0, axis=1) * (1.0 - wx) + jnp.take(rows, x1, axis=1) * wx
    out = jnp.round(out)
    mask = (valid_y[:, None] & valid_x[None, :])[..., None]
    return jnp.where(mask, out, 0.0)


def _nearest_sample_hw(arr, iy, ix, valid_y, valid_x, fill):
    """Sample (H,W) int at per-axis integer coords; invalid -> ``fill``."""
    h, w = arr.shape[:2]
    y = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
    x = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
    out = jnp.take(jnp.take(arr, y, axis=0), x, axis=1)
    mask = valid_y[:, None] & valid_x[None, :]
    return jnp.where(mask, out, jnp.asarray(fill, arr.dtype))


def random_horizontal_flip(rng, images, label_ids, prob: float):
    """Per-sample horizontal flip with probability ``prob``
    (host analog: augment.horizontal_flip; reference `batch_generator.py:338-342`)."""
    n = images.shape[0]
    flip = jax.random.uniform(rng, (n,)) >= (1.0 - prob)
    flipped_img = images[:, :, ::-1]
    out_img = jnp.where(flip[:, None, None, None], flipped_img, images)
    out_lbl = None
    if label_ids is not None:
        out_lbl = jnp.where(flip[:, None, None], label_ids[:, :, ::-1], label_ids)
    return out_img, out_lbl


def random_brightness(rng, images, lo: float, hi: float, prob: float):
    """Per-sample *exact HSV-V* brightness by U(lo, hi) (host analog:
    augment.brightness_hsv; reference `:333-336,471-488`).

    Scaling V in HSV with H,S fixed is mathematically a uniform RGB scale
    — until V clamps at 255. There the host keeps hue/saturation and caps
    only V; a naive ``clip(rgb*factor)`` instead drives clamped pixels
    toward white. This implements the float-exact HSV semantics in three
    VPU ops, no explicit color-space conversion needed:

        V  = max(R,G,B)
        V' = floor(min(V*factor, 255))     # floor: the host truncates via
                                           # uint8 astype on the V channel
        out = round(RGB * V'/V)

    which preserves H and S exactly for every pixel, clamped or not. The
    only residual vs the host is cv2's integer H (0..180) / S (0..255)
    quantization, bounded by tests/test_device_augment.py to max<=8,
    mean<=1 per channel.
    """
    # same (apply, factor) stream as the other photometric transforms
    # (byte-identical to the pre-helper draws — pinned by the golden tests)
    factor = _photometric_draw(rng, images.shape[0], lo, hi, prob, 1.0)
    rgb = images.astype(jnp.float32)
    v = jnp.max(rgb, axis=-1, keepdims=True)
    v_new = jnp.floor(jnp.minimum(v * factor[:, None, None, None], 255.0))
    scale = jnp.where(v > 0, v_new / jnp.maximum(v, 1.0), 0.0)
    return jnp.clip(jnp.round(rgb * scale), 0.0, 255.0).astype(images.dtype)


def _draw_translate(rng, n, x_spec, y_spec, prob):
    """The translate fns' shared draw stream (split count and order are part
    of the random contract — seeded pipelines must reproduce byte-identically
    whether the standalone or the fused op consumes the key)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)

    def draw(key, spec, sign_key):
        if isinstance(spec, (tuple, list)):
            lo, hi = int(spec[0]), int(spec[1])
            mag = jax.random.randint(key, (n,), lo, hi + 1)
            sign = jnp.where(jax.random.uniform(sign_key, (n,)) < 0.5, 1, -1)
            return mag * sign, hi
        m = int(spec)
        return jax.random.randint(key, (n,), -m, m + 1), m

    apply = jax.random.uniform(k1, (n,)) >= (1.0 - prob)
    dx, max_x = draw(k2, x_spec, k4)
    dy, max_y = draw(k3, y_spec, jax.random.fold_in(k4, 1))
    return jnp.where(apply, dx, 0), jnp.where(apply, dy, 0), max_x, max_y


def random_translate(rng, images, label_ids, x_spec, y_spec, prob: float,
                     void_class_id: int = 0):
    """Per-sample integer translation, borders filled black/void (host
    analog: augment.translate; reference `:344-356`).

    ``x_spec``/``y_spec`` accept both forms:

    * an int ``m`` — shift drawn uniformly from [-m, +m] (legacy device
      form);
    * a ``(lo, hi)`` tuple — host/reference semantics: magnitude drawn
      uniformly from {lo..hi}, then a random sign, so |shift| >= lo.

    Implemented as pad-by-max + per-sample dynamic slice: static shapes, one
    gather per tensor. When ``scale`` is also enabled, ``make_augment_fn``
    instead routes both through ``random_translate_scale`` (one fused
    resample — the shift folds into the scale gather's taps for free).
    """
    n, h, w = images.shape[:3]
    dx, dy, max_x, max_y = _draw_translate(rng, n, x_spec, y_spec, prob)

    def shift_one(img, lbl, sx, sy):
        img_p = jnp.pad(img, ((max_y, max_y), (max_x, max_x), (0, 0)))
        start = (max_y - sy, max_x - sx, 0)
        img_o = jax.lax.dynamic_slice(img_p, start, (h, w, img.shape[2]))
        lbl_o = None
        if lbl is not None:
            lbl_p = jnp.pad(lbl, ((max_y, max_y), (max_x, max_x)),
                            constant_values=void_class_id)
            lbl_o = jax.lax.dynamic_slice(lbl_p, start[:2], (h, w))
        return img_o, lbl_o

    if label_ids is None:
        out_img = jax.vmap(lambda i, sx, sy: shift_one(i, None, sx, sy)[0])(images, dx, dy)
        return out_img, None
    out_img, out_lbl = jax.vmap(lambda i, l, sx, sy: shift_one(i, l, sx, sy))(
        images, label_ids, dx, dy
    )
    return out_img, out_lbl


def random_crop(rng, images, label_ids, crop_h: int, crop_w: int):
    """Per-sample random crop to (crop_h, crop_w) <= (H, W)
    (host analog: augment.random_crop_with_void, smaller-crop case;
    reference `:268-322`)."""
    n, h, w = images.shape[:3]
    if crop_h > h or crop_w > w:
        raise ValueError("device random_crop requires crop <= image; use the host "
                         "pipeline's pad-onto-void path for enlarging crops")
    k1, k2 = jax.random.split(rng)
    y0 = jax.random.randint(k1, (n,), 0, h - crop_h + 1)
    x0 = jax.random.randint(k2, (n,), 0, w - crop_w + 1)

    def crop_one(img, lbl, y, x):
        img_o = jax.lax.dynamic_slice(img, (y, x, 0), (crop_h, crop_w, img.shape[2]))
        lbl_o = jax.lax.dynamic_slice(lbl, (y, x), (crop_h, crop_w)) if lbl is not None else None
        return img_o, lbl_o

    if label_ids is None:
        return jax.vmap(lambda i, y, x: crop_one(i, None, y, x)[0])(images, y0, x0), None
    return jax.vmap(crop_one)(images, label_ids, y0, x0)


def _draw_scale(rng, n, lo, hi, prob):
    """The scale fns' shared draw stream (see ``_draw_translate``)."""
    k1, k2 = jax.random.split(rng)
    apply = jax.random.uniform(k1, (n,)) >= (1.0 - prob)
    factor = jax.random.uniform(k2, (n,), minval=lo, maxval=hi)
    return jnp.where(apply, factor, 1.0)


def _scale_axis(size, f):
    """Per-axis inverse-map coordinates for the zoom (see ``random_scale``).

    Nearest (GT): exact rational floor(p*size/patch) via int math —
    cv2 instead computes floor(p * double(1/(patch/size))), identical
    everywhere EXCEPT at exact-integer boundaries (p*size % patch == 0)
    where its one-ulp-low reciprocal can land one source pixel lower.
    The exact form is the documented behavior; the tie divergence is
    bounded by test (a few columns per image at rational factors,
    measure-zero for continuous U(lo,hi) draws)."""
    patch = jnp.floor(size * f).astype(jnp.int32)  # host: int(size*factor)
    off = jnp.abs(size - patch) // 2
    o = jnp.arange(size, dtype=jnp.int32)
    p = o - jnp.where(patch <= size, off, -off)  # patch coord of this px
    valid = (p >= 0) & (p <= patch - 1)
    isrc = (p * size) // jnp.maximum(patch, 1)
    patch_f = patch.astype(jnp.float32)
    return (_bilinear_axis_coords(p.astype(jnp.float32), size, patch_f),
            isrc, valid)


def random_translate_scale(rng_translate, rng_scale, images, label_ids,
                           x_spec, y_spec, t_prob: float,
                           s_lo: float, s_hi: float, s_prob: float,
                           void_class_id: int = 0):
    """Fused translate -> scale: ONE separable resample instead of two passes.

    Byte-identical to ``random_scale(.., *random_translate(..))`` — including
    the random draws, which consume the two keys exactly as the standalone
    ops do. The fusion works because the translation is an INTEGER shift:
    ``scale(shift(img))[o]`` samples the shifted image x2 at taps y in
    x2-space, and ``x2[y] = img[y - dy]`` (black/void outside) — so the
    shift folds into the scale gather's tap indices, with per-tap validity
    reproducing the translated border's black bleed into the bilinear
    (round 4; kills random_translate's pad + dynamic-slice materializations,
    the dominant cost of the geometric set per the round-3 profile).
    """
    n, h, w = images.shape[:3]
    dx, dy, _, _ = _draw_translate(rng_translate, n, x_spec, y_spec, t_prob)
    factor = _draw_scale(rng_scale, n, s_lo, s_hi, s_prob)

    def one(img, lbl, sx, sy, f):
        fy, iy, vy = _scale_axis(h, f)
        fx, ix, vx = _scale_axis(w, f)

        # --- bilinear (images): taps shifted into source space, invalid
        # taps contribute 0 (the translated border is black) ---
        yf = jnp.clip(fy, 0.0, h - 1.0)
        y0 = jnp.floor(yf).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, h - 1)
        wy = (yf - y0)[:, None, None]

        def ytap(yi):
            ys = yi - sy
            v = ((ys >= 0) & (ys <= h - 1)).astype(jnp.float32)[:, None, None]
            return jnp.take(img, jnp.clip(ys, 0, h - 1), axis=0
                            ).astype(jnp.float32) * v

        rows = ytap(y0) * (1.0 - wy) + ytap(y1) * wy
        xf = jnp.clip(fx, 0.0, w - 1.0)
        x0 = jnp.floor(xf).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, w - 1)
        wx = (xf - x0)[None, :, None]

        def xtap(xi):
            xs = xi - sx
            v = ((xs >= 0) & (xs <= w - 1)).astype(jnp.float32)[None, :, None]
            return jnp.take(rows, jnp.clip(xs, 0, w - 1), axis=1) * v

        img_f = jnp.round(xtap(x0) * (1.0 - wx) + xtap(x1) * wx)
        mask = (vy[:, None] & vx[None, :])[..., None]
        img_o = jnp.where(mask, img_f, 0.0).astype(images.dtype)

        # --- nearest (GT): composed index + composed validity -> void ---
        lbl_o = None
        if lbl is not None:
            ys = jnp.clip(iy, 0, h - 1) - sy
            xs = jnp.clip(ix, 0, w - 1) - sx
            ty = (ys >= 0) & (ys <= h - 1)
            tx = (xs >= 0) & (xs <= w - 1)
            out = jnp.take(jnp.take(lbl, jnp.clip(ys, 0, h - 1), axis=0),
                           jnp.clip(xs, 0, w - 1), axis=1)
            lmask = (vy & ty)[:, None] & (vx & tx)[None, :]
            lbl_o = jnp.where(lmask, out, jnp.asarray(void_class_id, lbl.dtype))
        return img_o, lbl_o

    if label_ids is None:
        out_img = jax.vmap(lambda i, sx, sy, f: one(i, None, sx, sy, f)[0])(
            images, dx, dy, factor)
        return out_img, None
    return jax.vmap(one)(images, label_ids, dx, dy, factor)


def random_scale(rng, images, label_ids, lo: float, hi: float, prob: float,
                 void_class_id: int = 0):
    """Per-sample zoom by U(lo, hi) (host analog: augment.scale_zoom;
    reference `:358-384`): factor <= 1 shrinks the frame onto a centered
    black/void canvas, factor > 1 center-crops the enlarged frame back to
    the original size. Output shape equals input shape by construction.

    Formulated as one inverse-coordinate-map gather instead of the host's
    resize-then-paste: for output pixel o, the patch coordinate is
    ``p = o -/+ floor(|size - patch|/2)`` (patch = floor(size*factor), the
    host's ``int(img_h*factor)``), sampled bilinearly (images) / nearest
    (GT) with out-of-patch pixels filled black/void. Static shapes under
    jit for any traced per-sample factor.
    """
    n, h, w = images.shape[:3]
    factor = _draw_scale(rng, n, lo, hi, prob)

    def one(img, lbl, f):
        fy, iy, vy = _scale_axis(h, f)
        fx, ix, vx = _scale_axis(w, f)
        img_o = _bilinear_sample_hw(img, fy, fx, vy, vx).astype(images.dtype)
        lbl_o = None
        if lbl is not None:
            lbl_o = _nearest_sample_hw(lbl, iy, ix, vy, vx, void_class_id)
        return img_o, lbl_o

    if label_ids is None:
        out_img = jax.vmap(lambda i, f: one(i, None, f)[0])(images, factor)
        return out_img, None
    return jax.vmap(one)(images, label_ids, factor)


def _cv2_nearest_indices(dst: int, src: int):
    """cv2 INTER_NEAREST source indices for a static resize, emulating its
    double arithmetic exactly: ``min(floor(d * (1/(dst/src))), src-1)``.
    Probed bit-exact against cv2.resize across up/down-scales incl. the
    tie-point pairs (40->52, 56->72, 100->130) where the naive
    floor(d*src/dst) differs."""
    ifx = 1.0 / (dst / src)
    return jnp.asarray(
        np.minimum(np.floor(np.arange(dst) * ifx), src - 1).astype(np.int32))


def resize(images, label_ids, size_hw):
    """Batch resize to a static (h, w): bilinear for images, nearest for GT
    (host analog: augment.resize_pair; reference `:328-331` — nearest on GT
    is load-bearing for mIoU parity). The target is static, so the source
    coordinates are precomputed on host in float64 with cv2's exact
    arithmetic: GT output is bit-identical to the host pipeline; images
    agree to +/-1 (cv2's fixed-point blend vs float32)."""
    h_out, w_out = int(size_hw[0]), int(size_hw[1])
    n, h, w = images.shape[:3]
    # bilinear coords in double, like cv2's inv-scale computation
    fy = jnp.asarray(((np.arange(h_out) + 0.5) * (h / h_out) - 0.5).astype(np.float32))
    fx = jnp.asarray(((np.arange(w_out) + 0.5) * (w / w_out) - 0.5).astype(np.float32))
    all_y = jnp.ones((h_out,), bool)
    all_x = jnp.ones((w_out,), bool)
    out_img = jax.vmap(
        lambda im: _bilinear_sample_hw(im, fy, fx, all_y, all_x).astype(images.dtype)
    )(images)
    out_lbl = None
    if label_ids is not None:
        iy = _cv2_nearest_indices(h_out, h)
        ix = _cv2_nearest_indices(w_out, w)
        out_lbl = jax.vmap(
            lambda lb: _nearest_sample_hw(lb, iy, ix, all_y, all_x, 0)
        )(label_ids)
    return out_img, out_lbl


def grayscale(images):
    """RGB -> single-channel grayscale, keeping a channel dim (host analog:
    augment.grayscale; reference `:386-387`). Bit-exact with
    ``cv2.COLOR_RGB2GRAY``: the same Q14 fixed-point weights
    (R*4899 + G*9617 + B*1868 + 8192) >> 14."""
    r = images[..., 0].astype(jnp.int32)
    g = images[..., 1].astype(jnp.int32)
    b = images[..., 2].astype(jnp.int32)
    y = (r * 4899 + g * 9617 + b * 1868 + (1 << 13)) >> 14
    return y.astype(images.dtype)[..., None]


def _gray601(rgb_f32):
    """Per-pixel Rec.601 luminance, float (the weights cv2/torchvision use
    for photometric blending)."""
    return (rgb_f32[..., 0] * 0.299 + rgb_f32[..., 1] * 0.587
            + rgb_f32[..., 2] * 0.114)


def _photometric_draw(rng, n, lo, hi, prob, identity):
    """(apply?, factor) draws shared by the photometric extras: factor ~
    U(lo, hi) per sample, ``identity`` where the transform doesn't fire."""
    k1, k2 = jax.random.split(rng)
    apply = jax.random.uniform(k1, (n,)) >= (1.0 - prob)
    f = jax.random.uniform(k2, (n,), minval=lo, maxval=hi)
    return jnp.where(apply, f, identity)


def random_contrast(rng, images, lo: float, hi: float, prob: float):
    """Per-sample contrast by f ~ U(lo, hi): blend toward the per-image
    grayscale mean, ``out = round(mean + f*(x - mean))`` — torchvision
    ``adjust_contrast``-STYLE semantics (beyond the reference's transform
    set). Not bit-identical to torchvision's uint8 path, which truncates
    the grayscale intermediate to uint8 before blending (differences up
    to ~2 LSB); this keeps the Rec.601 gray in float and rounds once —
    the exact formula is pinned by tests/test_device_augment.py."""
    f = _photometric_draw(rng, images.shape[0], lo, hi, prob, 1.0)
    rgb = images.astype(jnp.float32)
    mean = jnp.mean(_gray601(rgb), axis=(1, 2))[:, None, None, None]
    out = mean + f[:, None, None, None] * (rgb - mean)
    return jnp.clip(jnp.round(out), 0.0, 255.0).astype(images.dtype)


def random_saturation(rng, images, lo: float, hi: float, prob: float):
    """Per-sample saturation by f ~ U(lo, hi): blend toward the per-PIXEL
    grayscale, ``out = round(gray + f*(x - gray))`` — torchvision
    ``adjust_saturation``-STYLE semantics (beyond the reference; same
    float-gray-then-round caveat as ``random_contrast``: torchvision's
    uint8 path differs by up to ~2 LSB)."""
    f = _photometric_draw(rng, images.shape[0], lo, hi, prob, 1.0)
    rgb = images.astype(jnp.float32)
    gray = _gray601(rgb)[..., None]
    out = gray + f[:, None, None, None] * (rgb - gray)
    return jnp.clip(jnp.round(out), 0.0, 255.0).astype(images.dtype)


def random_gamma(rng, images, lo: float, hi: float, prob: float):
    """Per-sample gamma by g ~ U(lo, hi): ``out = round(255*(x/255)**g)``
    (beyond the reference)."""
    g = _photometric_draw(rng, images.shape[0], lo, hi, prob, 1.0)
    x = images.astype(jnp.float32) / 255.0
    out = 255.0 * jnp.power(x, g[:, None, None, None])
    return jnp.clip(jnp.round(out), 0.0, 255.0).astype(images.dtype)


def random_label_noise(rng, label_ids, rate: float, block: int,
                       num_classes: int):
    """Per-BLOCK random label replacement (DisturbLabel-style regularization,
    beyond the reference): with probability ``rate`` per ``block``x``block``
    tile, the tile's GT ids are replaced by one uniform draw from
    [0, num_classes).

    Two uses:

    * regularization — iid label noise bounds the optimal classifier's
      confidence, so Adam's logit growth on (near-)separable data is bounded
      at the noise floor's log-odds instead of growing ~lr/step without
      bound (measured: TODO.md round-4 findings (a));
    * the endurance workload's noise carrier — applied here, *after* the
      geometric transforms, the noise also covers augment-created void
      borders (translate/scale fill: black image, label 0), which are
      otherwise perfectly-separable noise-free pixels that defeat a
      host-side (pre-augment) noise pass (TODO.md round-4 findings (b)).

    Drawing per block (not per pixel) is statistically the same unlearnable
    regularizer at 1/block**2 the RNG cost; block=1 gives pixel-iid noise.
    Labels only — images pass through untouched. Expected observed flip
    rate is ``rate * (num_classes-1)/num_classes`` (a draw can equal the
    original label).
    """
    n, h, w = label_ids.shape
    bh = -(-h // block)
    bw = -(-w // block)
    k1, k2 = jax.random.split(rng)
    flip = jax.random.uniform(k1, (n, bh, bw)) < rate
    vals = jax.random.randint(k2, (n, bh, bw), 0, num_classes
                              ).astype(label_ids.dtype)
    flip_full = jnp.repeat(jnp.repeat(flip, block, 1), block, 2)[:, :h, :w]
    vals_full = jnp.repeat(jnp.repeat(vals, block, 1), block, 2)[:, :h, :w]
    return jnp.where(flip_full, vals_full, label_ids)


def random_hue(rng, images, max_delta: float, prob: float):
    """Per-sample hue rotation by delta ~ U(-max_delta, max_delta) turns
    (1.0 = full circle) — float-exact HSV round trip with V and S
    preserved, vectorized on the VPU (beyond the reference; matches a
    ``colorsys`` rgb_to_hsv -> +delta -> hsv_to_rgb loop to uint8
    rounding, pinned by tests/test_device_augment.py)."""
    delta = _photometric_draw(rng, images.shape[0], -max_delta, max_delta,
                              prob, 0.0)
    rgb = images.astype(jnp.float32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = mx - mn
    safe_c = jnp.maximum(c, 1e-12)
    # hue in sectors [0, 6): r-major, then g-major, then b-major (colorsys
    # tie priority)
    h = jnp.where(
        c == 0.0, 0.0,
        jnp.where(mx == r, jnp.mod((g - b) / safe_c, 6.0),
                  jnp.where(mx == g, (b - r) / safe_c + 2.0,
                            (r - g) / safe_c + 4.0)))
    h = jnp.mod(h + delta[:, None, None] * 6.0, 6.0)
    # back to RGB with the same V (= mx) and chroma
    x = c * (1.0 - jnp.abs(jnp.mod(h, 2.0) - 1.0))
    sector = jnp.floor(h).astype(jnp.int32)
    zeros = jnp.zeros_like(c)
    r1 = jnp.select([sector == 0, sector == 1, sector == 2, sector == 3,
                     sector == 4], [c, x, zeros, zeros, x], c)
    g1 = jnp.select([sector == 0, sector == 1, sector == 2, sector == 3,
                     sector == 4], [x, c, c, x, zeros], zeros)
    b1 = jnp.select([sector == 0, sector == 1, sector == 2, sector == 3,
                     sector == 4], [zeros, zeros, x, c, c], x)
    out = jnp.stack([r1, g1, b1], axis=-1) + mn[..., None]
    return jnp.clip(jnp.round(out), 0.0, 255.0).astype(images.dtype)


# module-level alias: make_augment_fn's `resize` parameter (named for API
# parity with BatchGenerator.generate) shadows the function above
_resize_batch = resize


def make_augment_fn(
    *,
    flip: float | None = None,
    brightness: tuple | None = None,
    translate: tuple | None = None,
    crop: tuple | None = None,
    resize: tuple | None = None,
    scale: tuple | None = None,
    gray: bool = False,
    contrast: tuple | None = None,
    saturation: tuple | None = None,
    hue: tuple | None = None,
    gamma: tuple | None = None,
    label_noise: tuple | None = None,
    void_class_id: int = 0,
):
    """Compose a jit-safe ``(rng, images, label_ids) -> (images, label_ids)``
    pipeline in the reference's transform order (`batch_generator.py:268-387`:
    crop -> resize -> brightness -> flip -> translate -> scale -> gray).
    Options mirror ``BatchGenerator.generate``:

    * ``crop``: (height, width) random crop (crop <= image);
    * ``resize``: (height, width) static target;
    * ``brightness``: (lo, hi, prob) — exact HSV-V scaling;
    * ``flip``: probability;
    * ``translate``: (x_spec, y_spec, prob), each spec an int max or a
      host-style (lo, hi) magnitude range;
    * ``scale``: (lo, hi, prob) zoom with void fill / center crop;
    * ``gray``: cv2-exact grayscale (output becomes single-channel — the
      model must be built for 1 input channel, as with the host pipeline).

    Beyond-reference photometric extras (applied after ``brightness``, in
    this order, before the geometric transforms):

    * ``contrast`` / ``saturation``: (lo, hi, prob) torchvision-semantics
      blends toward the image-mean / per-pixel grayscale;
    * ``hue``: (max_delta, prob) hue rotation in turns (S and V exact);
    * ``gamma``: (lo, hi, prob) power-law ``255*(x/255)**g``;
    * ``label_noise``: (rate, block, num_classes) DisturbLabel-style random
      GT replacement — applied LAST, after the geometric transforms, so
      augment-created void borders carry the noise too (see
      ``random_label_noise``). Labels only.
    """
    # split count is part of the random stream: stay at the legacy 5 keys
    # unless a photometric extra is enabled, so existing seeded pipelines
    # reproduce byte-identically; enabling label_noise appends a 6th/10th
    # key (a NEW random stream — only configs without it are stream-stable)
    n_keys = 9 if any(o is not None
                      for o in (contrast, saturation, hue, gamma)) else 5
    noise_key_idx = n_keys if label_noise is not None else None
    if label_noise is not None:
        n_keys += 1

    def augment(rng, images, label_ids):
        keys = jax.random.split(rng, n_keys)
        if crop is not None:
            images, label_ids = random_crop(keys[0], images, label_ids, crop[0], crop[1])
        if resize is not None:
            images, label_ids = _resize_batch(images, label_ids, resize)
        if brightness is not None:
            images = random_brightness(keys[1], images, *brightness)
        if contrast is not None:
            images = random_contrast(keys[5], images, *contrast)
        if saturation is not None:
            images = random_saturation(keys[6], images, *saturation)
        if hue is not None:
            images = random_hue(keys[7], images, *hue)
        if gamma is not None:
            images = random_gamma(keys[8], images, *gamma)
        if flip is not None:
            images, label_ids = random_horizontal_flip(keys[2], images, label_ids, flip)
        if translate is not None and scale is not None:
            # one fused resample; byte-identical draws and outputs to the
            # sequential pair (random_translate_scale docstring)
            images, label_ids = random_translate_scale(
                keys[3], keys[4], images, label_ids,
                translate[0], translate[1], translate[2],
                scale[0], scale[1], scale[2], void_class_id,
            )
        elif translate is not None:
            images, label_ids = random_translate(
                keys[3], images, label_ids, translate[0], translate[1], translate[2],
                void_class_id,
            )
        elif scale is not None:
            images, label_ids = random_scale(
                keys[4], images, label_ids, scale[0], scale[1], scale[2], void_class_id
            )
        if gray:
            images = grayscale(images)
        if label_noise is not None and label_ids is not None:
            label_ids = random_label_noise(keys[noise_key_idx], label_ids,
                                           *label_noise)
        return images, label_ids

    return augment
