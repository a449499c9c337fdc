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
GT with ``void_class_id``; brightness scales toward the HSV-V behavior
(a uniform RGB scale with clamp — equal to HSV-V scaling for the clamp-free
region); each transform applies with its own probability per sample.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


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
    """Per-sample brightness scale by U(lo, hi), clamped to [0, 255]
    (host analog: augment.brightness_hsv; reference `:333-336,471-488`)."""
    n = images.shape[0]
    k1, k2 = jax.random.split(rng)
    apply = jax.random.uniform(k1, (n,)) >= (1.0 - prob)
    factor = jax.random.uniform(k2, (n,), minval=lo, maxval=hi)
    factor = jnp.where(apply, factor, 1.0)
    scaled = images.astype(jnp.float32) * factor[:, None, None, None]
    return jnp.clip(scaled, 0.0, 255.0).astype(images.dtype)


def random_translate(rng, images, label_ids, max_x: int, max_y: int, prob: float,
                     void_class_id: int = 0):
    """Per-sample integer translation in [-max, +max], borders filled
    black/void (host analog: augment.translate; reference `:344-356`).

    Implemented as pad-by-max + per-sample dynamic slice: static shapes, one
    gather per tensor.
    """
    n, h, w = images.shape[:3]
    k1, k2, k3 = jax.random.split(rng, 3)
    apply = jax.random.uniform(k1, (n,)) >= (1.0 - prob)
    dx = jax.random.randint(k2, (n,), -max_x, max_x + 1)
    dy = jax.random.randint(k3, (n,), -max_y, max_y + 1)
    dx = jnp.where(apply, dx, 0)
    dy = jnp.where(apply, dy, 0)

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


def make_augment_fn(
    *,
    flip: float | None = None,
    brightness: tuple | None = None,
    translate: tuple | None = None,
    crop: tuple | None = None,
    void_class_id: int = 0,
):
    """Compose a jit-safe ``(rng, images, label_ids) -> (images, label_ids)``
    pipeline in the reference's transform order (crop -> brightness -> flip ->
    translate). Options mirror ``BatchGenerator.generate``:

    * ``flip``: probability;
    * ``brightness``: (lo, hi, prob);
    * ``translate``: (max_x, max_y, prob);
    * ``crop``: (height, width).
    """

    def augment(rng, images, label_ids):
        keys = jax.random.split(rng, 4)
        if crop is not None:
            images, label_ids = random_crop(keys[0], images, label_ids, crop[0], crop[1])
        if brightness is not None:
            images = random_brightness(keys[1], images, *brightness)
        if flip is not None:
            images, label_ids = random_horizontal_flip(keys[2], images, label_ids, flip)
        if translate is not None:
            images, label_ids = random_translate(
                keys[3], images, label_ids, translate[0], translate[1], translate[2],
                void_class_id,
            )
        return images, label_ids

    return augment
