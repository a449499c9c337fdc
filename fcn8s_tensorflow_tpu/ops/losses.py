"""Losses.

The reference loss (`/root/reference/fcn8s_tensorflow.py:250-253`) is the mean
softmax cross-entropy over every pixel (void pixels included — the modified
trainId scheme makes void a real class 0) plus L2 regularization on the
decoder kernels.

We take integer ID maps rather than one-hot tensors: the host ships uint8
labels, and the "one-hot" never materializes — CE for a hard label is
``logsumexp(logits) - logits[label]``, a pure gather + reduction that XLA
fuses into the final decoder deconv. This is both the TPU-fast and the
HBM-light formulation (a 1024x512x20 one-hot is 40 MB fp32; the ID map is
0.5 MB).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_cross_entropy_with_ids(logits, label_ids):
    """Per-pixel CE. ``logits`` (..., C) float32, ``label_ids`` (...) int.

    Numerically matches ``tf.nn.softmax_cross_entropy_with_logits`` with the
    equivalent one-hot labels.
    """
    logits = logits.astype(jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, label_ids[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return lse - picked


def mean_softmax_cross_entropy(logits, label_ids):
    """Scalar mean CE over all pixels (reference `:253` reduce_mean)."""
    return jnp.mean(softmax_cross_entropy_with_ids(logits, label_ids))


def valid_pixel_weights(label_ids, sample_mask, ignore_label: int):
    """Per-pixel 0/1 fp32 weights: zero where the GT id equals
    ``ignore_label`` (the upstream Cityscapes 255-ignore trainId scheme,
    `/root/reference/cityscapesscripts/helpers/labels_original.py:63-97`)
    or where the sample is batch padding. Shape = ``label_ids.shape``."""
    valid = (label_ids.astype(jnp.int32) != ignore_label).astype(jnp.float32)
    m = sample_mask.reshape(sample_mask.shape + (1,) * (label_ids.ndim - 1))
    return valid * m


def class_pixel_weights(label_ids, sample_mask, class_weights,
                        ignore_label: int | None = None):
    """Per-pixel fp32 weights ``class_weights[label]`` combined with the
    batch-padding sample mask and (optionally) an ignore id. The gather is
    OOB-safe: an ignore id >= num_classes picks slot 0 but is zeroed by the
    validity factor."""
    cw = jnp.asarray(class_weights, jnp.float32)
    ids = label_ids.astype(jnp.int32)
    if ignore_label is not None:
        valid = (ids != ignore_label).astype(jnp.float32)
        ids = jnp.where(ids != ignore_label, ids, 0)
    else:
        valid = 1.0
    w = cw[ids] * valid
    m = sample_mask.reshape(sample_mask.shape + (1,) * (label_ids.ndim - 1))
    return w * m


def median_frequency_class_weights(class_pixel_counts):
    """Median-frequency balancing (Eigen & Fergus 2015): weight_c =
    median(freq) / freq_c, where freq_c = pixel share of class c. Classes
    with zero pixels get weight 0 (they cannot be learned and must not blow
    up the median ratio). Returns an (C,) fp32 array for
    ``train(class_weights=...)``."""
    counts = jnp.asarray(class_pixel_counts, jnp.float32)
    total = jnp.maximum(counts.sum(), 1.0)
    freq = counts / total
    present = freq > 0
    # median over present classes only
    med = jnp.nanmedian(jnp.where(present, freq, jnp.nan))
    return jnp.where(present, med / jnp.where(present, freq, 1.0), 0.0)


def masked_mean_softmax_cross_entropy(logits, label_ids, pixel_weights):
    """Weighted-mean CE ``sum(w * ce) / max(sum(w), 1)``. Ignored labels may
    be out of range (e.g. 255 with 19 classes): the pick index is clamped to
    0 where the weight is zero, so value and gradient are exactly as if the
    pixel did not exist (no reliance on OOB-gather semantics)."""
    w = pixel_weights.astype(jnp.float32)
    safe_ids = jnp.where(w > 0, label_ids.astype(jnp.int32), 0)
    ce = softmax_cross_entropy_with_ids(logits, safe_ids)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)


def softmax_cross_entropy_one_hot(logits, one_hot_labels):
    """One-hot variant for callers that already hold one-hot labels (API
    parity with the reference's labels placeholder, `fcn8s_tensorflow.py:110`)."""
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(one_hot_labels.astype(jnp.float32) * log_probs, axis=-1)
