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


def softmax_cross_entropy_one_hot(logits, one_hot_labels):
    """One-hot variant for callers that already hold one-hot labels (API
    parity with the reference's labels placeholder, `fcn8s_tensorflow.py:110`)."""
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(one_hot_labels.astype(jnp.float32) * log_probs, axis=-1)
