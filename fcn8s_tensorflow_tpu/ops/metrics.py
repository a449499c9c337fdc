"""Streaming metrics: loss / mean-IoU / pixel accuracy, TPU-resident.

The reference uses TF1 streaming metrics backed by hidden "local variables"
with a hand-rolled reset op (`/root/reference/fcn8s_tensorflow.py:273-322`).
The JAX-native design carries the accumulator state *explicitly* as a small
pytree of device arrays, updated inside the jitted step and reduced across
the mesh with ``psum`` semantics (the update runs under pjit, so XLA inserts
the collective).

The confusion matrix is computed as a one-hot matmul ``G^T @ P`` — the
MXU-shaped formulation of a 2-D histogram (a scatter-add would serialize on
TPU). Each per-batch dot accumulates in fp32, which is exact because one
update's per-cell count is bounded by the batch pixel count (≤ ~4.2e6 at
batch 8 × 1024×512, far below 2^24). The *running* accumulator is int32:
each update's fp32 result is cast to int32 before adding, so streaming
counts are bit-exact up to 2^31−1 per cell (~2.1e9 — several full
Cityscapes val epochs in the dominant class; overflow would need >4,000
all-one-class 1024×512 images in a single un-reset stream). Offline
benchmark eval uses the uint64 C++ kernel and has no such bound.

Pixel accuracy is derived from the matrix at finalize time (trace / sum),
which keeps it exactly consistent with the matrix and equally exact. This
assumes all GT ids lie in [0, num_classes) — true for both trainId schemes
(the reference trains on void as class 0 with no ignore masking,
`/root/reference/fcn8s_tensorflow.py:253`).
"""

from __future__ import annotations

import jax.numpy as jnp


def empty_metrics_state(num_classes: int) -> dict:
    """Zeroed accumulator pytree — the functional equivalent of the
    reference's ``metrics_reset_op`` (`fcn8s_tensorflow.py:306-314`)."""
    return {
        "loss_sum": jnp.zeros((), jnp.float32),
        "loss_count": jnp.zeros((), jnp.float32),
        "conf_matrix": jnp.zeros((num_classes, num_classes), jnp.int32),
    }


def confusion_matrix(pred_ids, gt_ids, num_classes: int, sample_mask=None):
    """(C, C) counts with rows = ground truth, cols = prediction, via
    one-hot matmul on the MXU. Inputs are integer ID maps of any shape.
    ``sample_mask`` (leading-dim 0/1 floats) excludes padded samples."""
    pred = pred_ids.reshape(-1)
    gt = gt_ids.reshape(-1)
    classes = jnp.arange(num_classes, dtype=jnp.int32)
    # (P, C) one-hots in bf16 are exact for 0/1 values; accumulate fp32.
    gt_oh = (gt[:, None].astype(jnp.int32) == classes).astype(jnp.bfloat16)
    if sample_mask is not None:
        px_mask = jnp.broadcast_to(
            sample_mask.reshape(sample_mask.shape + (1,) * (pred_ids.ndim - 1)), pred_ids.shape
        ).reshape(-1)
        gt_oh = gt_oh * px_mask[:, None].astype(jnp.bfloat16)
    pred_oh = (pred[:, None].astype(jnp.int32) == classes).astype(jnp.bfloat16)
    return jnp.dot(gt_oh.T, pred_oh, preferred_element_type=jnp.float32)


def update_metrics_state(
    state: dict, *, loss, pred_ids, gt_ids, num_classes: int, sample_mask=None
) -> dict:
    """One batch's worth of accumulation (the reference's
    ``metric_update_ops``, `fcn8s_tensorflow.py:284-301`). ``sample_mask``
    (N,) of 0/1 excludes batch-padding samples exactly. The per-batch fp32
    dot is exact (counts < 2^24) and is cast to int32 before adding, so the
    running matrix is bit-exact integer counts."""
    batch_counts = confusion_matrix(pred_ids, gt_ids, num_classes, sample_mask)
    return {
        "loss_sum": state["loss_sum"] + loss.astype(jnp.float32),
        "loss_count": state["loss_count"] + 1.0,
        "conf_matrix": state["conf_matrix"] + batch_counts.astype(jnp.int32),
    }


def per_class_iou_from_confusion(conf_matrix):
    """(C,) per-class IoU = diag / (row + col - diag); NaN-free: classes
    absent from both GT and prediction report 0 with an invalid flag.
    Returns (iou, valid_mask)."""
    conf = conf_matrix.astype(jnp.float32)
    diag = jnp.diagonal(conf)
    denom = conf.sum(axis=0) + conf.sum(axis=1) - diag
    valid = denom > 0
    iou = jnp.where(valid, diag / jnp.where(valid, denom, 1.0), 0.0)
    return iou, valid


def benchmark_iou_from_confusion(conf_matrix, void_class: int = 0):
    """Per-class IoU from a *trainId-space* confusion matrix under the
    Cityscapes benchmark's FP rule (reference
    `evalPixelLevelSemanticLabeling.py:229-255`): false positives exclude
    pixels whose GROUND TRUTH is an ignored class. In the modified trainId
    scheme every ignored id collapses onto ``void_class`` (labels/cityscapes.py:
    ignoreInEval <=> trainId 0), so dropping that GT row reproduces the
    benchmark rule exactly — this is the bridge that lets the streaming
    training-time matrix be compared 1:1 against the offline scorer
    (tests/test_offline_eval.py::test_closed_loop_scorer_consistency).

    Returns (iou, valid): (C,) arrays; ``void_class`` itself and classes
    absent from GT and prediction are invalid.
    """
    conf = conf_matrix.astype(jnp.float32)
    c = conf.shape[0]
    diag = jnp.diagonal(conf)
    row = conf.sum(axis=1)                 # GT pixels per class
    col_nonvoid = conf.sum(axis=0) - conf[void_class, :]  # preds on non-ignored GT
    fn = row - diag
    fp = col_nonvoid - diag
    denom = diag + fp + fn
    valid = (denom > 0) & (jnp.arange(c) != void_class)
    iou = jnp.where(valid, diag / jnp.where(valid, denom, 1.0), 0.0)
    return iou, valid


def mean_iou_from_confusion(conf_matrix):
    """``tf.metrics.mean_iou`` semantics (`fcn8s_tensorflow.py:291-293`):
    per-class IoU averaged over classes whose denominator is > 0."""
    iou, valid = per_class_iou_from_confusion(conf_matrix)
    n_valid = jnp.maximum(valid.sum(), 1)
    return iou.sum() / n_valid


def finalize_metrics(state: dict) -> dict:
    """Resolve accumulators to {'loss', 'mean_iou', 'accuracy'} scalars.
    Accuracy = trace/sum of the integer confusion matrix — exactly
    consistent with mean-IoU (all GT ids lie in [0, num_classes), see
    module docstring)."""
    conf = state["conf_matrix"].astype(jnp.float32)
    return {
        "loss": state["loss_sum"] / jnp.maximum(state["loss_count"], 1.0),
        "mean_iou": mean_iou_from_confusion(state["conf_matrix"]),
        "accuracy": jnp.trace(conf) / jnp.maximum(conf.sum(), 1.0),
    }
