"""Streaming metrics: loss / mean-IoU / pixel accuracy, TPU-resident.

The reference uses TF1 streaming metrics backed by hidden "local variables"
with a hand-rolled reset op (`/root/reference/fcn8s_tensorflow.py:273-322`).
The JAX-native design carries the accumulator state *explicitly* as a small
pytree of device arrays, updated inside the jitted step and reduced across
the mesh with ``psum`` semantics (the update runs under pjit, so XLA inserts
the collective).

The confusion matrix is computed as a one-hot matmul ``G^T @ P`` — the
MXU-shaped formulation of a 2-D histogram (a scatter-add would serialize on
TPU). fp32 accumulation is exact up to 2^24 counts per cell per update; the
running accumulator is float64-on-host / float32-on-device, which at one
Cityscapes epoch (~3e9 pixels spread over 400 cells) stays exact because each
*update* is small and the running sum is promoted to fp32 integers well below
2^24 per step — for eval-scale runs this is exact; offline benchmark eval
uses the uint64 C++ kernel.
"""

from __future__ import annotations

import jax.numpy as jnp


def empty_metrics_state(num_classes: int) -> dict:
    """Zeroed accumulator pytree — the functional equivalent of the
    reference's ``metrics_reset_op`` (`fcn8s_tensorflow.py:306-314`)."""
    return {
        "loss_sum": jnp.zeros((), jnp.float32),
        "loss_count": jnp.zeros((), jnp.float32),
        "conf_matrix": jnp.zeros((num_classes, num_classes), jnp.float32),
        "correct": jnp.zeros((), jnp.float32),
        "total": jnp.zeros((), jnp.float32),
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
    (N,) of 0/1 excludes batch-padding samples exactly."""
    if sample_mask is None:
        n_px = jnp.asarray(pred_ids.size, jnp.float32)
        correct = jnp.sum((pred_ids == gt_ids).astype(jnp.float32))
    else:
        px_per_sample = pred_ids.size // pred_ids.shape[0]
        n_px = jnp.sum(sample_mask) * px_per_sample
        mask = sample_mask.reshape(sample_mask.shape + (1,) * (pred_ids.ndim - 1))
        correct = jnp.sum((pred_ids == gt_ids).astype(jnp.float32) * mask)
    return {
        "loss_sum": state["loss_sum"] + loss.astype(jnp.float32),
        "loss_count": state["loss_count"] + 1.0,
        "conf_matrix": state["conf_matrix"]
        + confusion_matrix(pred_ids, gt_ids, num_classes, sample_mask),
        "correct": state["correct"] + correct,
        "total": state["total"] + n_px,
    }


def mean_iou_from_confusion(conf_matrix):
    """``tf.metrics.mean_iou`` semantics (`fcn8s_tensorflow.py:291-293`):
    per-class IoU = diag / (row + col - diag), averaged over classes whose
    denominator is > 0."""
    conf = conf_matrix.astype(jnp.float32)
    diag = jnp.diagonal(conf)
    denom = conf.sum(axis=0) + conf.sum(axis=1) - diag
    valid = denom > 0
    iou = jnp.where(valid, diag / jnp.where(valid, denom, 1.0), 0.0)
    n_valid = jnp.maximum(valid.sum(), 1)
    return iou.sum() / n_valid


def finalize_metrics(state: dict) -> dict:
    """Resolve accumulators to {'loss', 'mean_iou', 'accuracy'} scalars."""
    return {
        "loss": state["loss_sum"] / jnp.maximum(state["loss_count"], 1.0),
        "mean_iou": mean_iou_from_confusion(state["conf_matrix"]),
        "accuracy": state["correct"] / jnp.maximum(state["total"], 1.0),
    }
