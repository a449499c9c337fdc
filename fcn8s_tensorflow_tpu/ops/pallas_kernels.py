"""Pallas TPU kernels for the hot non-conv ops.

Two kernels back the metric/loss path (the convs themselves are left to
XLA:TPU, which tiles them onto the MXU well — see benchmarks/):

* ``confusion_matrix_pallas`` — streaming-mIoU confusion matrix built from
  VMEM-resident per-chunk one-hots feeding the MXU. Measured on v5e: exact
  match with the XLA one-hot-matmul formulation (ops/metrics.py) but ~7x
  slower at 4M pixels (13.9 vs 2.0 ms) — XLA fuses the one-hot generation
  into the dot without materializing it in HBM, so the XLA path remains the
  framework default and this kernel is kept as a reference implementation
  and correctness cross-check.

* ``softmax_cross_entropy_pallas`` — fused CE over (pixels, C) bf16 logits
  with integer labels and a per-pixel weight. Forward is a Pallas reduction
  (measured 2.9x faster than the composite XLA formulation on v5e: 6.1 vs
  18.0 ms at 1M pixels x 20 classes); the custom-VJP backward emits
  ``(softmax - onehot) * w * g`` as plain XLA, which beat a handwritten
  Pallas backward 3x (elementwise-store-bound, no reduction to win on).

Kernels pad the class dim to the 128-lane width internally; padding classes
never match a label so the math is exact. Keep per-chunk VMEM under ~8 MB:
fp32 intermediates triple the bf16 block footprint (chunk=4096 OOMs the
16 MB scoped VMEM for the CE kernel; 2048 is safe). CPU tests run in
interpreter mode (tests/test_pallas.py); real-TPU numbers above from
in-process steady-state benchmarks.

Round-2 kernel-glue findings (v5e profile of the 8x1024x512 train step):
the CE kernel's *inputs* cost more than the kernel. Any (N, 1)-shaped
Pallas input tiles as T(8,128) with the minor dim padded 128x (s32 labels
~2.1 GB physical), the relayout into that layout costs ~3.2 ms/step, and
an explicit jnp.pad of logits 20->128 lanes materialized another ~1 GB
(`pad.0`, 3.3 ms). The per-sample fast path below eliminates every
per-pixel side input: the Pallas kernel computes ONLY the weighted
log-sum-exp sum from the unpadded (N, C) logits (Mosaic masks the partial
lane tile) with the per-sample mask in SMEM; the label-pick term is a
fused XLA compare+select+reduce over the compact (N,) labels (fusions
broadcast in-registers — no materialization). Measured: CE fwd
20.35 -> 9.10 ms, full train step 127.5 -> 112.2 ms (61.9 -> 71.3
img/s/chip). Dead ends measured, do not retry: in-kernel lanes<->sublanes
reshape of packed (N/128, 128) labels (Mosaic rejects "tpu.reshape
(16,128) -> (2048,1)"); labels as a u8 (N, 1) VMEM input (the relayout
reappears, 118 ms plateau); packed_final with this kernel (149 ms — the
packed flatten itself relayouts lane-padded data).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
DEFAULT_CHUNK = 4096  # pixels per grid step; (4096, 128) bf16 = 1 MB in VMEM


def _pad_classes(num_classes: int) -> int:
    return ((num_classes + LANES - 1) // LANES) * LANES


# ---------------------------------------------------------------------------
# confusion matrix
# ---------------------------------------------------------------------------


def _confmat_kernel(gt_ref, pred_ref, out_ref, *, c_pad: int):
    """One pixel chunk: VMEM one-hots -> MXU dot -> accumulate (C,C) output.

    The grid is sequential on TPU, so the (c_pad, c_pad) output block is
    accumulated across steps (zero-initialized at step 0).
    """
    gt = gt_ref[:].astype(jnp.int32)      # (chunk, 1)
    pred = pred_ref[:].astype(jnp.int32)  # (chunk, 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (gt.shape[0], c_pad), 1)
    gt_oh = (lanes == gt).astype(jnp.bfloat16)      # (chunk, c_pad)
    pred_oh = (lanes == pred).astype(jnp.bfloat16)  # (chunk, c_pad)
    partial_counts = jax.lax.dot_general(
        gt_oh, pred_oh,
        dimension_numbers=(((0,), (0,)), ((), ())),  # contract over pixels
        preferred_element_type=jnp.float32,
    )

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += partial_counts


def confusion_matrix_pallas(pred_ids, gt_ids, num_classes: int, *,
                            chunk: int = DEFAULT_CHUNK, interpret: bool = False):
    """(C, C) fp32 counts, rows = GT, cols = prediction.

    Inputs: integer ID maps of any shape (flattened internally). Pixels
    whose id falls outside [0, num_classes) are dropped (they match no lane).
    """
    c_pad = _pad_classes(num_classes)
    gt = gt_ids.reshape(-1, 1).astype(jnp.int32)
    pred = pred_ids.reshape(-1, 1).astype(jnp.int32)
    n = gt.shape[0]
    n_pad = ((n + chunk - 1) // chunk) * chunk
    if n_pad != n:
        # pad with an id outside the class range: contributes nothing
        pad = jnp.full((n_pad - n, 1), c_pad, jnp.int32)
        gt = jnp.concatenate([gt, pad])
        pred = jnp.concatenate([pred, pad])

    out = pl.pallas_call(
        partial(_confmat_kernel, c_pad=c_pad),
        out_shape=jax.ShapeDtypeStruct((c_pad, c_pad), jnp.float32),
        grid=(n_pad // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c_pad, c_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(gt, pred)
    return out[:num_classes, :num_classes]


# ---------------------------------------------------------------------------
# fused softmax cross-entropy (sum + count), custom VJP
# ---------------------------------------------------------------------------


def _ce_fwd_kernel(logits_ref, labels_ref, weights_ref, out_ref, *, c_pad: int, num_classes: int):
    """Per-chunk weighted CE sum: accumulate a (1, 1)-ish scalar across grid."""
    logits = logits_ref[:].astype(jnp.float32)  # (chunk, c_pad)
    labels = labels_ref[:].astype(jnp.int32)    # (chunk, 1)
    weights = weights_ref[:].astype(jnp.float32)  # (chunk, 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = lanes < num_classes
    neg_inf = jnp.asarray(-1e30, jnp.float32)
    masked = jnp.where(valid, logits, neg_inf)
    m = jnp.max(masked, axis=1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.where(valid, jnp.exp(masked - m), 0.0), axis=1, keepdims=True))
    picked = jnp.sum(jnp.where(lanes == labels, masked, 0.0), axis=1, keepdims=True)
    ce = (lse - picked) * weights  # (chunk, 1)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = 0.0  # scalar store: SMEM rejects array writes

    out_ref[0, 0] += jnp.sum(ce)


def _ce_sum_impl(flat_logits, labels2d, weights2d, *, num_classes, chunk, interpret):
    """Pad classes to the lane width and pixels to the chunk size, then run
    the Pallas reduction. Takes UNPADDED (n, C) logits."""
    c_pad = _pad_classes(num_classes)
    n = flat_logits.shape[0]
    if c_pad != num_classes:
        flat_logits = jnp.pad(flat_logits, ((0, 0), (0, c_pad - num_classes)))
    n_pad = ((n + chunk - 1) // chunk) * chunk
    if n_pad != n:
        flat_logits = jnp.pad(flat_logits, ((0, n_pad - n), (0, 0)))
        labels2d = jnp.pad(labels2d, ((0, n_pad - n), (0, 0)))
        weights2d = jnp.pad(weights2d, ((0, n_pad - n), (0, 0)))  # zero weight
    out = pl.pallas_call(
        partial(_ce_fwd_kernel, c_pad=c_pad, num_classes=num_classes),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        grid=(n_pad // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, c_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        interpret=interpret,
    )(flat_logits, labels2d, weights2d)
    return out[0, 0]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _ce_sum(flat_logits, labels2d, weights2d, num_classes, chunk, interpret):
    return _ce_sum_impl(flat_logits, labels2d, weights2d, num_classes=num_classes,
                        chunk=chunk, interpret=interpret)


def _ce_sum_fwd(flat_logits, labels2d, weights2d, num_classes, chunk, interpret):
    out = _ce_sum_impl(flat_logits, labels2d, weights2d, num_classes=num_classes,
                       chunk=chunk, interpret=interpret)
    return out, (flat_logits, labels2d, weights2d)


def _ce_sum_bwd(num_classes, chunk, interpret, residuals, g):
    """Backward as plain XLA on the UNPADDED (n, C) residuals:
    ``(softmax - onehot) * w * g``. A handwritten Pallas backward measured
    3x slower on v5e (elementwise-store-bound, nothing to win on a
    reduction-free pass), and working on padded 128-lane residuals costs
    6.4x the traffic — so the bwd stays narrow XLA."""
    flat_logits, labels2d, weights2d = residuals
    softmax = jax.nn.softmax(flat_logits.astype(jnp.float32), axis=1)
    onehot = jax.nn.one_hot(labels2d[:, 0], num_classes, dtype=jnp.float32)
    dlogits = ((softmax - onehot) * weights2d * jnp.asarray(g, jnp.float32)).astype(flat_logits.dtype)
    return dlogits, None, None


_ce_sum.defvjp(_ce_sum_fwd, _ce_sum_bwd)


# ---------------------------------------------------------------------------
# per-sample fast path (module docstring: the kernel-glue fix)
# ---------------------------------------------------------------------------


def _lse_sum_kernel(mask_ref, logits_ref, out_ref, *, pps_chunks: int):
    """Per-chunk weighted log-sum-exp sum. NO labels input: the label-pick
    term is computed outside as a fused XLA reduce over the compact (N,)
    label vector (any (N, 1)-shaped Pallas input tiles as T(8,128) with the
    minor dim padded 128x, and the relayout into it costs ~3.2 ms/step —
    while an XLA *fusion* broadcasts the compact labels in-registers for
    free). Per-SAMPLE weight from SMEM: each chunk lies inside one sample
    (pps % chunk == 0 enforced by the caller)."""
    logits = logits_ref[:].astype(jnp.float32)
    w = mask_ref[pl.program_id(0) // pps_chunks]
    m = jnp.max(logits, axis=1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=1, keepdims=True))

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = 0.0

    out_ref[0, 0] += w * jnp.sum(lse)


def _ce_sample_impl(flat_logits, labels_flat, mask, *, num_classes, pps, chunk, interpret):
    n = flat_logits.shape[0]
    lse_sum = pl.pallas_call(
        partial(_lse_sum_kernel, pps_chunks=pps // chunk),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        grid=(n // chunk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, num_classes), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        interpret=interpret,
    )(mask, flat_logits)[0, 0]
    # sum_p w(p) * logits[p, label_p]: one fused compare+select+reduce pass.
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, num_classes), 1)
    picked_px = jnp.sum(
        jnp.where(labels_flat[:, None].astype(jnp.int32) == lanes,
                  flat_logits.astype(jnp.float32), 0.0),
        axis=1,
    )
    picked = jnp.dot(mask, picked_px.reshape(mask.shape[0], pps).sum(axis=1))
    return lse_sum - picked


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _ce_sum_sample(flat_logits, labels_flat, mask, num_classes, pps, chunk, interpret):
    return _ce_sample_impl(flat_logits, labels_flat, mask, num_classes=num_classes,
                           pps=pps, chunk=chunk, interpret=interpret)


def _ce_sum_sample_fwd(flat_logits, labels_flat, mask, num_classes, pps, chunk, interpret):
    out = _ce_sample_impl(flat_logits, labels_flat, mask, num_classes=num_classes,
                          pps=pps, chunk=chunk, interpret=interpret)
    return out, (flat_logits, labels_flat, mask)


def _ce_sum_sample_bwd(num_classes, pps, chunk, interpret, residuals, g):
    """(softmax - onehot) * mask_per_sample * g as plain XLA — both the
    sample mask and the one-hot (broadcast compare against the compact
    (N,) labels) stay inside the fusion, never materialized per-pixel.

    ``_BWD_BARRIER`` (negative result, measured v5e @8x1024x512, keep
    False): XLA fuses the downstream space-to-depth relayout (the subpixel
    deconv backward wants (n, H/8, W/8, 64*C)) into this computation and
    materializes eq/sub intermediates as s32/f32 packed-layout copies
    (copy.1100/.1101/.1103, ~4.4 ms/step). An optimization_barrier pinning
    dlogits compact-bf16 first looked like a 3x-byte win but measured
    SLOWER — 114.0 vs 109.3 ms/step — because it adds a full extra
    materialization pass (168 MB write + read) the fused form never pays."""
    flat_logits, labels_flat, mask = residuals
    softmax = jax.nn.softmax(flat_logits.astype(jnp.float32), axis=1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, num_classes), 1)
    onehot = (labels_flat[:, None].astype(jnp.int32) == lanes).astype(jnp.float32)
    d = (softmax - onehot) * jnp.asarray(g, jnp.float32)
    d = d.reshape(mask.shape[0], pps, num_classes) * mask[:, None, None]
    d = d.reshape(flat_logits.shape).astype(flat_logits.dtype)
    if _BWD_BARRIER:
        d = jax.lax.optimization_barrier(d)
    return d, None, None


# Experiment toggle (read at trace time; see _ce_sum_sample_bwd docstring).
_BWD_BARRIER = False


_ce_sum_sample.defvjp(_ce_sum_sample_fwd, _ce_sum_sample_bwd)


# ---------------------------------------------------------------------------
# masked fast path (ignore_label training; VERDICT r3 #2)
# ---------------------------------------------------------------------------


# Neutral-row magnitude: for an ignored pixel the logits row is replaced by
# [NEUTRAL, 0, ..., 0] and its label by 0, so lse = NEUTRAL + log1p((C-1)e^-30)
# and picked = NEUTRAL. (C-1)e^-30 ~ 1.7e-12 underflows below f32 eps (1.2e-7)
# inside the kernel's f32 `1 + sum(exp(x - max))`, so the sum rounds to
# exactly 1.0 and the pixel's CE contribution is EXACTLY 0.0 for any
# C < ~600k classes. 30 is exactly representable in bf16.
_MASKED_NEUTRAL = 30.0


def masked_softmax_cross_entropy_pallas(logits, label_ids, sample_mask,
                                        ignore_label: int, *, chunk: int = 2048,
                                        interpret: bool = False):
    """Mean softmax CE over valid pixels only: pixels whose GT id equals
    ``ignore_label`` contribute zero loss and exactly-zero gradient, exactly
    like ``softmax_cross_entropy_pallas(logits, labels, valid_pixel_weights(...))``
    but at the UNMASKED fast path's speed.

    Design (round 4, profile-driven): ignored pixels' logit rows are
    substituted with the neutral row ``[30, 0, ..., 0]`` (and their labels
    with 0) — a substituted row's lse equals its picked logit exactly
    (see ``_MASKED_NEUTRAL``), so the pixel contributes exactly 0.0 to the
    CE sum, and the substitution's VJP (cotangent x validity) zeroes its
    gradient exactly. The UNMASKED per-sample kernel then runs unchanged;
    only the normalization swaps the all-pixel count for the weighted
    VALID count. The substitution is the arithmetic blend
    ``logits*v + neutral*(1-v)`` (exact for the 0/1 validity) rather than a
    ``jnp.where``: XLA kept the select as a standalone 3.3 ms
    broadcast_select_fusion but fuses the blend — 113.5 vs 114.8 ms/step
    measured (unmasked baseline 109.4, i.e. +3.7%). Trade-off: a non-finite
    logit at an IGNORED pixel would poison the blend (0*inf=nan) where a
    select would mask it; ignored-pixel logits are produced by the same
    convs as valid ones, so they are finite whenever training is healthy.

    Two dedicated masked-kernel designs measured worse and were removed
    (v5e @8x1024x512x19, full train step, unmasked baseline 109.7 ms):
    a 3-D (SB, 128, C) bitcast-view kernel with a compact validity plane
    ran 118.0 ms (its cross-lane lse reduce lands pixel-indexed results in
    LANES, which Mosaic relayouts per tile: the kernel alone profiled
    5.4 ms vs the 2-D unmasked kernel's 2.5); folding the label-pick
    in-kernel was slower still (13.8 vs 11.6 ms standalone v+g — padded-
    lane VPU select work exceeds the XLA pass it saves). The round-3
    dense per-pixel-weight path measured 160.7 ms.

    ``sample_mask``: (batch,) fp32 batch-padding mask (grad-accum microbatch
    weighting composes outside, as for the unmasked path).
    """
    valid = label_ids.astype(jnp.int32) != ignore_label
    v3 = valid[..., None].astype(logits.dtype)
    neutral = jnp.zeros((logits.shape[-1],), logits.dtype
                        ).at[0].set(jnp.asarray(_MASKED_NEUTRAL, logits.dtype))
    safe_logits = logits * v3 + neutral * (1 - v3)
    safe_labels = jnp.where(valid, label_ids, jnp.zeros_like(label_ids))
    mask = sample_mask.astype(jnp.float32)
    mean_all = softmax_cross_entropy_pallas(safe_logits, safe_labels, mask,
                                            chunk=chunk, interpret=interpret)
    # it normalized by sum(mask) * pixels-per-sample; renormalize to the
    # weighted VALID-pixel count (one fused pass over the compact labels)
    batch = label_ids.shape[0]
    pps = label_ids.size // batch
    denom_all = jnp.maximum(jnp.sum(mask) * pps, 1.0)
    vcount = jnp.dot(mask, valid.astype(jnp.float32).reshape(batch, pps).sum(axis=1))
    return mean_all * denom_all / jnp.maximum(vcount, 1.0)


def softmax_cross_entropy_pallas(logits, label_ids, pixel_weights=None, *,
                                 chunk: int = 2048, interpret: bool = False):
    """Weighted-mean softmax CE over (..., C) logits with integer labels.

    Drop-in for ``ops.losses.mean_softmax_cross_entropy`` with an optional
    per-pixel weight (..., broadcastable to the label shape). Differentiable
    via the custom VJP (Pallas forward, narrow-XLA backward). Returns fp32.

    Fast path (module docstring): when the weight is per-sample (None or a
    (batch,) mask) and the per-sample pixel count divides a chunk size, the
    kernel reads unpadded logits + uint8 labels and takes the mask via SMEM
    — measured 1.8x the dense-path forward at 8x1024x512x20 on v5e.
    """
    num_classes = logits.shape[-1]
    flat_logits = logits.reshape(-1, num_classes)
    n = flat_logits.shape[0]

    per_sample = pixel_weights is None or (
        pixel_weights.ndim == 1
        and label_ids.ndim >= 1
        and pixel_weights.shape[0] == label_ids.shape[0]
    )
    if per_sample:
        batch = label_ids.shape[0] if label_ids.ndim >= 1 else 1
        pps = n // batch
        for c in (chunk, 1024, 512, 256, 128):
            if pps % c == 0:
                mask = (jnp.ones((batch,), jnp.float32) if pixel_weights is None
                        else pixel_weights.astype(jnp.float32))
                labels_flat = label_ids.reshape(-1)  # compact, no relayout
                total = _ce_sum_sample(flat_logits, labels_flat, mask,
                                       num_classes, pps, c, interpret)
                return total / jnp.maximum(jnp.sum(mask) * pps, 1.0)

    labels = label_ids.reshape(-1, 1).astype(jnp.int32)
    if pixel_weights is None:
        weights = jnp.ones((n, 1), jnp.float32)
    else:
        weights = jnp.broadcast_to(
            pixel_weights.reshape(pixel_weights.shape + (1,) * (label_ids.ndim - pixel_weights.ndim)),
            label_ids.shape,
        ).reshape(-1, 1).astype(jnp.float32)

    total = _ce_sum(flat_logits, labels, weights, num_classes, chunk, interpret)
    return total / jnp.maximum(jnp.sum(weights), 1.0)
