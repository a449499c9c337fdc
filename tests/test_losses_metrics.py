"""Loss/metric parity vs hand-computed small tensors (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np

from fcn8s_tensorflow_tpu.ops.losses import (
    mean_softmax_cross_entropy,
    softmax_cross_entropy_one_hot,
    softmax_cross_entropy_with_ids,
)
from fcn8s_tensorflow_tpu.ops.metrics import (
    confusion_matrix,
    empty_metrics_state,
    finalize_metrics,
    mean_iou_from_confusion,
    update_metrics_state,
)


def _np_softmax_ce(logits, ids):
    logits = logits - logits.max(axis=-1, keepdims=True)
    log_probs = logits - np.log(np.exp(logits).sum(axis=-1, keepdims=True))
    return -np.take_along_axis(log_probs, ids[..., None], axis=-1)[..., 0]


def test_ce_matches_numpy(rng):
    logits = rng.normal(size=(2, 4, 4, 5)).astype(np.float32)
    ids = rng.integers(0, 5, size=(2, 4, 4))
    got = np.asarray(softmax_cross_entropy_with_ids(jnp.asarray(logits), jnp.asarray(ids)))
    want = _np_softmax_ce(logits, ids)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        float(mean_softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(ids))),
        want.mean(),
        rtol=1e-5,
    )


def test_ce_one_hot_equals_ids(rng):
    logits = rng.normal(size=(3, 8, 5)).astype(np.float32)
    ids = rng.integers(0, 5, size=(3, 8))
    one_hot = np.eye(5, dtype=np.float32)[ids]
    a = np.asarray(softmax_cross_entropy_with_ids(jnp.asarray(logits), jnp.asarray(ids)))
    b = np.asarray(softmax_cross_entropy_one_hot(jnp.asarray(logits), jnp.asarray(one_hot)))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_confusion_matrix_matches_numpy(rng):
    C = 7
    pred = rng.integers(0, C, size=(3, 16, 16))
    gt = rng.integers(0, C, size=(3, 16, 16))
    got = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(gt), C))
    want = np.zeros((C, C))
    for g, p in zip(gt.ravel(), pred.ravel()):
        want[g, p] += 1
    np.testing.assert_array_equal(got, want)


def test_mean_iou_tf_semantics():
    # Hand-computed: classes 0 and 1 present, class 2 absent entirely.
    conf = jnp.asarray([[3.0, 1.0, 0.0], [1.0, 2.0, 0.0], [0.0, 0.0, 0.0]])
    # IoU0 = 3/(4+4-3)=0.6, IoU1=2/(3+3-2)=0.5; class 2 excluded from mean.
    np.testing.assert_allclose(float(mean_iou_from_confusion(conf)), (0.6 + 0.5) / 2, rtol=1e-6)


def test_streaming_accumulation(rng):
    C = 4
    state = empty_metrics_state(C)
    total_correct = 0
    total_px = 0
    losses = []
    for _ in range(3):
        pred = rng.integers(0, C, size=(2, 8, 8))
        gt = rng.integers(0, C, size=(2, 8, 8))
        loss = float(rng.normal()) ** 2
        state = update_metrics_state(
            state,
            loss=jnp.asarray(loss),
            pred_ids=jnp.asarray(pred),
            gt_ids=jnp.asarray(gt),
            num_classes=C,
        )
        total_correct += (pred == gt).sum()
        total_px += pred.size
        losses.append(loss)
    out = finalize_metrics(state)
    np.testing.assert_allclose(float(out["loss"]), np.mean(losses), rtol=1e-5)
    np.testing.assert_allclose(float(out["accuracy"]), total_correct / total_px, rtol=1e-6)
    assert int(np.asarray(state["conf_matrix"]).sum()) == total_px


def test_streaming_confusion_exact_past_2_24():
    """Integer accumulation stays bit-exact past 2^24 counts per cell —
    where a float32 running sum starts silently quantizing (VERDICT r1 #4).
    Each update adds an ODD 4,194,305 to cell (0,0); the 5th addition lands
    on an odd value above 2^24, unrepresentable in fp32."""
    C = 4
    per_update = 4_194_305  # odd, and < 2^24 so the per-batch fp32 dot is exact
    gt = jnp.zeros((1, 1, per_update), jnp.int32)
    pred = jnp.zeros((1, 1, per_update), jnp.int32)
    state = empty_metrics_state(C)
    for _ in range(5):
        state = update_metrics_state(
            state, loss=jnp.asarray(0.0), pred_ids=pred, gt_ids=gt, num_classes=C
        )
    cell = int(np.asarray(state["conf_matrix"])[0, 0])
    assert cell == 5 * per_update  # 20,971,525 — odd and > 2^24
    assert np.issubdtype(np.asarray(state["conf_matrix"]).dtype, np.integer)


def test_perfect_prediction_metrics(rng):
    C = 5
    gt = rng.integers(0, C, size=(1, 16, 16))
    state = update_metrics_state(
        empty_metrics_state(C),
        loss=jnp.asarray(0.0),
        pred_ids=jnp.asarray(gt),
        gt_ids=jnp.asarray(gt),
        num_classes=C,
    )
    out = finalize_metrics(state)
    assert float(out["accuracy"]) == 1.0
    assert float(out["mean_iou"]) == 1.0


def test_masked_update_excludes_padding(rng):
    """Batch-padding samples (mask=0) must not affect any accumulator."""
    C = 4
    pred = rng.integers(0, C, size=(4, 8, 8))
    gt = rng.integers(0, C, size=(4, 8, 8))
    mask = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    masked = update_metrics_state(
        empty_metrics_state(C), loss=jnp.asarray(1.0),
        pred_ids=jnp.asarray(pred), gt_ids=jnp.asarray(gt),
        num_classes=C, sample_mask=mask,
    )
    plain = update_metrics_state(
        empty_metrics_state(C), loss=jnp.asarray(1.0),
        pred_ids=jnp.asarray(pred[:2]), gt_ids=jnp.asarray(gt[:2]),
        num_classes=C,
    )
    for k in masked:
        np.testing.assert_allclose(np.asarray(masked[k]), np.asarray(plain[k]), rtol=1e-6)


def test_per_class_iou_hand_computed():
    from fcn8s_tensorflow_tpu.ops.metrics import per_class_iou_from_confusion

    # conf: gt rows, pred cols; row sums [3, 3, 0], col sums [4, 2, 0]
    # class0: diag 2 -> 2/(3+4-2) = 2/5; class1: diag 1 -> 1/(3+2-1) = 1/4
    # class2: absent from GT and prediction -> invalid
    conf = jnp.asarray([[2, 1, 0], [2, 1, 0], [0, 0, 0]], jnp.int32)
    iou, valid = per_class_iou_from_confusion(conf)
    np.testing.assert_allclose(np.asarray(iou), [2 / 5, 1 / 4, 0.0], rtol=1e-6)
    assert np.asarray(valid).tolist() == [True, True, False]


def test_extra_schedules():
    from fcn8s_tensorflow_tpu.engine.schedules import exponential_decay, warmup_cosine

    s = warmup_cosine(1.0, 100, warmup_steps=10, final_lr=0.1)
    assert abs(s(0) - 0.1) < 1e-9          # first warmup step: peak/10
    assert abs(s(9) - 1.0) < 1e-9          # warmup end
    assert abs(s(10) - 1.0) < 1e-9         # cosine start
    assert abs(s(100) - 0.1) < 1e-9        # decayed to final
    assert s(55) < 1.0 and s(55) > 0.1     # mid-decay
    with np.testing.assert_raises(Exception):
        warmup_cosine(1.0, 5, warmup_steps=5)

    e = exponential_decay(1.0, 10, 0.5)
    assert abs(e(0) - 1.0) < 1e-9
    assert abs(e(10) - 0.5) < 1e-9
    assert abs(e(5) - 0.5 ** 0.5) < 1e-9
    es = exponential_decay(1.0, 10, 0.5, staircase=True)
    assert abs(es(9) - 1.0) < 1e-9 and abs(es(10) - 0.5) < 1e-9


def test_polynomial_decay_schedule():
    from fcn8s_tensorflow_tpu.engine.schedules import polynomial_decay

    p = polynomial_decay(1.0, 100, power=0.9, end_lr=0.01)
    assert abs(p(0) - 1.0) < 1e-9
    assert abs(p(100) - 0.01) < 1e-9
    assert abs(p(50) - (0.01 + 0.99 * 0.5 ** 0.9)) < 1e-9
    assert p(200) == p(100)  # clamped past total_steps
    # power=1 is linear
    lin = polynomial_decay(1.0, 10, power=1.0)
    assert abs(lin(5) - 0.5) < 1e-9
    # warmup ramps linearly then hands off at the peak
    w = polynomial_decay(1.0, 110, power=0.9, warmup_steps=10)
    assert abs(w(0) - 0.1) < 1e-9
    assert abs(w(9) - 1.0) < 1e-9
    assert abs(w(60) - 0.5 ** 0.9) < 1e-9
    with np.testing.assert_raises(Exception):
        polynomial_decay(1.0, 5, warmup_steps=5)


def test_benchmark_iou_from_confusion_hand_computed():
    """Hand-computed fixture for the benchmark FP rule (FP excludes pixels
    whose GT is the void/ignored class) — reference
    `evalPixelLevelSemanticLabeling.py:229-255` bridged to trainId space."""
    import jax.numpy as jnp

    import pytest

    from fcn8s_tensorflow_tpu.ops.metrics import (
        benchmark_iou_from_confusion,
        per_class_iou_from_confusion,
    )

    # rows = GT, cols = prediction; class 0 = void
    #            pred:  0   1   2
    conf = jnp.asarray([[5, 10,  0],    # GT void: 10 px predicted class 1
                        [0, 30, 10],    # GT 1: tp=30, fn=10
                        [2,  5, 20]])   # GT 2: tp=20, fn=5(+2 pred-void fn)
    iou, valid = benchmark_iou_from_confusion(conf)
    iou, valid = [float(x) for x in iou], [bool(x) for x in valid]

    assert not valid[0]  # void never scored
    # class 1: tp=30, fn=40-30=10, fp = pred-1 px with NON-VOID GT != 1 = 5
    # (the 10 void-GT px are excluded by the benchmark rule)
    assert iou[1] == pytest.approx(30 / (30 + 10 + 5))
    # class 2: tp=20, fn=27-20=7, fp = conf[1,2] = 10
    assert iou[2] == pytest.approx(20 / (20 + 7 + 10))
    assert valid[1] and valid[2]

    # contrast: the plain (training-time) IoU counts the void-GT FPs
    plain, _ = per_class_iou_from_confusion(conf)
    assert float(plain[1]) == pytest.approx(30 / (30 + 10 + 15))
