"""ignore_label training (upstream Cityscapes 255-ignore trainId scheme,
`/root/reference/cityscapesscripts/helpers/labels_original.py:63-97`) — a
capability beyond the reference, which can only train the modified
void-as-class-0 scheme (`fcn8s_tensorflow.py:253`).

Covers: masked-loss math vs a hand fixture, exact-zero gradients at ignored
pixels, Pallas-dense-kernel agreement with the XLA formulation, confusion-
matrix exclusion of out-of-range GT ids, grad-accum equivalence with uneven
ignore distribution, checkpoint persistence, and the original-scheme LUTs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcn8s_tensorflow_tpu.engine.model import FCN8s
from fcn8s_tensorflow_tpu.engine.schedules import constant
from fcn8s_tensorflow_tpu.labels import (
    IDS_TO_TRAINIDS_ORIGINAL_ARRAY,
    IGNORE_LABEL,
    NUM_TRAIN_CLASSES_ORIGINAL,
    TRAINIDS_ORIGINAL_TO_IDS_ARRAY,
)
from fcn8s_tensorflow_tpu.ops.losses import (
    masked_mean_softmax_cross_entropy,
    softmax_cross_entropy_with_ids,
    valid_pixel_weights,
)
from fcn8s_tensorflow_tpu.ops.metrics import (
    confusion_matrix,
    empty_metrics_state,
    finalize_metrics,
    update_metrics_state,
)

TINY = dict(width_mult=1 / 32, fc_channels=32, compute_dtype=jnp.float32)
HW = (32, 64)


def _toy(n=2, ignore_band=True):
    rng = np.random.default_rng(7)
    images = rng.integers(0, 255, size=(n, *HW, 3), dtype=np.uint8)
    labels = np.zeros((n, *HW), np.uint8)
    labels[:, :, 21:42] = 1
    labels[:, :, 42:] = 2
    if ignore_band:
        labels[:, :8, :] = 255  # top band ignored
    return images, labels


def _repeat(images, labels):
    while True:
        yield images, labels


def test_masked_mean_hand_fixture():
    # 4 pixels, 3 classes; pixel 2 ignored (weight 0), pixel 3 batch-padded
    logits = jnp.asarray(
        [[1.0, 0.0, -1.0], [0.5, 0.5, 0.5], [9.0, 9.0, 9.0], [2.0, 0.0, 0.0]]
    ).reshape(2, 2, 1, 3)  # (N=2, H=2, W=1, C=3)
    labels = jnp.asarray([[0, 255], [1, 0]], jnp.int32).reshape(2, 2, 1)
    mask = jnp.asarray([1.0, 0.0])  # second sample is padding
    w = valid_pixel_weights(labels, mask, 255)
    np.testing.assert_array_equal(np.asarray(w).ravel(), [1, 0, 0, 0])
    got = float(masked_mean_softmax_cross_entropy(logits, labels, w))
    z = np.asarray([1.0, 0.0, -1.0])
    expected = float(np.log(np.exp(z).sum()) - z[0])  # only pixel 0 counts
    assert got == pytest.approx(expected, rel=1e-6)


def test_ignored_pixels_get_zero_gradients():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(1, 4, 4, 5)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 5, size=(1, 4, 4)), jnp.int32)
    labels = labels.at[0, 0].set(255)  # first row ignored
    mask = jnp.ones((1,), jnp.float32)
    w = valid_pixel_weights(labels, mask, 255)

    g = jax.grad(lambda lg: masked_mean_softmax_cross_entropy(lg, labels, w))(logits)
    g = np.asarray(g)
    np.testing.assert_array_equal(g[0, 0], 0.0)  # exactly zero, not small

    # valid-pixel grads equal the per-pixel CE grad / n_valid
    n_valid = float(np.asarray(w).sum())
    full = jax.grad(
        lambda lg: jnp.sum(
            softmax_cross_entropy_with_ids(lg, jnp.where(w > 0, labels, 0))
            * w
        )
    )(logits)
    np.testing.assert_allclose(g, np.asarray(full) / n_valid, rtol=1e-5, atol=1e-7)


def test_pallas_dense_path_matches_xla_with_ignore():
    from fcn8s_tensorflow_tpu.ops.pallas_kernels import softmax_cross_entropy_pallas

    rng = np.random.default_rng(11)
    logits = jnp.asarray(rng.normal(size=(2, 8, 16, 6)).astype(np.float32))
    labels = np.asarray(rng.integers(0, 6, size=(2, 8, 16)), np.int32)
    labels[0, :3] = 255
    labels = jnp.asarray(labels)
    mask = jnp.asarray([1.0, 1.0])
    w = valid_pixel_weights(labels, mask, 255)

    ref = masked_mean_softmax_cross_entropy(logits, labels, w)
    got = softmax_cross_entropy_pallas(logits, labels, w, interpret=True)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    g_ref = jax.grad(lambda lg: masked_mean_softmax_cross_entropy(lg, labels, w))(logits)
    g_got = jax.grad(
        lambda lg: softmax_cross_entropy_pallas(lg, labels, w, interpret=True)
    )(logits)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(g_got)[0, :3], 0.0)


def test_confusion_matrix_drops_out_of_range_gt():
    gt = jnp.asarray([[0, 1, 255, 2, 255, 1]], jnp.int32)
    pred = jnp.asarray([[0, 1, 1, 0, 2, 1]], jnp.int32)
    cm = np.asarray(confusion_matrix(pred, gt, 3))
    assert cm.sum() == 4  # the two 255-GT pixels contribute nothing
    expected = np.zeros((3, 3))
    expected[0, 0] = 1
    expected[1, 1] = 2
    expected[2, 0] = 1
    np.testing.assert_array_equal(cm, expected)

    # streaming accuracy over valid pixels only: 3 correct of 4
    state = empty_metrics_state(3)
    state = update_metrics_state(
        state, loss=jnp.float32(0.0), pred_ids=pred, gt_ids=gt, num_classes=3
    )
    final = finalize_metrics(state)
    assert float(final["accuracy"]) == pytest.approx(3 / 4)


def _train(model, gen, steps, **kw):
    model.train(
        train_generator=gen,
        epochs=1,
        steps_per_epoch=steps,
        learning_rate_schedule=constant(2e-3),
        keep_prob=1.0,
        metrics=set(),
        eval_frequency=10**9,
        eval_dataset="train",
        record_summaries=False,
        **kw,
    )


@pytest.mark.slow
def test_facade_trains_255_scheme_and_grad_accum_matches():
    images, labels = _toy(n=4)
    # uneven ignore coverage across the batch so microbatch weighting matters
    labels = labels.copy()
    labels[0, :16, :] = 255
    labels[1, :2, :] = 255

    models = []
    for accum in (1, 2):
        m = FCN8s(num_classes=3, ignore_label=255, seed=5, **TINY)
        _train(m, _repeat(images, labels), 1, gradient_accumulation=accum)
        models.append(m)
    p1 = jax.tree.map(np.asarray, models[0].state.params)
    p2 = jax.tree.map(np.asarray, models[1].state.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6), p1, p2
    )

    # a short training run learns the valid structure (loss decreases)
    m = FCN8s(num_classes=3, ignore_label=255, seed=0, **TINY)
    gen = _repeat(images, labels)
    _train(m, gen, 1)
    first = m.training_loss
    _train(m, gen, 25)
    assert m.training_loss < first
    vals = m.evaluate(gen, num_batches=1, metrics={"loss", "accuracy"},
                      dataset="train")
    assert np.isfinite(vals["loss"])
    assert 0.0 <= vals["accuracy"] <= 1.0


@pytest.mark.slow
def test_ignore_label_checkpoint_roundtrip(tmp_path):
    m = FCN8s(num_classes=3, ignore_label=255, **TINY)
    images, labels = _toy()
    _train(m, _repeat(images, labels), 1)
    path = str(tmp_path / "ckpt")
    m.save(path, name="ign")
    import os

    saved = os.path.join(path, os.listdir(path)[0])
    reloaded = FCN8s(model_load_dir=saved, compute_dtype=jnp.float32)
    assert reloaded.ignore_label == 255
    assert reloaded.model_config["ignore_label"] == 255


def test_original_scheme_luts():
    # road (id 7) -> 0, person (24) -> 11, car (26) -> 13, bicycle (33) -> 18
    assert IDS_TO_TRAINIDS_ORIGINAL_ARRAY[7] == 0
    assert IDS_TO_TRAINIDS_ORIGINAL_ARRAY[24] == 11
    assert IDS_TO_TRAINIDS_ORIGINAL_ARRAY[26] == 13
    assert IDS_TO_TRAINIDS_ORIGINAL_ARRAY[33] == 18
    # every void/ignored id maps to 255
    for void_id in (0, 1, 2, 3, 4, 5, 6, 9, 10, 14, 15, 16, 18, 29, 30):
        assert IDS_TO_TRAINIDS_ORIGINAL_ARRAY[void_id] == IGNORE_LABEL
    # inverse: trainId -> labelId round-trips over the 19 evaluated classes
    assert NUM_TRAIN_CLASSES_ORIGINAL == 19
    for tid in range(NUM_TRAIN_CLASSES_ORIGINAL):
        lid = TRAINIDS_ORIGINAL_TO_IDS_ARRAY[tid]
        assert IDS_TO_TRAINIDS_ORIGINAL_ARRAY[lid] == tid
