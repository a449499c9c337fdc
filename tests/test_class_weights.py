"""Class-weighted loss (median-frequency balancing) — a capability beyond
the reference (`/root/reference/fcn8s_tensorflow.py:250-253` is an unweighted
pixel mean). The loss becomes sum(w[label]*ce)/sum(w[label]) with w a
per-class vector; composes with ignore_label and rides the same dense
per-pixel-weight CE path (XLA and the Pallas kernel).

Covers: weight-vector construction (hand fixtures, zero-count classes),
weighted-mean math vs a hand fixture, ignore composition, Pallas agreement,
grad-accum equivalence under class imbalance, and facade validation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcn8s_tensorflow_tpu.engine.model import FCN8s
from fcn8s_tensorflow_tpu.engine.schedules import constant
from fcn8s_tensorflow_tpu.ops.losses import (
    class_pixel_weights,
    masked_mean_softmax_cross_entropy,
    median_frequency_class_weights,
    softmax_cross_entropy_with_ids,
)

TINY = dict(width_mult=1 / 32, fc_channels=32, compute_dtype=jnp.float32)
HW = (32, 64)


def test_median_frequency_weights_hand_fixture():
    # freqs: [.5, .25, .125, .125]; median = .1875
    counts = [400, 200, 100, 100]
    w = np.asarray(median_frequency_class_weights(counts))
    med = np.median([0.5, 0.25, 0.125, 0.125])
    np.testing.assert_allclose(
        w, [med / 0.5, med / 0.25, med / 0.125, med / 0.125], rtol=1e-6
    )
    # rare classes get larger weights
    assert w[2] > w[1] > w[0]


def test_median_frequency_weights_zero_count_class():
    w = np.asarray(median_frequency_class_weights([300, 0, 100]))
    assert w[1] == 0.0  # absent class contributes nothing, no inf/nan
    assert np.all(np.isfinite(w))
    # median over PRESENT classes only: freqs .75/.25 -> median .5
    np.testing.assert_allclose(w[[0, 2]], [0.5 / 0.75, 0.5 / 0.25], rtol=1e-6)


def test_class_pixel_weights_composition():
    labels = jnp.asarray([[0, 1, 255, 2], [1, 1, 0, 0]], jnp.int32)
    mask = jnp.asarray([1.0, 0.0])  # second sample is batch padding
    cw = (0.5, 2.0, 3.0)
    w = np.asarray(class_pixel_weights(labels, mask, cw, ignore_label=255))
    np.testing.assert_allclose(w[0], [0.5, 2.0, 0.0, 3.0])
    np.testing.assert_array_equal(w[1], 0.0)
    # without ignore_label: straight per-class gather
    w2 = np.asarray(class_pixel_weights(labels[1:], mask[1:] + 1.0, cw))
    np.testing.assert_allclose(w2[0], [2.0, 2.0, 0.5, 0.5])


def test_weighted_mean_hand_fixture():
    # 2 pixels of class 0 (w=1) and 1 pixel of class 1 (w=4): the weighted
    # mean is (ce0a + ce0b + 4*ce1) / 6
    logits = jnp.asarray(
        [[2.0, 0.0], [0.0, 1.0], [1.0, -1.0]], jnp.float32
    ).reshape(1, 3, 1, 2)
    labels = jnp.asarray([0, 0, 1], jnp.int32).reshape(1, 3, 1)
    mask = jnp.ones((1,), jnp.float32)
    w = class_pixel_weights(labels, mask, (1.0, 4.0))
    got = float(masked_mean_softmax_cross_entropy(logits, labels, w))
    ce = np.asarray(softmax_cross_entropy_with_ids(logits, labels)).ravel()
    expected = (ce[0] + ce[1] + 4 * ce[2]) / 6.0
    assert got == pytest.approx(float(expected), rel=1e-6)


def test_pallas_dense_path_matches_xla_with_class_weights():
    from fcn8s_tensorflow_tpu.ops.pallas_kernels import softmax_cross_entropy_pallas

    rng = np.random.default_rng(23)
    logits = jnp.asarray(rng.normal(size=(2, 8, 16, 5)).astype(np.float32))
    labels = np.asarray(rng.integers(0, 5, size=(2, 8, 16)), np.int32)
    labels[1, :2] = 255
    labels = jnp.asarray(labels)
    mask = jnp.asarray([1.0, 1.0])
    cw = (0.3, 1.0, 2.5, 0.7, 4.0)
    w = class_pixel_weights(labels, mask, cw, ignore_label=255)

    ref = masked_mean_softmax_cross_entropy(logits, labels, w)
    got = softmax_cross_entropy_pallas(logits, labels, w, interpret=True)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    g_ref = jax.grad(lambda lg: masked_mean_softmax_cross_entropy(lg, labels, w))(logits)
    g_got = jax.grad(
        lambda lg: softmax_cross_entropy_pallas(lg, labels, w, interpret=True)
    )(logits)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-5, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(g_got)[1, :2], 0.0)


def _toy(n=4):
    rng = np.random.default_rng(7)
    images = rng.integers(0, 255, size=(n, *HW, 3), dtype=np.uint8)
    labels = np.zeros((n, *HW), np.uint8)
    labels[:, :, 50:] = 1  # class 1 is rare (14/64 of the width)
    labels[:, :4, :] = 2  # class 2 rarer still
    return images, labels


def _repeat(images, labels):
    while True:
        yield images, labels


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
def test_facade_class_weighted_training_and_grad_accum_match():
    images, labels = _toy()
    counts = np.bincount(labels.ravel(), minlength=3)
    cw = np.asarray(median_frequency_class_weights(counts))

    models = []
    for accum in (1, 2):
        m = FCN8s(num_classes=3, seed=5, **TINY)
        _train(m, _repeat(images, labels), 1,
               gradient_accumulation=accum, class_weights=cw)
        models.append(m)
    p1 = jax.tree.map(np.asarray, models[0].state.params)
    p2 = jax.tree.map(np.asarray, models[1].state.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6), p1, p2
    )

    # weighted vs unweighted training actually diverges (weights take effect)
    m_plain = FCN8s(num_classes=3, seed=5, **TINY)
    _train(m_plain, _repeat(images, labels), 1)
    pw = np.asarray(models[0].state.params["decoder"]["pool3_1x1"]["kernel"])
    pp = np.asarray(m_plain.state.params["decoder"]["pool3_1x1"]["kernel"])
    assert not np.allclose(pw, pp)

    # eval loss uses the same weighting (finite, and != unweighted loss)
    vals = models[0].evaluate(_repeat(images, labels), num_batches=1,
                              metrics={"loss", "accuracy"}, dataset="train")
    assert np.isfinite(vals["loss"])


@pytest.mark.slow
def test_facade_class_weights_compose_with_ignore_label():
    images, labels = _toy()
    labels = labels.copy()
    labels[:, 4:8, :] = 255
    m = FCN8s(num_classes=3, ignore_label=255, seed=1, **TINY)
    counts = np.bincount(labels[labels != 255].ravel(), minlength=3)
    _train(m, _repeat(images, labels), 2,
           class_weights=median_frequency_class_weights(counts))
    assert np.isfinite(m.training_loss)


def _toy_tree(tmp_path, gts):
    """Write a minimal Cityscapes-style image/GT tree; returns a generator."""
    from PIL import Image

    from fcn8s_tensorflow_tpu.data.generator import BatchGenerator

    img_root = tmp_path / "img" / "aachen"
    gt_root = tmp_path / "gt" / "aachen"
    img_root.mkdir(parents=True)
    gt_root.mkdir(parents=True)
    for i, gt in enumerate(gts):
        stem = f"aachen_{i:06d}_000019"
        img = np.zeros((*gt.shape, 3), np.uint8)
        Image.fromarray(img).save(img_root / f"{stem}_leftImg8bit.png")
        Image.fromarray(gt).save(gt_root / f"{stem}_gtFine_labelIds.png")
    return BatchGenerator(
        image_dirs=[str(tmp_path / "img")],
        ground_truth_dirs=[str(tmp_path / "gt")],
        image_name_split_separator="leftImg8bit",
        ground_truth_suffix="gtFine_labelIds",
        num_classes=3,
    )


def test_class_pixel_counts_scan(tmp_path):
    g1 = np.zeros((4, 8), np.uint8)
    g1[:, 6:] = 1  # 8 pixels of class 1
    g2 = np.full((4, 8), 2, np.uint8)
    g2[0, :] = 255  # 8 ignored pixels
    gen = _toy_tree(tmp_path, [g1, g2])
    counts = gen.class_pixel_counts(ignore_label=255)
    np.testing.assert_array_equal(counts, [24, 8, 24])
    # chains directly into the weight builder
    w = np.asarray(median_frequency_class_weights(counts))
    assert w[1] > w[0] == w[2]


def test_class_pixel_counts_lut_and_validation(tmp_path):
    from fcn8s_tensorflow_tpu.data.generator import DataError

    g = np.zeros((2, 4), np.uint8)
    g[:, 2:] = 7
    gen = _toy_tree(tmp_path, [g])
    # LUT maps raw id 7 -> class 1, id 0 -> ignore
    lut = np.full(34, 255, np.uint8)
    lut[7] = 1
    counts = gen.class_pixel_counts(ids_to_classes=lut, ignore_label=255)
    np.testing.assert_array_equal(counts, [0, 4, 0])
    # an out-of-range class id fails loud, naming the file
    with pytest.raises(DataError, match="labelIds"):
        gen.class_pixel_counts()  # raw id 7 >= num_classes=3, no ignore


@pytest.mark.slow  # fast-suite re-triage (round 5): heavier twin of a fast smoke
def test_facade_class_weights_validation():
    m = FCN8s(num_classes=3, **TINY)
    images, labels = _toy()
    with pytest.raises(ValueError, match="length"):
        _train(m, _repeat(images, labels), 1, class_weights=[1.0, 2.0])
    with pytest.raises(ValueError, match="non-negative"):
        _train(m, _repeat(images, labels), 1, class_weights=[1.0, -2.0, 1.0])
