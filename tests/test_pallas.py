"""Pallas kernels vs reference implementations (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcn8s_tensorflow_tpu.ops.metrics import confusion_matrix
from fcn8s_tensorflow_tpu.ops.pallas_kernels import (
    confusion_matrix_pallas,
    softmax_cross_entropy_pallas,
)


def test_confusion_matrix_matches_xla(rng):
    C = 20
    pred = jnp.asarray(rng.integers(0, C, (3, 64, 64), dtype=np.int32))
    gt = jnp.asarray(rng.integers(0, C, (3, 64, 64), dtype=np.int32))
    got = confusion_matrix_pallas(pred, gt, C, chunk=1024, interpret=True)
    want = confusion_matrix(pred, gt, C)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert float(got.sum()) == 3 * 64 * 64


def test_confusion_matrix_nondivisible_chunk(rng):
    C = 5
    pred = jnp.asarray(rng.integers(0, C, (1, 33, 17), dtype=np.int32))
    gt = jnp.asarray(rng.integers(0, C, (1, 33, 17), dtype=np.int32))
    got = confusion_matrix_pallas(pred, gt, C, chunk=256, interpret=True)
    want = confusion_matrix(pred, gt, C)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ce_forward_matches_reference(rng):
    C = 20
    logits = jnp.asarray(rng.normal(size=(2, 16, 16, C)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, C, (2, 16, 16), dtype=np.int32))
    from fcn8s_tensorflow_tpu.ops.losses import mean_softmax_cross_entropy

    got = softmax_cross_entropy_pallas(logits, labels, chunk=128, interpret=True)
    want = mean_softmax_cross_entropy(logits, labels)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_ce_weighted_matches_masked_mean(rng):
    C = 7
    logits = jnp.asarray(rng.normal(size=(4, 8, 8, C)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, C, (4, 8, 8), dtype=np.int32))
    sample_mask = jnp.asarray([1.0, 1.0, 0.0, 1.0])
    got = softmax_cross_entropy_pallas(logits, labels, sample_mask, chunk=64, interpret=True)
    from fcn8s_tensorflow_tpu.ops.losses import softmax_cross_entropy_with_ids

    ce = softmax_cross_entropy_with_ids(logits, labels)
    want = (ce * sample_mask[:, None, None]).sum() / (3 * 8 * 8)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_ce_gradient_matches_autodiff(rng):
    C = 6
    logits = jnp.asarray(rng.normal(size=(2, 8, 8, C)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, C, (2, 8, 8), dtype=np.int32))
    from fcn8s_tensorflow_tpu.ops.losses import mean_softmax_cross_entropy

    g_pallas = jax.grad(
        lambda l: softmax_cross_entropy_pallas(l, labels, chunk=64, interpret=True)
    )(logits)
    g_ref = jax.grad(lambda l: mean_softmax_cross_entropy(l, labels))(logits)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref), rtol=1e-4, atol=1e-6)


def test_ce_bf16_logits(rng):
    C = 20
    logits = jnp.asarray(rng.normal(size=(1, 8, 8, C)).astype(np.float32)).astype(jnp.bfloat16)
    labels = jnp.asarray(rng.integers(0, C, (1, 8, 8), dtype=np.int32))
    got = softmax_cross_entropy_pallas(logits, labels, chunk=64, interpret=True)
    from fcn8s_tensorflow_tpu.ops.losses import mean_softmax_cross_entropy

    want = mean_softmax_cross_entropy(logits.astype(jnp.float32), labels)
    np.testing.assert_allclose(float(got), float(want), rtol=5e-3)
    g = jax.grad(lambda l: softmax_cross_entropy_pallas(l, labels, chunk=64, interpret=True))(logits)
    assert g.dtype == jnp.bfloat16


# ---------------------------------------------------------------------------
# pallas max-pool pair (ops/pallas_pool.py)
# ---------------------------------------------------------------------------
def test_pallas_pool_forward_matches_xla(rng):
    import jax
    import jax.numpy as jnp

    from fcn8s_tensorflow_tpu.ops.nn import max_pool_2x2
    from fcn8s_tensorflow_tpu.ops.pallas_pool import max_pool_2x2_pallas

    x = jnp.asarray(rng.standard_normal((2, 16, 8, 64)).astype(np.float32))
    ref = max_pool_2x2(x)
    out = max_pool_2x2_pallas(x, True)  # interpret mode on CPU
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_pallas_pool_gradient_bit_exact_with_ties(rng):
    """Backward must reproduce select-and-scatter's first-max tie routing
    bit-exactly — exercised with heavy ties (quantized values)."""
    import jax
    import jax.numpy as jnp

    from fcn8s_tensorflow_tpu.ops.nn import max_pool_2x2
    from fcn8s_tensorflow_tpu.ops.pallas_pool import max_pool_2x2_pallas

    # quantize to force many intra-window ties
    x = jnp.asarray(
        np.round(rng.standard_normal((1, 16, 8, 64)) * 2).astype(np.float32))
    dy = jnp.asarray(rng.standard_normal((1, 8, 4, 64)).astype(np.float32))

    ref_dx = jax.vjp(max_pool_2x2, x)[1](dy)[0]
    pal_dx = jax.vjp(lambda t: max_pool_2x2_pallas(t, True), x)[1](dy)[0]
    np.testing.assert_array_equal(np.asarray(pal_dx), np.asarray(ref_dx))


def test_pallas_pool_shape_validation(rng):
    import jax.numpy as jnp

    from fcn8s_tensorflow_tpu.ops.pallas_pool import max_pool_2x2_pallas

    with pytest.raises(ValueError, match="H%16"):
        max_pool_2x2_pallas(jnp.zeros((1, 8, 8, 64)), True)
    with pytest.raises(ValueError, match="C==64"):
        max_pool_2x2_pallas(jnp.zeros((1, 16, 8, 32)), True)


# ---------------------------------------------------------------------------
# masked fast path (ignore_label; VERDICT r3 #2)
# ---------------------------------------------------------------------------

from fcn8s_tensorflow_tpu.ops.losses import (
    masked_mean_softmax_cross_entropy,
    valid_pixel_weights,
)
from fcn8s_tensorflow_tpu.ops.pallas_kernels import (
    masked_softmax_cross_entropy_pallas,
)


def _masked_case(rng, C=19, shape=(2, 16, 16), ignore=255, frac=0.3):
    logits = jnp.asarray(rng.normal(size=(*shape, C)).astype(np.float32))
    labels = rng.integers(0, C, shape).astype(np.int32)
    labels[rng.random(shape) < frac] = ignore
    return logits, jnp.asarray(labels)


def test_masked_ce_matches_masked_mean(rng):
    ignore = 255
    logits, labels = _masked_case(rng, ignore=ignore)
    mask = jnp.ones((2,), jnp.float32)
    got = masked_softmax_cross_entropy_pallas(
        logits, labels, mask, ignore, chunk=128, interpret=True)
    want = masked_mean_softmax_cross_entropy(
        logits, labels, valid_pixel_weights(labels, mask, ignore))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_masked_ce_in_range_ignore_id(rng):
    """ignore_label < num_classes: the picked term must be killed by the
    validity factor, not by the no-matching-lane property."""
    ignore = 0
    logits, labels = _masked_case(rng, ignore=ignore)
    mask = jnp.ones((2,), jnp.float32)
    got = masked_softmax_cross_entropy_pallas(
        logits, labels, mask, ignore, chunk=128, interpret=True)
    want = masked_mean_softmax_cross_entropy(
        logits, labels, valid_pixel_weights(labels, mask, ignore))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_masked_ce_sample_mask_composes(rng):
    """A zero sample mask removes that sample's pixels from numerator AND
    denominator (batch-padding semantics)."""
    ignore = 255
    logits, labels = _masked_case(rng, shape=(3, 16, 16), ignore=ignore)
    mask = jnp.asarray([1.0, 0.0, 1.0], jnp.float32)
    got = masked_softmax_cross_entropy_pallas(
        logits, labels, mask, ignore, chunk=128, interpret=True)
    want = masked_mean_softmax_cross_entropy(
        logits, labels, valid_pixel_weights(labels, mask, ignore))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_masked_ce_gradient_exactly_zero_at_ignored(rng):
    ignore = 255
    logits, labels = _masked_case(rng, ignore=ignore)
    mask = jnp.ones((2,), jnp.float32)
    g = jax.grad(lambda l: masked_softmax_cross_entropy_pallas(
        l, labels, mask, ignore, chunk=128, interpret=True))(logits)
    g = np.asarray(g)
    ignored = np.asarray(labels) == ignore
    assert ignored.any()
    np.testing.assert_array_equal(g[ignored], 0.0)
    # and matches the reference masked-mean gradient everywhere
    want = np.asarray(jax.grad(lambda l: masked_mean_softmax_cross_entropy(
        l, labels, valid_pixel_weights(labels, mask, ignore)))(logits))
    np.testing.assert_allclose(g, want, atol=1e-7)


def test_masked_ce_bf16_logits(rng):
    ignore = 255
    logits, labels = _masked_case(rng, ignore=ignore)
    logits = logits.astype(jnp.bfloat16)
    mask = jnp.ones((2,), jnp.float32)
    got = masked_softmax_cross_entropy_pallas(
        logits, labels, mask, ignore, chunk=128, interpret=True)
    assert got.dtype == jnp.float32
    want = masked_mean_softmax_cross_entropy(
        logits, labels, valid_pixel_weights(labels, mask, ignore))
    np.testing.assert_allclose(float(got), float(want), rtol=2e-3)
    g = jax.grad(lambda l: masked_softmax_cross_entropy_pallas(
        l, labels, mask, ignore, chunk=128, interpret=True))(logits)
    assert g.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(g)[np.asarray(labels) == ignore], 0.0)


def test_masked_ce_all_ignored_is_zero(rng):
    """All pixels ignored -> loss 0 (not NaN), grads all exactly zero."""
    C, ignore = 19, 255
    logits = jnp.asarray(rng.normal(size=(1, 16, 16, C)).astype(np.float32))
    labels = jnp.full((1, 16, 16), ignore, jnp.int32)
    mask = jnp.ones((1,), jnp.float32)
    loss, g = jax.value_and_grad(lambda l: masked_softmax_cross_entropy_pallas(
        l, labels, mask, ignore, chunk=128, interpret=True))(logits)
    assert float(loss) == 0.0
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_masked_ce_odd_pps_falls_back_to_dense(rng):
    """Per-sample pixel count not divisible by any chunk size: the dense
    per-pixel-weight kernel handles it with identical semantics."""
    C, ignore = 7, 255
    shape = (2, 9, 13)  # pps = 117, not divisible by 128
    logits = jnp.asarray(rng.normal(size=(*shape, C)).astype(np.float32))
    labels = rng.integers(0, C, shape).astype(np.int32)
    labels[rng.random(shape) < 0.3] = ignore
    labels = jnp.asarray(labels)
    mask = jnp.ones((2,), jnp.float32)
    got = masked_softmax_cross_entropy_pallas(
        logits, labels, mask, ignore, chunk=128, interpret=True)
    want = masked_mean_softmax_cross_entropy(
        logits, labels, valid_pixel_weights(labels, mask, ignore))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)
