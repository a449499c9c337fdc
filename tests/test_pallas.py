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
