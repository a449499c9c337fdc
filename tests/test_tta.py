"""Test-time-augmentation prediction (`FCN8s.predict_tta`) — a
beyond-reference capability (the reference's `predict`,
`fcn8s_tensorflow.py:743-770`, sees a single view).

Mechanics are pinned against host-composed equivalents of the same
executables: identity-scale TTA must match plain `predict`, flip TTA must
equal the hand-computed mirror average, and the whole head must be
flip-equivariant by construction."""

import jax.numpy as jnp
import numpy as np
import pytest

from fcn8s_tensorflow_tpu.engine.model import FCN8s

NUM_CLASSES = 3
HW = (32, 64)
TINY = dict(width_mult=1 / 32, fc_channels=32, compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def model():
    return FCN8s(num_classes=NUM_CLASSES, **TINY)


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(7)
    return rng.integers(0, 255, size=(2, *HW, 3), dtype=np.uint8)


def test_tta_identity_matches_predict(model, images):
    """scales=(1.0,), flip=False degenerates to plain softmax predict."""
    ref = model.predict(images, argmax=False)
    tta = model.predict_tta(images, scales=(1.0,), flip=False, argmax=False)
    np.testing.assert_allclose(tta, ref, atol=1e-5)


def test_tta_flip_average_matches_host_composition(model, images):
    """flip=True equals the hand-computed average of the forward view and
    the un-mirrored prediction of the mirrored view."""
    fwd = model.predict(images, argmax=False)
    mir = model.predict(images[:, :, ::-1, :], argmax=False)[:, :, ::-1, :]
    expected = (fwd + mir) * 0.5
    tta = model.predict_tta(images, scales=(1.0,), flip=True, argmax=False)
    np.testing.assert_allclose(tta, expected, atol=1e-5)


def test_tta_flip_equivariance(model, images):
    """TTA(mirror(x)) == mirror(TTA(x)): the flip-averaged head is
    flip-symmetric by construction."""
    a = model.predict_tta(images[:, :, ::-1, :], scales=(1.0,), flip=True,
                          argmax=False)
    b = model.predict_tta(images, scales=(1.0,), flip=True,
                          argmax=False)[:, :, ::-1, :]
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.slow  # fast-suite re-triage (round 5): heavier twin of a fast smoke
def test_tta_multiscale_valid_distribution(model, images):
    """Rescaled views resize probabilities back bilinearly — a convex
    combination, so the average stays a valid distribution without a
    renormalization pass."""
    probs = model.predict_tta(images, scales=(0.5, 1.0, 1.5), flip=True,
                              argmax=False)
    assert probs.shape == (2, *HW, NUM_CLASSES)
    assert probs.dtype == np.float32
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, atol=1e-5)
    assert probs.min() >= 0.0


@pytest.mark.slow  # fast-suite re-triage (round 5): heavier twin of a fast smoke
def test_tta_argmax_ids_and_odd_shapes(model):
    """Non-stride-32 inputs pad/crop exactly like `predict`; argmax path
    returns int32 ids in range."""
    rng = np.random.default_rng(3)
    odd = rng.integers(0, 255, size=(1, 33, 65, 3), dtype=np.uint8)
    ids = model.predict_tta(odd, scales=(0.75, 1.0), flip=True, argmax=True)
    assert ids.shape == (1, 33, 65)
    assert ids.dtype == np.int32
    assert ids.min() >= 0 and ids.max() < NUM_CLASSES


@pytest.mark.slow  # fast-suite re-triage (round 5): heavier twin of a fast smoke
def test_tta_quantized_smoke(model, images):
    """int8 path compiles and returns sane ids (executable cache keyed
    separately from the bf16 one)."""
    ids = model.predict_tta(images, scales=(1.0,), flip=True, argmax=True,
                            quantized=True)
    assert ids.shape == (2, *HW)
    assert ids.min() >= 0 and ids.max() < NUM_CLASSES
