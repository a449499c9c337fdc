"""StableHLO serving artifacts (engine/export.py): roundtrip fidelity vs
the live model's predict(), symbolic-batch reuse, softmax head, EMA export,
and the artifact-version guard."""

import numpy as np
import jax.numpy as jnp
import pytest

from fcn8s_tensorflow_tpu.engine.export import load_serving_artifact
from fcn8s_tensorflow_tpu.engine.model import FCN8s

NUM_CLASSES = 5
TINY = dict(width_mult=1 / 32, fc_channels=32, compute_dtype=jnp.float32)
HW = (64, 96)


@pytest.fixture(scope="module")
def model():
    return FCN8s(num_classes=NUM_CLASSES, **TINY)


@pytest.fixture(scope="module")
def images(rng_module):
    return rng_module.integers(0, 255, (3,) + HW + (3,), dtype=np.uint8)


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(11)


def test_argmax_artifact_matches_live_model(model, images, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("artifact"))
    model.export_serving(out, input_hw=HW)
    art = load_serving_artifact(out)
    got = art.predict(images)
    want = model.predict(images, argmax=True)
    assert got.dtype == np.int32
    np.testing.assert_array_equal(got, np.asarray(want))
    # symbolic batch: the same artifact serves other batch sizes
    np.testing.assert_array_equal(art.predict(images[:1]),
                                  np.asarray(model.predict(images[:1])))
    # (H, W, 3) convenience input
    assert art.predict(images[0]).shape == (1,) + HW


@pytest.mark.slow  # fast-suite re-triage (round 5): heavier twin of a fast smoke
def test_softmax_artifact(model, images, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("artifact_sm"))
    model.export_serving(out, input_hw=HW, argmax=False)
    probs = load_serving_artifact(out).predict(images[:2])
    want = np.asarray(model.predict(images[:2], argmax=False), np.float32)
    assert probs.shape == (2,) + HW + (NUM_CLASSES,)
    np.testing.assert_allclose(probs, want, atol=1e-5)


def test_wrong_resolution_raises(model, images, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("artifact_res"))
    model.export_serving(out, input_hw=HW)
    art = load_serving_artifact(out)
    with pytest.raises(ValueError, match="exported for"):
        art.predict(images[:, : HW[0] // 2])


def test_version_guard(model, tmp_path):
    import json
    import os

    out = model.export_serving(str(tmp_path / "a"), input_hw=(32, 32))
    manifest = os.path.join(out, "manifest.json")
    with open(manifest) as f:
        m = json.load(f)
    m["artifact_version"] = 999
    with open(manifest, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="artifact_version"):
        load_serving_artifact(out)


@pytest.mark.slow
def test_ema_export_uses_average(tmp_path):
    """An EMA export must serve the averaged weights, not the live ones."""
    model = FCN8s(num_classes=3, **TINY)
    rng = np.random.default_rng(0)
    im = rng.integers(0, 255, (2, 32, 32, 3), np.uint8)
    lb = np.eye(3, dtype=np.int32)[rng.integers(0, 3, (2, 32, 32))]

    def gen():
        while True:
            yield im, lb

    model.train(gen(), epochs=1, steps_per_epoch=2,
                learning_rate_schedule=lambda step: 1e-3,
                record_summaries=False, ema_decay=0.5)
    out = model.export_serving(str(tmp_path / "ema"), input_hw=(32, 32),
                               argmax=False, use_ema=True)
    got = load_serving_artifact(out).predict(im)
    want = np.asarray(model.predict(im, argmax=False, use_ema=True), np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5)
