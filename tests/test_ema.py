"""EMA weight averaging (``train(ema_decay=...)`` + ``use_ema`` serving,
``adopt_ema`` finalization) — a TPU-native extra beyond the reference
(`fcn8s_tensorflow.py:399-658` tracks only the live variables). The EMA
recurrence is verified against a host-side NumPy replay of the exact
same update."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fcn8s_tensorflow_tpu.engine.model import FCN8s
from fcn8s_tensorflow_tpu.engine.schedules import constant

NUM_CLASSES = 3
HW = (32, 64)
TINY = dict(width_mult=1 / 32, fc_channels=32, compute_dtype=jnp.float32)
DECAY = 0.75


def _toy_batch(n=2):
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, size=(n, *HW, 3), dtype=np.uint8)
    labels = np.zeros((n, *HW), np.uint8)
    labels[:, :, 21:42] = 1
    labels[:, :, 42:] = 2
    return images, labels


def _repeat(images, labels):
    while True:
        yield images, labels


def _host_tree(params):
    return jax.tree.map(np.asarray, params)


def _train_steps(model, gen, n):
    model.train(
        train_generator=gen,
        epochs=1,
        steps_per_epoch=n,
        learning_rate_schedule=constant(2e-3),
        keep_prob=1.0,
        metrics=set(),
        eval_frequency=10**9,
        eval_dataset="train",
        record_summaries=False,
        ema_decay=DECAY,
    )


@pytest.mark.slow
def test_ema_recurrence_matches_numpy_replay():
    model = FCN8s(num_classes=NUM_CLASSES, **TINY)
    images, labels = _toy_batch()
    gen = _repeat(images, labels)

    # step 1: EMA seeds to a copy of the post-step params
    _train_steps(model, gen, 1)
    p1 = _host_tree(model.state.params)
    e1 = _host_tree(model.ema_params)
    jax.tree.map(np.testing.assert_array_equal, e1, p1)

    # step 2: ema = d*p1 + (1-d)*p2 — persists across train() calls
    _train_steps(model, gen, 1)
    p2 = _host_tree(model.state.params)
    expected = jax.tree.map(
        lambda e, p: e * np.float32(DECAY) + p * np.float32(1 - DECAY), e1, p2
    )
    actual = _host_tree(model.ema_params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=0, atol=1e-6),
        actual, expected,
    )
    # params moved between steps, so EMA must differ from the live params
    deltas = jax.tree.leaves(
        jax.tree.map(lambda a, p: float(np.max(np.abs(a - p))), actual, p2)
    )
    assert max(deltas) > 0


@pytest.mark.slow
def test_use_ema_serving_and_adopt():
    model = FCN8s(num_classes=NUM_CLASSES, **TINY)
    images, labels = _toy_batch()
    _train_steps(model, _repeat(images, labels), 3)

    live = model.predict(images)
    averaged = model.predict(images, argmax=False, use_ema=True)
    ema_tree = _host_tree(model.ema_params)

    # evaluate(use_ema) runs the averaged weights through the metric path
    vals = model.evaluate(_repeat(images, labels), num_batches=1,
                          metrics={"loss", "accuracy"}, dataset="train",
                          use_ema=True)
    assert {"loss", "accuracy"} <= set(vals)

    # TTA path accepts the averaged weights too
    tta = model.predict_tta(images, scales=(1.0,), flip=True, use_ema=True)
    assert tta.shape == live.shape

    # adopting makes the averaged weights the live ones (checkpoint-dirty)
    model.save_dirty = model.variables_updated
    model.adopt_ema()
    assert model.variables_updated
    jax.tree.map(
        np.testing.assert_array_equal, _host_tree(model.state.params), ema_tree
    )
    adopted = model.predict(images, argmax=False)
    np.testing.assert_allclose(adopted, averaged, rtol=0, atol=1e-6)

    # the EMA buffer was consumed by adoption
    with pytest.raises(ValueError, match="No EMA params"):
        _ = model.ema_params


@pytest.mark.slow
def test_ema_checkpoint_roundtrip(tmp_path):
    """The EMA average persists in checkpoints: a resumed train(ema_decay=...)
    continues the running average (same recurrence as the uninterrupted run)
    instead of re-seeding it from the live params."""
    images, labels = _toy_batch()

    # uninterrupted: 3 EMA steps
    ref = FCN8s(num_classes=NUM_CLASSES, **TINY)
    _train_steps(ref, _repeat(images, labels), 3)
    ref_ema = _host_tree(ref.ema_params)

    # interrupted twin: 2 steps -> save -> resume -> 1 step
    model = FCN8s(num_classes=NUM_CLASSES, **TINY)
    _train_steps(model, _repeat(images, labels), 2)
    saved_ema = _host_tree(model.ema_params)
    path = model.save(str(tmp_path), force_save=True)
    resumed = FCN8s.resume(str(tmp_path))
    # the checkpoint's compute dtype is restored too (an fp32-trained model
    # must not silently resume in bf16 — that skews the continued steps)
    assert resumed.compute_dtype == model.compute_dtype
    jax.tree.map(
        np.testing.assert_array_equal, _host_tree(resumed.ema_params), saved_ema
    )
    _train_steps(resumed, _repeat(images, labels), 1)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=0, atol=1e-6),
        _host_tree(resumed.ema_params), ref_ema,
    )

    # async save carries the EMA too (donated buffer is snapshot-copied)
    resumed.save(str(tmp_path), name="async", force_save=True, block=False)
    resumed._join_pending_save()
    again = FCN8s.resume(str(tmp_path))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=0, atol=1e-6),
        _host_tree(again.ema_params), ref_ema,
    )

    # pre-EMA checkpoints (no ema_leaves) restore with no EMA state
    plain = FCN8s(num_classes=NUM_CLASSES, **TINY)
    plain.train(
        train_generator=_repeat(images, labels), epochs=1, steps_per_epoch=1,
        learning_rate_schedule=constant(2e-3), keep_prob=1.0, metrics=set(),
        eval_frequency=10**9, eval_dataset="train", record_summaries=False,
    )
    p = plain.save(str(tmp_path / "plain"), force_save=True)
    loaded = FCN8s(model_load_dir=p)
    with pytest.raises(ValueError, match="No EMA params"):
        loaded.predict(images, use_ema=True)
    del path


@pytest.mark.slow  # fast-suite re-triage (round 5): heavier twin of a fast smoke
def test_ema_validation():
    model = FCN8s(num_classes=NUM_CLASSES, **TINY)
    images, labels = _toy_batch()
    with pytest.raises(ValueError, match="No EMA params"):
        model.predict(images, use_ema=True)
    with pytest.raises(ValueError, match="ema_decay"):
        model.train(
            train_generator=_repeat(images, labels),
            epochs=1,
            steps_per_epoch=1,
            learning_rate_schedule=constant(1e-3),
            metrics=set(),
            eval_frequency=10**9,
            eval_dataset="train",
            record_summaries=False,
            ema_decay=1.5,
        )
    _train_steps(model, _repeat(images, labels), 1)
    with pytest.raises(ValueError, match="mutually exclusive"):
        model.predict(images, use_ema=True, quantized=True)
