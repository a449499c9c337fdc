"""Pluggable optimizers (``parallel.steps.make_optimizer``): NumPy-replay
unit tests of each update rule (hand-computed recurrences, the repo's
fixture-test convention) plus facade integration with checkpointed
optimizer config. The reference hardcodes TF1 Adam
(`fcn8s_tensorflow.py:256`); the named variants are beyond-reference."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fcn8s_tensorflow_tpu.engine.model import FCN8s
from fcn8s_tensorflow_tpu.engine.schedules import constant
from fcn8s_tensorflow_tpu.parallel.steps import make_optimizer

NUM_CLASSES = 3
HW = (32, 64)
TINY = dict(width_mult=1 / 32, fc_channels=32, compute_dtype=jnp.float32)


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


def _apply_steps(opt, params, grads_seq, lr=0.1):
    """Run the transformation over a gradient sequence, returning params
    after each step."""
    state = opt.init(params)
    state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    out = []
    for g in grads_seq:
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
        out.append(jax.tree.map(np.asarray, params))
    return out


def test_sgd_exact():
    p = {"w": jnp.asarray([1.0, -2.0]), "b": jnp.asarray(0.5)}
    g = {"w": jnp.asarray([0.2, 0.4]), "b": jnp.asarray(-1.0)}
    (after,) = _apply_steps(make_optimizer("sgd"), p, [g], lr=0.1)
    np.testing.assert_allclose(after["w"], [1.0 - 0.02, -2.0 - 0.04], rtol=1e-6)
    np.testing.assert_allclose(after["b"], 0.5 + 0.1, rtol=1e-6)


def test_momentum_tf1_recurrence():
    """accum = m*accum + g; w -= lr*accum (tf.train.MomentumOptimizer)."""
    m, lr = 0.9, 0.1
    p = {"w": jnp.asarray([1.0])}
    gs = [{"w": jnp.asarray([1.0])}, {"w": jnp.asarray([0.5])}]
    steps = _apply_steps(make_optimizer("momentum", momentum=m), p, gs, lr=lr)
    # hand recurrence
    accum = 1.0
    w = 1.0 - lr * accum
    np.testing.assert_allclose(steps[0]["w"], [w], rtol=1e-6)
    accum = m * accum + 0.5
    w = w - lr * accum
    np.testing.assert_allclose(steps[1]["w"], [w], rtol=1e-6)


def test_adamw_decoupled_decay():
    """adamw == adam + lr*wd*w: compare the two transformations on the
    same gradient; the difference must be exactly the decay term."""
    wd, lr = 0.1, 0.01
    p = {"w": jnp.asarray([2.0, -4.0])}
    g = {"w": jnp.asarray([0.3, 0.7])}
    (adam,) = _apply_steps(make_optimizer("adam"), p, [g], lr=lr)
    (adamw,) = _apply_steps(make_optimizer("adamw", weight_decay=wd), p, [g], lr=lr)
    np.testing.assert_allclose(
        adamw["w"], adam["w"] - lr * wd * np.asarray([2.0, -4.0]), rtol=1e-6)


def test_clip_norm_global():
    """Gradient with global norm 5 under clip_norm=1 must update exactly
    as the 5x-downscaled gradient."""
    p = {"a": jnp.asarray([0.0, 0.0]), "b": jnp.asarray([0.0])}
    g = {"a": jnp.asarray([3.0, 0.0]), "b": jnp.asarray([4.0])}  # norm 5
    (clipped,) = _apply_steps(make_optimizer("sgd", clip_norm=1.0), p, [g], lr=1.0)
    np.testing.assert_allclose(clipped["a"], [-0.6, 0.0], rtol=1e-6)
    np.testing.assert_allclose(clipped["b"], [-0.8], rtol=1e-6)


def test_unknown_name_raises():
    with pytest.raises(ValueError, match="unknown optimizer"):
        make_optimizer("rmsprop")


@pytest.mark.slow
def test_facade_momentum_trains_and_checkpoint_restores(tmp_path):
    """End-to-end: momentum+clip model trains, saves, reloads with the
    SAME optimizer config from the checkpoint (including the momentum
    buffers), and keeps training."""
    model = FCN8s(num_classes=NUM_CLASSES, optimizer="momentum",
                  optimizer_kwargs={"momentum": 0.95}, clip_norm=5.0, **TINY)
    images, labels = _toy_batch()
    model.train(train_generator=_repeat(images, labels), epochs=1,
                steps_per_epoch=3, learning_rate_schedule=constant(1e-3),
                keep_prob=1.0, record_summaries=False, eval_frequency=None)
    loss_a = model.training_loss
    assert np.isfinite(loss_a)
    save_dir = str(tmp_path / "ckpt")
    model.save(save_dir)
    from fcn8s_tensorflow_tpu.engine import checkpoint as ckpt

    restored = FCN8s(model_load_dir=ckpt.latest_checkpoint(save_dir),
                     compute_dtype=jnp.float32)
    assert restored.model_config["optimizer"] == "momentum"
    assert restored.model_config["optimizer_kwargs"] == {"momentum": 0.95}
    assert restored.model_config["clip_norm"] == 5.0
    # momentum buffers restored bit-exactly
    orig_leaves = jax.tree.leaves(model.state.opt_state)
    rest_leaves = jax.tree.leaves(restored.state.opt_state)
    assert len(orig_leaves) == len(rest_leaves)
    for a, b in zip(orig_leaves, rest_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    restored.train(train_generator=_repeat(images, labels), epochs=1,
                   steps_per_epoch=2, learning_rate_schedule=constant(1e-3),
                   keep_prob=1.0, record_summaries=False, eval_frequency=None)
    assert int(restored.state.step) == 5


@pytest.mark.slow
def test_facade_custom_transformation():
    """A user-supplied inject_hyperparams transformation drops in."""
    custom = optax.inject_hyperparams(
        lambda learning_rate: optax.sgd(learning_rate))(learning_rate=1e-4)
    model = FCN8s(num_classes=NUM_CLASSES, optimizer=custom, **TINY)
    images, labels = _toy_batch()
    model.train(train_generator=_repeat(images, labels), epochs=1,
                steps_per_epoch=2, learning_rate_schedule=constant(1e-3),
                keep_prob=1.0, record_summaries=False, eval_frequency=None)
    assert np.isfinite(model.training_loss)
    assert model.model_config["optimizer"] == "custom"


def test_unknown_hyper_kwargs_raise():
    """Wrong-variant or typo'd optimizer kwargs must fail loudly, not
    train silently with defaults."""
    with pytest.raises(ValueError, match="unknown kwargs"):
        make_optimizer("momentum", weight_decay=5e-4)
    with pytest.raises(ValueError, match="unknown kwargs"):
        make_optimizer("adam", momentm=0.9)
    with pytest.raises(ValueError, match="unknown kwargs"):
        make_optimizer("sgd", b1=0.9)


@pytest.mark.slow
def test_custom_optimizer_checkpoint_load_rejected(tmp_path):
    """model_load_dir cannot rebuild a user-supplied transformation; the
    error must point at the variables_load_dir escape hatch."""
    from fcn8s_tensorflow_tpu.engine import checkpoint as ckpt

    custom = optax.inject_hyperparams(
        lambda learning_rate: optax.sgd(learning_rate))(learning_rate=1e-4)
    model = FCN8s(num_classes=NUM_CLASSES, optimizer=custom, **TINY)
    images, labels = _toy_batch()
    model.train(train_generator=_repeat(images, labels), epochs=1,
                steps_per_epoch=1, learning_rate_schedule=constant(1e-3),
                keep_prob=1.0, record_summaries=False, eval_frequency=None)
    model.save(str(tmp_path / "ckpt"))
    path = ckpt.latest_checkpoint(str(tmp_path / "ckpt"))
    with pytest.raises(ValueError, match="variables_load_dir"):
        FCN8s(model_load_dir=path)
    # the escape hatch works: fresh model + custom optimizer + weights
    m2 = FCN8s(num_classes=NUM_CLASSES, optimizer=custom,
               variables_load_dir=path, **TINY)
    np.testing.assert_array_equal(m2.predict(images), model.predict(images))
