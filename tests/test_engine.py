"""FCN8s facade end-to-end tests: train/evaluate/predict/save/load round
trips on a tiny-width model (SURVEY.md §4: overfit-one-batch convergence)."""

import itertools
import os

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from fcn8s_tensorflow_tpu.engine.model import FCN8s
from fcn8s_tensorflow_tpu.engine.schedules import (
    constant,
    piecewise_constant,
    reference_tutorial_schedule,
)

NUM_CLASSES = 3
HW = (32, 64)
TINY = dict(width_mult=1 / 32, fc_channels=32, compute_dtype=jnp.float32)


def _toy_batch(n=2):
    """Deterministic, learnable toy data: class = horizontal third."""
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, size=(n, *HW, 3), dtype=np.uint8)
    labels = np.zeros((n, *HW), np.uint8)
    labels[:, :, 21:42] = 1
    labels[:, :, 42:] = 2
    return images, labels


def _repeat_batches(images, labels):
    while True:
        yield images, labels


@pytest.fixture(scope="module")
def trained_model(tmp_path_factory):
    """Overfit one batch for 30 steps; shared across tests in this module."""
    model = FCN8s(num_classes=NUM_CLASSES, **TINY)
    images, labels = _toy_batch()
    gen = _repeat_batches(images, labels)
    model.train(
        train_generator=gen,
        epochs=3,
        steps_per_epoch=10,
        learning_rate_schedule=constant(2e-3),
        keep_prob=1.0,
        metrics={"loss", "mean_iou", "accuracy"},
        eval_frequency=3,
        eval_dataset="train",
        record_summaries=False,
    )
    return model, images, labels


def test_schedules():
    s = piecewise_constant([10, 20], [1.0, 0.5, 0.1])
    assert s(0) == 1.0 and s(10) == 0.5 and s(19) == 0.5 and s(20) == 0.1
    ref = reference_tutorial_schedule()
    assert ref(0) == 1e-4 and ref(15000) == 1e-5 and ref(30000) == 3e-6 and ref(50000) == 1e-6
    with pytest.raises(ValueError):
        piecewise_constant([10], [1.0])


def test_ctor_requires_config():
    with pytest.raises(ValueError):
        FCN8s()


def test_overfit_one_batch_converges(trained_model):
    model, images, labels = trained_model
    assert int(model.state.step) == 30
    # loss should have dropped well below ln(3)=1.0986 on the overfit batch
    assert model.training_loss < 0.9
    # evaluation ran at epoch 3 and recorded all three metrics
    assert model.metric_names == ["loss", "mean_iou", "accuracy"]
    assert len(model.metric_values) == 3
    acc = model.metric_values[model.metric_names.index("accuracy")]
    assert acc > 0.5


def test_predict_argmax_and_softmax(trained_model):
    model, images, labels = trained_model
    pred = model.predict(images)
    assert pred.shape == (2, *HW)
    # overfit batch: prediction should mostly match the labels
    assert (pred == labels).mean() > 0.5
    probs = model.predict(images, argmax=False)
    assert probs.shape == (2, *HW, NUM_CLASSES)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)


@pytest.mark.slow
def test_train_with_gradient_accumulation_learns():
    """Facade gradient_accumulation: 2 microbatches per step, same learning
    behavior (exactness vs full batch is pinned in tests/test_parallel.py)."""
    model = FCN8s(num_classes=NUM_CLASSES, **TINY)
    images, labels = _toy_batch(n=4)
    model.train(
        train_generator=_repeat_batches(images, labels),
        epochs=1,
        steps_per_epoch=15,
        learning_rate_schedule=constant(2e-3),
        keep_prob=1.0,
        eval_frequency=10,
        record_summaries=False,
        gradient_accumulation=2,
    )
    assert model.training_loss < 0.9
    assert int(model.state.step) == 15
    model.close()


def test_predict_quantized_agrees(trained_model):
    """Facade int8 path (ops/quantize.py): same shape/dtype contract as the
    float path and high argmax agreement on the overfit model."""
    model, images, labels = trained_model
    pred = model.predict(images)
    pred_q = model.predict(images, quantized=True)
    assert pred_q.shape == pred.shape
    assert (pred_q == pred).mean() >= 0.97
    # cache invalidation contract: training must drop the qparams cache
    assert model._quantized_params() is model._quantized_params()
    model._qparams = None
    assert model.predict(images, quantized=True).shape == pred.shape


def test_predict_pads_odd_sizes(trained_model):
    model, _, _ = trained_model
    odd = np.zeros((1, 37, 50, 3), np.uint8)
    pred = model.predict(odd)
    assert pred.shape == (1, 37, 50)


def test_train_validates_args(trained_model):
    model, images, labels = trained_model
    gen = _repeat_batches(images, labels)
    with pytest.raises(ValueError, match="monitor"):
        model.train(gen, 1, 1, constant(1e-3), metrics={"loss"}, monitor="bogus",
                    record_summaries=False)
    with pytest.raises(ValueError, match="val"):
        model.train(gen, 1, 1, constant(1e-3), metrics={"loss"}, eval_dataset="val",
                    record_summaries=False)
    with pytest.raises(ValueError, match="summaries_dir"):
        model.train(gen, 1, 1, constant(1e-3), record_summaries=True)


@pytest.mark.slow
def test_save_load_roundtrip(trained_model, tmp_path):
    model, images, labels = trained_model
    model.variables_updated = True
    model.training_loss = 0.1234
    save_dir = str(tmp_path / "ckpts")
    path = model.save(save_dir, saver="saved_model")
    assert path is not None
    base = os.path.basename(path)
    assert base.startswith("saved_model_(globalstep-30)")
    assert "(trainloss-0.1234)" in base

    # full reload (the reference's SavedModel path): no num_classes needed
    reloaded = FCN8s(model_load_dir=path, compute_dtype=jnp.float32)
    assert reloaded.num_classes == NUM_CLASSES
    assert int(reloaded.state.step) == 30
    pred_a = model.predict(images)
    pred_b = reloaded.predict(images)
    np.testing.assert_array_equal(pred_a, pred_b)


def test_save_async_roundtrip(trained_model, tmp_path):
    """block=False: snapshot-on-device + writer thread + atomic rename;
    the checkpoint must be byte-equivalent to a blocking save's state."""
    import fcn8s_tensorflow_tpu.engine.checkpoint as ckpt_mod

    model, images, _ = trained_model
    model.variables_updated = True
    path = model.save(str(tmp_path / "async"), block=False)
    assert model._save_thread is not None
    model._join_pending_save()
    assert os.path.isfile(os.path.join(path, "checkpoint.msgpack"))
    assert not os.path.isdir(path + ".tmp")  # rename completed
    reloaded = FCN8s(model_load_dir=path, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(model.predict(images), reloaded.predict(images))
    # a second save joins the previous thread first
    model.variables_updated = True
    model.save(str(tmp_path / "async2"), block=False)
    model.close()  # close() joins too
    assert model._save_thread is None
    # in-flight .tmp dirs are invisible to latest_checkpoint
    os.makedirs(str(tmp_path / "async3" / "x.tmp"), exist_ok=True)
    open(str(tmp_path / "async3" / "x.tmp" / "checkpoint.msgpack"), "wb").close()
    assert ckpt_mod.latest_checkpoint(str(tmp_path / "async3")) is None


def test_save_dirty_flag(trained_model, tmp_path):
    model, _, _ = trained_model
    model.variables_updated = False
    assert model.save(str(tmp_path / "x")) is None  # no-op skip
    assert model.save(str(tmp_path / "x"), force_save=True) is not None


@pytest.mark.slow
def test_load_variables_roundtrip(trained_model, tmp_path):
    model, images, _ = trained_model
    model.variables_updated = True
    path = model.save(str(tmp_path / "vars"), force_save=True)
    fresh = FCN8s(num_classes=NUM_CLASSES, **TINY)
    before = fresh.predict(images)
    fresh.load_variables(path)
    after = fresh.predict(images)
    np.testing.assert_array_equal(after, model.predict(images))
    assert not np.array_equal(before, after)


@pytest.mark.slow
def test_vgg16_dir_encoder_restore(trained_model, tmp_path):
    """vgg16_dir loads encoder weights only — decoder stays fresh."""
    model, images, _ = trained_model
    model.variables_updated = True
    path = model.save(str(tmp_path / "enc"), force_save=True)
    m2 = FCN8s(num_classes=NUM_CLASSES, vgg16_dir=path, **TINY)
    np.testing.assert_array_equal(
        np.asarray(m2.state.params["encoder"]["conv1_1"]["kernel"]),
        np.asarray(model.state.params["encoder"]["conv1_1"]["kernel"]),
    )
    assert not np.array_equal(
        np.asarray(m2.state.params["decoder"]["fc7_1x1"]["kernel"]),
        np.asarray(model.state.params["decoder"]["fc7_1x1"]["kernel"]),
    )


def test_evaluate_public(trained_model):
    model, images, labels = trained_model
    gen = _repeat_batches(images, labels)
    values = model.evaluate(gen, num_batches=2, dataset="train")
    assert set(values) == {"loss", "mean_iou", "accuracy"}
    assert values["accuracy"] > 0.5


def test_predict_and_save(trained_model, tmp_path):
    from fcn8s_tensorflow_tpu.labels import TRAINIDS_TO_RGBA_DICT

    model, images, _ = trained_model
    img_dir = tmp_path / "in"
    img_dir.mkdir()
    for i, img in enumerate(images):
        Image.fromarray(img).save(img_dir / f"img_{i}.png")
    out_dir = str(tmp_path / "out")
    cmap = {i: (*np.random.default_rng(i).integers(0, 255, 3).tolist(), 127) for i in range(NUM_CLASSES)}
    model.predict_and_save(out_dir, str(img_dir), cmap)
    outs = sorted(os.listdir(out_dir))
    assert outs == ["img_0.png", "img_1.png"]
    out_img = np.asarray(Image.open(os.path.join(out_dir, "img_0.png")))
    assert out_img.shape == (*HW, 3)

    # split-view variant
    out_dir2 = str(tmp_path / "out2")
    model.predict_and_save(out_dir2, str(img_dir), cmap,
                           include_unprocessed_image=True, arrangement="vertical")
    split = np.asarray(Image.open(os.path.join(out_dir2, "img_0.png")))
    assert split.shape == (2 * HW[0], HW[1], 3)


def test_predict_and_save_tiled(trained_model, tmp_path):
    """tile= routes predict_and_save through the fixed-shape tile
    executable; outputs match the untiled run away from seams."""
    model, images, _ = trained_model
    img_dir = tmp_path / "in"
    img_dir.mkdir()
    for i, img in enumerate(images):
        Image.fromarray(img).save(img_dir / f"img_{i}.png")
    cmap = {0: (255, 0, 0, 127), 1: (0, 255, 0, 127), 2: (0, 0, 255, 127)}
    out_a = str(tmp_path / "full")
    out_b = str(tmp_path / "tiled")
    model.predict_and_save(out_a, str(img_dir), cmap, on_device_overlay=False)
    model.predict_and_save(out_b, str(img_dir), cmap, on_device_overlay=False,
                           tile=(32, 32), tile_overlap=16)
    a = np.asarray(Image.open(os.path.join(out_a, "img_0.png")))
    b = np.asarray(Image.open(os.path.join(out_b, "img_0.png")))
    assert a.shape == b.shape
    assert (a == b).mean() > 0.5  # small tiles on a tiny model: seams differ
    # blended variant (forces the host compositor) produces same-shape output
    out_c = str(tmp_path / "blended")
    model.predict_and_save(out_c, str(img_dir), cmap,
                           tile=(32, 32), tile_overlap=16, tile_blend=True)
    c = np.asarray(Image.open(os.path.join(out_c, "img_0.png")))
    assert c.shape == a.shape


def test_feather_profile():
    """Blend weights: strictly positive, symmetric, flat 1.0 outside the
    ramp margin, linear inside."""
    w = FCN8s._feather_profile(64, 16.0)
    assert w.shape == (64,)
    assert (w > 0).all() and w.max() == 1.0
    np.testing.assert_allclose(w, w[::-1])  # symmetric
    assert (w[16:48] == 1.0).all()  # interior flat
    np.testing.assert_allclose(w[0], 0.5 / 16)  # pixel-center ramp start
    np.testing.assert_allclose(w[:16], (np.arange(16) + 0.5) / 16)


def test_on_device_overlay_matches_host(trained_model):
    """predict(overlay=...) composites on device; must match the host
    compositor (viz.overlay) within 1 LSB (fp32 blend, floor-to-uint8)."""
    from fcn8s_tensorflow_tpu.viz.overlay import print_segmentation_onto_image

    model, images, _ = trained_model
    cmap = {0: (255, 0, 0, 127), 1: (0, 255, 0, 200), 2: (0, 0, 255, 0)}
    composited = model.predict(images, overlay=cmap)
    assert composited.dtype == np.uint8
    assert composited.shape == images.shape
    ids = model.predict(images)
    for i in range(len(images)):
        host = print_segmentation_onto_image(images[i], ids[i], cmap)
        diff = np.abs(host.astype(np.int32) - composited[i].astype(np.int32))
        assert diff.max() <= 1, f"overlay mismatch: max diff {diff.max()}"


def test_predict_compact_ids_dtype_and_values(trained_model):
    """ids travel D2H as uint8 (num_classes<=255) but the API returns int32,
    identical to the softmax argmax."""
    model, images, _ = trained_model
    ids = model.predict(images)
    assert ids.dtype == np.int32
    probs = model.predict(images, argmax=False)
    np.testing.assert_array_equal(ids, np.argmax(probs, axis=-1))


@pytest.mark.slow
def test_predict_and_save_batched_mixed_sizes(trained_model, tmp_path):
    """Batched serving: size grouping, short-tail batch padding, writer
    pool; device-overlay output must match the host-compositor path ±1."""
    model, images, _ = trained_model
    img_dir = tmp_path / "in"
    img_dir.mkdir()
    rng = np.random.default_rng(7)
    for i in range(3):  # three HW-sized images + one odd-sized
        Image.fromarray(rng.integers(0, 255, size=(*HW, 3), dtype=np.uint8)).save(
            img_dir / f"a_{i}.png"
        )
    Image.fromarray(rng.integers(0, 255, size=(48, 40, 3), dtype=np.uint8)).save(
        img_dir / "b_odd.png"
    )
    cmap = {0: (255, 0, 0, 127), 1: (0, 255, 0, 127), 2: (0, 0, 255, 127)}
    dev_dir, host_dir = str(tmp_path / "dev"), str(tmp_path / "host")
    model.predict_and_save(dev_dir, str(img_dir), cmap, batch_size=2)
    model.predict_and_save(host_dir, str(img_dir), cmap, batch_size=2,
                           on_device_overlay=False)
    names = sorted(os.listdir(dev_dir))
    assert names == ["a_0.png", "a_1.png", "a_2.png", "b_odd.png"]
    for name in names:
        dev = np.asarray(Image.open(os.path.join(dev_dir, name))).astype(np.int32)
        host = np.asarray(Image.open(os.path.join(host_dir, name))).astype(np.int32)
        assert dev.shape == host.shape
        assert np.abs(dev - host).max() <= 1


@pytest.mark.slow
def test_summaries_written(trained_model, tmp_path):
    model, images, labels = trained_model
    gen = _repeat_batches(images, labels)
    sdir = str(tmp_path / "tb")
    model.train(
        gen, epochs=1, steps_per_epoch=2,
        learning_rate_schedule=constant(1e-4),
        metrics={"loss"}, eval_frequency=1, eval_dataset="train",
        record_summaries=True, summaries_frequency=1,
        summaries_dir=sdir, summaries_name="run1",
    )
    streams = sorted(os.listdir(sdir))
    assert streams == ["run1_evaluation", "run1_training"]
    assert any(f.startswith("events") for f in os.listdir(os.path.join(sdir, "run1_training")))


def test_close_is_safe(trained_model, capsys):
    model, _, _ = trained_model
    model.close()
    assert "closed" in capsys.readouterr().out


@pytest.mark.slow
def test_resume_from_latest(trained_model, tmp_path):
    model, images, _ = trained_model
    model.variables_updated = True
    model.save(str(tmp_path / "r"), force_save=True)
    resumed = FCN8s.resume(str(tmp_path / "r"), compute_dtype=jnp.float32)
    assert int(resumed.state.step) == int(model.state.step)
    np.testing.assert_array_equal(resumed.predict(images), model.predict(images))
    with pytest.raises(FileNotFoundError):
        FCN8s.resume(str(tmp_path / "nothing"))


def test_train_without_prefetch(trained_model):
    """prefetch=0: fully synchronous input path (reference behavior)."""
    model, images, labels = trained_model
    gen = _repeat_batches(images, labels)
    before = int(model.state.step)
    model.train(gen, epochs=1, steps_per_epoch=3,
                learning_rate_schedule=constant(1e-4), record_summaries=False,
                prefetch=0)
    assert int(model.state.step) == before + 3


def test_prefetch_stream_shared_with_eval(trained_model):
    """eval_dataset='train' consumes the same prefetched stream."""
    model, images, labels = trained_model
    gen = _repeat_batches(images, labels)
    model.train(gen, epochs=1, steps_per_epoch=2,
                learning_rate_schedule=constant(1e-4), record_summaries=False,
                metrics={"accuracy"}, eval_frequency=1, eval_dataset="train",
                prefetch=2)
    assert model.metric_names == ["accuracy"]
    assert 0.0 <= model.metric_values[0] <= 1.0


@pytest.mark.slow
def test_predict_spatial_partition_matches_default():
    """Facade-level spatial partitioning: exact vs the default path."""
    import jax

    from fcn8s_tensorflow_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(data=2, model=4)
    model = FCN8s(num_classes=NUM_CLASSES, mesh=mesh, **TINY)
    images, _ = _toy_batch()
    a = model.predict(images)
    b = model.predict(images, spatial_partition=True)
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_train_spatial_partitioned_facade():
    """Facade spatial-partitioned training on a (2 data x 4 model) mesh,
    including mid-training evaluation (regression: the shared train stream
    carries the spatial sharding, so the eval step must be compiled
    spatial too — previously a jit in_shardings mismatch crash)."""
    from fcn8s_tensorflow_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(data=2, model=4)
    model = FCN8s(num_classes=NUM_CLASSES, mesh=mesh, **TINY)
    images, labels = _toy_batch(n=2)
    model.train(
        train_generator=_repeat_batches(images, labels),
        epochs=1,
        steps_per_epoch=12,
        learning_rate_schedule=constant(2e-3),
        keep_prob=1.0,
        metrics={"loss", "accuracy"},
        eval_frequency=1,
        eval_dataset="train",
        record_summaries=False,
        spatial_partition=True,
    )
    assert len(model.metric_values) == 2  # mid-training eval ran
    assert model.training_loss < 1.0
    assert (model.predict(images) == labels).mean() > 0.5
    model.close()


def test_tile_grid_partitions_exactly():
    for size, t, o in [(128, 64, 32), (96, 64, 32), (64, 64, 32), (50, 64, 0),
                       (300, 96, 48), (130, 64, 2)]:
        grid = FCN8s._tile_grid(size, t, o)
        covered = []
        for s, lo, hi in grid:
            covered.extend(range(s + lo, s + hi))
            assert 0 <= lo <= hi <= t
            assert s + t <= size or t >= size
        assert covered == list(range(size)), (size, t, o)


@pytest.mark.slow
def test_predict_tiled_matches_full_on_local_task():
    """Tiled inference agrees with full inference away from tile seams.
    Task: class = color band (locally determined, so a trained model's
    prediction at a pixel barely depends on far context)."""
    rng = np.random.default_rng(1)
    images = rng.integers(0, 255, (2, 64, 128, 3), np.uint8)
    labels = (images.mean(-1) // 86).astype(np.uint8)  # 3 brightness bands

    model = FCN8s(num_classes=3, **TINY)
    model.train(
        train_generator=_repeat_batches(images, labels),
        epochs=1, steps_per_epoch=25,
        learning_rate_schedule=constant(2e-3), keep_prob=1.0,
        eval_frequency=10, record_summaries=False,
    )
    full = model.predict(images)
    tiled = model.predict(images, tile=(64, 64), tile_overlap=32)
    assert tiled.shape == full.shape
    assert (tiled == full).mean() > 0.9, (tiled == full).mean()
    # softmax variant keeps the channel axis
    probs = model.predict(images, tile=(64, 64), tile_overlap=32, argmax=False)
    assert probs.shape == full.shape + (3,)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-3)
    # image smaller than the tile degenerates to full prediction
    small = model.predict(images[:, :32, :48], tile=(64, 64))
    assert small.shape == (2, 32, 48)
    with pytest.raises(ValueError, match="multiples of 32"):
        model.predict(images, tile=(60, 64))
    with pytest.raises(ValueError, match="tile_overlap"):
        model.predict(images, tile=(64, 64), tile_overlap=31)

    # --- feathered blending ---
    blended = model.predict(images, tile=(64, 64), tile_overlap=32,
                            tile_blend=True)
    assert blended.shape == full.shape
    # blending never agrees with the full run meaningfully worse than the
    # hard core-paste does
    assert (blended == full).mean() >= (tiled == full).mean() - 0.02
    bprobs = model.predict(images, tile=(64, 64), tile_overlap=32,
                           tile_blend=True, argmax=False)
    # convex combination of softmaxes still sums to 1
    np.testing.assert_allclose(np.asarray(bprobs).sum(-1), 1.0, atol=1e-3)
    # single tile covering the whole (padded) image: blending must equal
    # the hard paste exactly (one contribution, normalized by itself)
    hard1 = model.predict(images[:, :32, :48], tile=(64, 64), argmax=False)
    soft1 = model.predict(images[:, :32, :48], tile=(64, 64),
                          tile_blend=True, argmax=False)
    np.testing.assert_allclose(soft1, hard1, atol=1e-5)
    with pytest.raises(ValueError, match="tile_blend requires"):
        model.predict(images, tile_blend=True)
    with pytest.raises(ValueError, match="composites probabilities"):
        model.predict(images, tile=(64, 64), tile_blend=True,
                      overlay={0: (255, 0, 0, 127), 1: (0, 255, 0, 127),
                               2: (0, 0, 255, 127)})
    model.close()


def test_async_save_failure_surfaces(trained_model, tmp_path, monkeypatch):
    """A failed background checkpoint write must raise at the join point
    and re-arm the dirty flag (regression: silently lost checkpoint)."""
    import fcn8s_tensorflow_tpu.engine.checkpoint as ckpt_mod

    model, _, _ = trained_model
    model.variables_updated = True

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(ckpt_mod.os, "rename", boom)
    model.save(str(tmp_path / "will_fail"), block=False)
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        model._join_pending_save()
    assert model.variables_updated  # dirty flag re-armed
    model._save_thread = None


@pytest.mark.slow
def test_train_grad_accum_pads_odd_batches():
    """Batch 3 with accumulation 2 must pad (not crash) — regression."""
    model = FCN8s(num_classes=NUM_CLASSES, **TINY)
    images, labels = _toy_batch(n=3)
    model.train(
        train_generator=_repeat_batches(images, labels),
        epochs=1, steps_per_epoch=4,
        learning_rate_schedule=constant(1e-3), keep_prob=1.0,
        eval_frequency=10, record_summaries=False,
        gradient_accumulation=2,
    )
    assert int(model.state.step) == 4
    model.close()


@pytest.mark.slow
def test_training_is_seed_deterministic():
    """Two runs with the same seed and data produce bit-identical params;
    a different seed diverges (the framework's reproducibility contract —
    the reference, seeded only by TF1 graph-level randomness, had none)."""
    images, labels = _toy_batch()

    def run(seed):
        model = FCN8s(num_classes=NUM_CLASSES, seed=seed, **TINY)
        model.train(
            train_generator=_repeat_batches(images, labels),
            epochs=1, steps_per_epoch=5,
            learning_rate_schedule=constant(1e-3), keep_prob=0.7,
            eval_frequency=10, record_summaries=False,
        )
        leaves = [np.asarray(x) for x in jax.tree.leaves(model.state.params)]
        model.close()
        return leaves

    import jax

    a, b, c = run(0), run(0), run(1)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert any(not np.array_equal(x, z) for x, z in zip(a, c))


def test_describe_checkpoint(trained_model, tmp_path):
    import subprocess
    import sys as _sys

    import fcn8s_tensorflow_tpu.engine.checkpoint as ckpt_mod

    model, _, _ = trained_model
    model.variables_updated = True
    path = model.save(str(tmp_path / "d"), force_save=True)
    text = ckpt_mod.describe_checkpoint(path)
    assert "model_config" in text and "encoder/conv1_1/kernel" in text
    # parent-dir form resolves to the latest checkpoint
    assert "checkpoint:" in ckpt_mod.describe_checkpoint(str(tmp_path / "d"))
    with pytest.raises(FileNotFoundError):
        ckpt_mod.describe_checkpoint(str(tmp_path / "nope"))


def test_checkpoint_format_version_enforced(trained_model, tmp_path):
    """The manifest carries format_version; readers reject newer formats
    with a clear error instead of failing deep in unflattening."""
    import json as _json

    import fcn8s_tensorflow_tpu.engine.checkpoint as ckpt_mod

    model, _, _ = trained_model
    path = model.save(str(tmp_path / "ver"), force_save=True)
    meta = ckpt_mod.load_metadata(path)
    assert meta["format_version"] == ckpt_mod.CHECKPOINT_FORMAT_VERSION

    meta["format_version"] = ckpt_mod.CHECKPOINT_FORMAT_VERSION + 1
    with open(os.path.join(path, "metadata.json"), "w") as f:
        _json.dump(meta, f)
    with pytest.raises(ValueError, match="format_version"):
        ckpt_mod.load_params_only(path, model.state.params)
    # pre-versioning checkpoints (no field) still load: treated as v1
    del meta["format_version"]
    with open(os.path.join(path, "metadata.json"), "w") as f:
        _json.dump(meta, f)
    ckpt_mod.load_params_only(path, model.state.params)


@pytest.mark.slow  # fast-suite re-triage (round 5): heavier twin of a fast smoke
def test_async_save_replaces_existing_checkpoint_safely(trained_model, tmp_path):
    """Re-saving async to an existing directory name goes through a
    rename-aside (never an rmtree-first window) and leaves no .tmp/.old
    residue (ADVICE r2)."""
    model, images, _ = trained_model
    for _ in range(2):
        model.variables_updated = True
        target = model.save(str(tmp_path / "replace_me"), block=False)
        model._join_pending_save()
    assert os.path.isfile(os.path.join(target, "checkpoint.msgpack"))
    assert not os.path.isdir(target + ".tmp")
    assert not os.path.isdir(target + ".old")
    reloaded = FCN8s(model_load_dir=target, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(model.predict(images), reloaded.predict(images))


def test_monitor_first_save_wins(trained_model):
    """Warm-up semantics: before the monitored metric is ever measured,
    every save_frequency epoch saves (documented in _monitor_improved)."""
    model, _, _ = trained_model
    names, values, best = model.metric_names, model.metric_values, model.best_metric_values
    try:
        model.metric_names, model.metric_values = ["mean_iou"], []
        model.best_metric_values = [-1.0]
        assert model._monitor_improved("mean_iou", {"mean_iou"}, 1, 1)  # unmeasured
        model.metric_values, model.best_metric_values = [0.5], [0.6]
        assert not model._monitor_improved("mean_iou", {"mean_iou"}, 1, 1)
        model.metric_values = [0.7]
        assert model._monitor_improved("mean_iou", {"mean_iou"}, 1, 1)
        # a monitor that is not tracked at all always saves
        assert model._monitor_improved("accuracy", {"mean_iou"}, 1, 1)
    finally:
        model.metric_names, model.metric_values, model.best_metric_values = names, values, best


# ---------------------------------------------------------------------------
# early stopping + JSONL train log
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_early_stopping_on_training_loss():
    """lr=0 makes every epoch's loss identical: the first observation sets
    the best, each later epoch is stale, and patience=2 stops after epoch 3
    of 10."""
    model = FCN8s(num_classes=NUM_CLASSES, **TINY)
    images, labels = _toy_batch()
    model.train(train_generator=_repeat_batches(images, labels), epochs=10,
                steps_per_epoch=2, learning_rate_schedule=constant(0.0),
                keep_prob=1.0, record_summaries=False, eval_frequency=None,
                early_stopping=2)
    assert int(model.state.step) == 3 * 2
    model.close()


@pytest.mark.slow
def test_early_stopping_eval_metric_and_min_delta():
    """monitor='mean_iou' with eval every epoch; lr=0 freezes the metric so
    patience=1 stops at the second evaluation. min_delta folded in via the
    dict form."""
    model = FCN8s(num_classes=NUM_CLASSES, **TINY)
    images, labels = _toy_batch()
    model.train(train_generator=_repeat_batches(images, labels), epochs=10,
                steps_per_epoch=2, learning_rate_schedule=constant(0.0),
                keep_prob=1.0, record_summaries=False,
                metrics={"mean_iou"}, monitor="mean_iou", eval_frequency=1,
                eval_dataset="train",
                early_stopping={"patience": 1, "min_delta": 0.5})
    assert int(model.state.step) == 2 * 2
    model.close()


def test_early_stopping_validation():
    model = FCN8s(num_classes=NUM_CLASSES, **TINY)
    images, labels = _toy_batch()
    common = dict(train_generator=_repeat_batches(images, labels), epochs=1,
                  steps_per_epoch=1, learning_rate_schedule=constant(0.0),
                  record_summaries=False, eval_frequency=None)
    with pytest.raises(ValueError, match="patience must be >= 1"):
        model.train(early_stopping=0, **common)
    with pytest.raises(ValueError, match="unknown early_stopping keys"):
        model.train(early_stopping={"patience": 2, "typo": 1}, **common)
    with pytest.raises(ValueError, match="requires metrics"):
        model.train(early_stopping=2, monitor="mean_iou",
                    metrics={"mean_iou"}, **common)
    model.close()


@pytest.mark.slow
def test_train_log_jsonl(tmp_path):
    import json

    log_path = str(tmp_path / "train_log.jsonl")
    model = FCN8s(num_classes=NUM_CLASSES, **TINY)
    images, labels = _toy_batch()
    model.train(train_generator=_repeat_batches(images, labels), epochs=3,
                steps_per_epoch=2, learning_rate_schedule=constant(1e-3),
                keep_prob=1.0, record_summaries=False,
                metrics={"loss"}, eval_frequency=2, eval_dataset="train",
                train_log=log_path)
    records = [json.loads(line) for line in open(log_path)]
    assert [r["epoch"] for r in records] == [1, 2, 3]
    assert [r["global_step"] for r in records] == [2, 4, 6]
    for r in records:
        assert np.isfinite(r["training_loss"]) and r["learning_rate"] == 1e-3
    # eval metrics recorded only on the eval epoch
    assert "eval_loss" in records[1] and "eval_loss" not in records[0]
    # append semantics: a second train call extends the same file
    model.train(train_generator=_repeat_batches(images, labels), epochs=1,
                steps_per_epoch=2, learning_rate_schedule=constant(1e-3),
                keep_prob=1.0, record_summaries=False, eval_frequency=None,
                train_log=log_path)
    records = [json.loads(line) for line in open(log_path)]
    assert len(records) == 4 and records[-1]["global_step"] == 8
    model.close()


@pytest.mark.slow
def test_reduce_lr_on_plateau(tmp_path):
    """min_delta=10 makes every observation 'stale': patience=2/factor=0.5
    halves the LR after epochs 3 and 5; the train log pins the exact
    per-epoch LR sequence."""
    import json

    log_path = str(tmp_path / "log.jsonl")
    model = FCN8s(num_classes=NUM_CLASSES, **TINY)
    images, labels = _toy_batch()
    model.train(train_generator=_repeat_batches(images, labels), epochs=6,
                steps_per_epoch=1, learning_rate_schedule=constant(1e-3),
                keep_prob=1.0, record_summaries=False, eval_frequency=None,
                reduce_lr_on_plateau={"patience": 2, "factor": 0.5,
                                      "min_delta": 10.0},
                train_log=log_path)
    lrs = [json.loads(line)["learning_rate"] for line in open(log_path)]
    np.testing.assert_allclose(lrs, [1e-3, 1e-3, 1e-3, 5e-4, 5e-4, 2.5e-4])

    # min_lr floors the reduction
    log2 = str(tmp_path / "log2.jsonl")
    model.train(train_generator=_repeat_batches(images, labels), epochs=4,
                steps_per_epoch=1, learning_rate_schedule=constant(1e-3),
                keep_prob=1.0, record_summaries=False, eval_frequency=None,
                reduce_lr_on_plateau={"patience": 1, "factor": 0.5,
                                      "min_delta": 10.0, "min_lr": 6e-4},
                train_log=log2)
    lrs = [json.loads(line)["learning_rate"] for line in open(log2)]
    np.testing.assert_allclose(lrs, [1e-3, 1e-3, 6e-4, 6e-4])

    with pytest.raises(ValueError, match="factor must be in"):
        model.train(train_generator=_repeat_batches(images, labels), epochs=1,
                    steps_per_epoch=1, learning_rate_schedule=constant(1e-3),
                    record_summaries=False, eval_frequency=None,
                    reduce_lr_on_plateau={"patience": 1, "factor": 1.5})
    with pytest.raises(ValueError, match="unknown reduce_lr_on_plateau"):
        model.train(train_generator=_repeat_batches(images, labels), epochs=1,
                    steps_per_epoch=1, learning_rate_schedule=constant(1e-3),
                    record_summaries=False, eval_frequency=None,
                    reduce_lr_on_plateau={"patience": 1, "cooldown": 2})
    model.close()


@pytest.mark.slow
def test_plateau_state_resumes_from_checkpoint(tmp_path):
    """The plateau annealer's cumulative LR scale + patience counters ride
    the checkpoint manifest: the first train() on a resumed model continues
    them; a second train() call starts fresh (consume-once)."""
    import json

    model = FCN8s(num_classes=NUM_CLASSES, **TINY)
    images, labels = _toy_batch()
    plateau = {"patience": 2, "factor": 0.5, "min_delta": 10.0}
    model.train(train_generator=_repeat_batches(images, labels), epochs=6,
                steps_per_epoch=1, learning_rate_schedule=constant(1e-3),
                keep_prob=1.0, record_summaries=False, eval_frequency=None,
                reduce_lr_on_plateau=plateau)
    # two reductions fired (epochs 3 and 5): cumulative scale 0.25
    assert model._observer_state["lr_scale"] == pytest.approx(0.25)
    model.save(str(tmp_path), force_save=True)

    resumed = FCN8s.resume(str(tmp_path))
    log_path = str(tmp_path / "resumed.jsonl")
    resumed.train(train_generator=_repeat_batches(images, labels), epochs=2,
                  steps_per_epoch=1, learning_rate_schedule=constant(1e-3),
                  keep_prob=1.0, record_summaries=False, eval_frequency=None,
                  reduce_lr_on_plateau=plateau, train_log=log_path)
    lrs = [json.loads(line)["learning_rate"] for line in open(log_path)]
    # epoch 1 runs at the restored annealed scale (0.25 -> 2.5e-4); the
    # restored stall counter (1, from epoch 6) plus epoch 1's stale
    # observation hits patience=2, so epoch 2 runs reduced again (1.25e-4)
    # — exactly the LR sequence an uninterrupted 8-epoch run would produce
    np.testing.assert_allclose(lrs, [2.5e-4, 1.25e-4])

    # consume-once: the NEXT train call starts a fresh annealing run
    log2 = str(tmp_path / "fresh.jsonl")
    resumed.train(train_generator=_repeat_batches(images, labels), epochs=1,
                  steps_per_epoch=1, learning_rate_schedule=constant(1e-3),
                  keep_prob=1.0, record_summaries=False, eval_frequency=None,
                  reduce_lr_on_plateau=plateau, train_log=log2)
    lrs2 = [json.loads(line)["learning_rate"] for line in open(log2)]
    np.testing.assert_allclose(lrs2, [1e-3])
    resumed.close()
    model.close()


@pytest.mark.slow
def test_in_training_save_carries_current_epoch_observer_state(tmp_path):
    """Regression (round-4 endurance run): in-training checkpoints used to be
    written BEFORE the epoch's plateau/early-stopping update, so a resumed
    run's annealer was one observation stale and its LR stream diverged from
    the uninterrupted run. The checkpoint saved on the epoch the plateau
    fires must carry the post-fire state, and a resume must train its first
    epoch at the same LR the uninterrupted run would use next."""
    import json

    save_dir = str(tmp_path / "ckpts")
    model = FCN8s(num_classes=NUM_CLASSES, **TINY)
    images, labels = _toy_batch()
    plateau = {"patience": 2, "factor": 0.5, "min_delta": 10.0}
    # patience=2 + min_delta=10 -> the annealer fires at the end of epoch 3
    model.train(train_generator=_repeat_batches(images, labels), epochs=3,
                steps_per_epoch=1, learning_rate_schedule=constant(1e-3),
                keep_prob=1.0, record_summaries=False, eval_frequency=None,
                reduce_lr_on_plateau=plateau,
                save_during_training=True, save_dir=save_dir,
                save_best_only=False, save_frequency=1)

    resumed = FCN8s.resume(save_dir)
    staged = resumed._observer_pending
    assert staged["lr_scale"] == pytest.approx(0.5)  # post-fire, not stale
    assert staged["rp_stale"] == 0
    log_path = str(tmp_path / "resumed.jsonl")
    resumed.train(train_generator=_repeat_batches(images, labels), epochs=1,
                  steps_per_epoch=1, learning_rate_schedule=constant(1e-3),
                  keep_prob=1.0, record_summaries=False, eval_frequency=None,
                  reduce_lr_on_plateau=plateau, train_log=log_path)
    lrs = [json.loads(line)["learning_rate"] for line in open(log_path)]
    # the uninterrupted run's epoch 4 trains at the halved LR; so must the
    # resumed run's first epoch
    np.testing.assert_allclose(lrs, [5e-4])
    resumed.close()
    model.close()


@pytest.mark.slow
def test_plateau_min_lr_does_not_floor_base_schedule(tmp_path):
    """Keras semantics: min_lr bounds reductions only — a base schedule
    already below min_lr must pass through untouched when no reduction
    has fired."""
    import json

    log_path = str(tmp_path / "log.jsonl")
    model = FCN8s(num_classes=NUM_CLASSES, **TINY)
    images, labels = _toy_batch()
    model.train(train_generator=_repeat_batches(images, labels), epochs=2,
                steps_per_epoch=1, learning_rate_schedule=constant(1e-6),
                keep_prob=1.0, record_summaries=False, eval_frequency=None,
                reduce_lr_on_plateau={"patience": 10, "min_lr": 1e-4},
                train_log=log_path)
    lrs = [json.loads(line)["learning_rate"] for line in open(log_path)]
    np.testing.assert_allclose(lrs, [1e-6, 1e-6])
    model.close()


def test_predict_and_save_tile_blend_requires_tile(trained_model, tmp_path):
    model, images, _ = trained_model
    img_dir = tmp_path / "in2"
    img_dir.mkdir()
    Image.fromarray(images[0]).save(img_dir / "img_0.png")
    cmap = {0: (255, 0, 0, 127), 1: (0, 255, 0, 127), 2: (0, 0, 255, 127)}
    with pytest.raises(ValueError, match="tile_blend requires"):
        model.predict_and_save(str(tmp_path / "o"), str(img_dir), cmap,
                               tile_blend=True)


@pytest.mark.slow
def test_find_learning_rate(tmp_path):
    """LR range test: exponential sweep on the real train step, model state
    bit-restored afterwards, steepest-descent suggestion inside the range."""
    import jax

    model = FCN8s(num_classes=NUM_CLASSES, **TINY)
    images, labels = _toy_batch()
    before = jax.tree.map(lambda x: np.asarray(x).copy(),
                          {"p": model.state.params, "o": model.state.opt_state,
                           "s": model.state.step})
    res = model.find_learning_rate(
        _repeat_batches(images, labels), min_lr=1e-6, max_lr=1e-1, steps=12)
    n = len(res["learning_rates"])
    assert 2 <= n <= 12
    assert res["learning_rates"][0] == pytest.approx(1e-6)
    assert all(a < b for a, b in zip(res["learning_rates"],
                                     res["learning_rates"][1:]))
    assert len(res["losses"]) == len(res["smoothed"]) == n
    assert 1e-6 <= res["suggestion"] <= 1e-1
    # the sweep leaves no trace: full TrainState bit-restored
    after = {"p": model.state.params, "o": model.state.opt_state,
             "s": model.state.step}
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
                 before, after)
    assert not model.variables_updated
    with pytest.raises(ValueError, match="min_lr"):
        model.find_learning_rate(_repeat_batches(images, labels),
                                 min_lr=1e-3, max_lr=1e-4)
    with pytest.raises(ValueError, match="steps"):
        model.find_learning_rate(_repeat_batches(images, labels), steps=1)
    model.close()
