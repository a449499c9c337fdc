"""Regression tests for the endurance benchmark's data workload
(benchmarks/endurance_canonical.py).

The canonical-scale endurance proof (reference recipe: 13k steps @ batch 16,
`/root/reference/fcn8s_tutorial.ipynb` cell 15) rests on two properties of
the workload generator that nothing else in the suite pins down:

* ``batch_for_step`` must be a PURE function of the global step — the
  kill+resume comparator's bit-exact fingerprint match is meaningless if a
  resumed run could see different batches;
* the 5%-block label noise must actually land at its configured rate — it
  is the regularizer that bounds Adam's logit growth on separable synthetic
  data (TODO.md round-4 findings (a)).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks"))

import endurance_canonical as ec  # noqa: E402


def _pool(n=32, h=32, w=64):
    rng = np.random.default_rng(3)
    return ec.synth_hard_batch(rng, n, h, w)


def test_synth_hard_batch_shapes_and_label_range():
    images, labels = _pool()
    assert images.shape == (32, 32, 64, 3) and images.dtype == np.uint8
    assert labels.shape == (32, 32, 64) and labels.dtype == np.uint8
    # class 0 (void) never appears in drawn scenes; classes 1..5 all do
    present = set(np.unique(labels).tolist())
    assert present == {1, 2, 3, 4, 5}


def test_synth_hard_batch_palettes_vary_per_scene():
    # palette jitter (sigma 40) is what keeps the pool unmemorizable: the
    # same class must NOT have the same mean color in every scene
    images, labels = _pool()
    means = [images[i][labels[i] == 1].mean(axis=0) for i in range(8)]
    spread = np.ptp(np.stack(means), axis=0)
    assert (spread > 10).any(), f"class-1 palette identical across scenes: {means}"


def test_batch_for_step_is_pure_function_of_step():
    images, labels = _pool()
    im1, lb1 = ec.batch_for_step(images, labels, step=123, batch=4)
    im2, lb2 = ec.batch_for_step(images, labels, step=123, batch=4)
    np.testing.assert_array_equal(im1, im2)
    np.testing.assert_array_equal(lb1, lb2)
    im3, lb3 = ec.batch_for_step(images, labels, step=124, batch=4)
    assert not (np.array_equal(im1, im3) and np.array_equal(lb1, lb3))


def test_batch_for_step_does_not_mutate_the_pool():
    images, labels = _pool()
    images0, labels0 = images.copy(), labels.copy()
    ec.batch_for_step(images, labels, step=7, batch=4)
    np.testing.assert_array_equal(images, images0)
    np.testing.assert_array_equal(labels, labels0)


def test_batch_for_step_label_noise_rate():
    # Expected observed flip rate = LABEL_NOISE * (C-1)/C (a noise draw can
    # equal the original label). Measure over enough steps to be stable.
    images, labels = _pool(n=64, h=64, w=64)
    flipped = total = 0
    for step in range(20):
        _, lb = ec.batch_for_step(images, labels, step, batch=8)
        rng = np.random.default_rng(77_000 + step)
        idx = rng.choice(len(images), size=8, replace=False)
        clean = np.stack([labels[i] for i in idx])
        flipped += int((lb != clean).sum())
        total += lb.size
    rate = flipped / total
    expected = ec.LABEL_NOISE * (ec.NUM_CLASSES - 1) / ec.NUM_CLASSES
    assert abs(rate - expected) < 0.01, (rate, expected)


def test_batch_for_step_noise_is_blockwise():
    # noise is drawn per 4x4 block (host-cost bound): every flipped pixel's
    # 4x4-aligned block must be uniformly the same (noised) value
    images, labels = _pool(n=16, h=32, w=32)
    _, lb = ec.batch_for_step(images, labels, step=5, batch=8)
    rng = np.random.default_rng(77_000 + 5)
    idx = rng.choice(len(images), size=8, replace=False)
    clean = np.stack([labels[i] for i in idx])
    diff = lb != clean
    for s, y, x in zip(*np.where(diff)):
        by, bx = (y // 4) * 4, (x // 4) * 4
        block = lb[s, by:by + 4, bx:bx + 4]
        assert (block == lb[s, y, x]).all()


def test_batch_for_step_host_noise_off_ships_clean_labels():
    # the full-augment config carries the noise ON DEVICE (post-augment);
    # the host must then ship clean labels — no double noising
    images, labels = _pool(n=16, h=32, w=32)
    im, lb = ec.batch_for_step(images, labels, step=9, batch=8,
                               host_noise=False)
    rng = np.random.default_rng(77_000 + 9)
    idx = rng.choice(len(images), size=8, replace=False)
    np.testing.assert_array_equal(lb, np.stack([labels[i] for i in idx]))
    np.testing.assert_array_equal(im, np.stack([images[i] for i in idx]))


def test_full_augment_config_carries_device_label_noise():
    """The round-4 failure mode (separable augment-void borders) is guarded
    structurally: the 'full' config must noise labels on device, at the same
    rate as the host carrier, over the workload's class count."""
    cfg = ec.AUGMENT_CONFIGS["full"]
    assert "translate" in cfg and "scale" in cfg  # the border creators
    rate, block, num_classes = cfg["label_noise"]
    assert rate == ec.LABEL_NOISE
    assert num_classes == ec.NUM_CLASSES
    # and the flip config keeps the committed r04 artifact's exact semantics
    assert "label_noise" not in ec.AUGMENT_CONFIGS["flip"]
