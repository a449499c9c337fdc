"""End-to-end train throughput with the REAL input pipeline, on TPU.

bench.py's headline number (73 img/s/chip @8x1024x512) times the compiled
step on device-resident batches — the compute ceiling. This benchmark closes
the remaining loop: can the HOST input pipeline actually feed that step on
this 1-CPU-core machine? It drives the public facade (`FCN8s.train` with its
default background prefetcher) through four input configurations, in one
process (the axon tunnel is time-shared — cross-process timing is
meaningless, CLAUDE.md):

  A  resident      a generator re-yielding one preallocated batch — the
                   facade/prefetch/H2D overhead floor (no disk, no decode);
  B  packed        `PackedDataset.generate` (memmap read, no host aug) +
                   the north-star device_augment set compiled into the step;
  C  png           `BatchGenerator.generate` over the PNG tree (a decode
                   per image per step, like the reference every epoch) +
                   the same device_augment set;
  D  packed+host   `PackedDataset.generate` running the host OpenCV
                   augmentations (flip/brightness/translate/scale) — the
                   reference's augmentation placement, minus its decode.

Expected shape of the result: A ≈ B (packed reads are a memcpy, hidden by
the prefetch thread) >> C and D (decode / host-augment bound — on this
host each PNG decode alone is ~100 ms). The dataset is built from the real
reference example photograph (tiled to 1024x512) so PNG decode cost is
representative, with random trainId GT maps.

The reference's pipeline is configuration C's cost WITHOUT prefetch overlap
and with host augmentation on top, serial with the step
(`/root/reference/fcn8s_tensorflow.py:551-572`,
`/root/reference/data_generator/batch_generator.py:232-417`).

Run:  python benchmarks/e2e_input_bench.py        (real TPU, ~5 min)
Prints one JSON line on stdout; chatter on stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H, W = 1024, 512
BATCH = 8
NUM_CLASSES = 20
WARM_STEPS = 4
TIMED_STEPS = 12
DEVICE_AUG = {
    "flip": 0.5,
    "brightness": (0.8, 1.2, 0.5),
    "translate": ((0, 16), (0, 8), 0.5),
    "scale": (0.8, 1.2, 0.5),
}
HOST_AUG = dict(flip=0.5, brightness=(0.8, 1.2, 0.5),
                translate=((0, 16), (0, 8), 0.5), scale=(0.8, 1.2, 0.5),
                void_class_id=0)
ROUNDS = 3  # interleaved A,B,C,D rounds; per-config min defeats tunnel drift


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_dataset(root, n_images=16):
    """A synthetic Cityscapes-layout tree of real-photo-content images
    (the reference example image tiled to 1024x512) + random trainId GT."""
    import cv2

    src = cv2.imread("/root/reference/example_images/example01_plain.png")
    assert src is not None, "reference example image missing"
    tile = cv2.resize(src, (W, 256))  # (256, 512, 3)
    rng = np.random.default_rng(0)
    img_dir = os.path.join(root, "leftImg8bit", "train", "city")
    gt_dir = os.path.join(root, "gtFine", "train", "city")
    os.makedirs(img_dir)
    os.makedirs(gt_dir)
    for i in range(n_images):
        # vary tiles slightly so PNG contents differ per image
        img = np.concatenate(
            [np.roll(tile, 17 * (i + j), axis=1) for j in range(H // 256)], axis=0)
        gt = rng.integers(0, NUM_CLASSES, (H, W), dtype=np.uint8)
        cv2.imwrite(os.path.join(img_dir, f"city_{i:06d}_000019_leftImg8bit.png"), img)
        cv2.imwrite(os.path.join(gt_dir, f"city_{i:06d}_000019_gtFine_labelIds.png"), gt)
    # split-level dirs (city subdirs inside), the reference's convention
    return os.path.join(root, "leftImg8bit", "train"), os.path.join(root, "gtFine", "train")


def _train_kwargs(device_augment):
    return dict(
        learning_rate_schedule=lambda step: 1e-4,
        record_summaries=False,
        save_during_training=False,
        eval_frequency=10**9,
        device_augment=device_augment,
        # no mid-run display syncs: a large prime the continuously growing
        # global step can never reach, so no config's timed window gets an
        # extra D2H sync the others don't (the loop checks g_step %
        # summaries_frequency; engine/model.py:820)
        summaries_frequency=999983,
    )


def timed_train(model, generator, *, device_augment, tag):
    """One timed train() call; returns sustained img/s over TIMED_STEPS.
    Callers warm up each distinct executable once beforehand."""
    t0 = time.time()
    model.train(generator, epochs=1, steps_per_epoch=TIMED_STEPS,
                **_train_kwargs(device_augment))
    float(np.asarray(model.state.step))  # hard sync (axon: block_until_ready no-op)
    dt = time.time() - t0
    rate = TIMED_STEPS * BATCH / dt
    log(f"  {tag}: {dt / TIMED_STEPS * 1e3:.1f} ms/step sustained, {rate:.1f} img/s")
    return rate


def main():
    import shutil
    import tempfile

    import jax

    from fcn8s_tensorflow_tpu.data import BatchGenerator, PackedDataset, pack_dataset
    from fcn8s_tensorflow_tpu.engine.model import FCN8s

    log(f"devices: {jax.devices()}")
    work = tempfile.mkdtemp(prefix="e2e_input_bench_")
    try:
        img_dir, gt_dir = build_dataset(work)
        gen = BatchGenerator(
            image_dirs=[img_dir], ground_truth_dirs=[gt_dir],
            image_name_split_separator="leftImg8bit",
            ground_truth_suffix="gtFine_labelIds", num_classes=NUM_CLASSES)
        packed_dir = os.path.join(work, "packed")
        pack_dataset(gen, packed_dir)
        packed = PackedDataset(packed_dir, num_classes=NUM_CLASSES)

        model = FCN8s(num_classes=NUM_CLASSES)

        # ring of preallocated batches holding the SAME photo content as the
        # packed/png configs. Content matters on this host: the axon tunnel
        # compresses H2D, so random-noise batches measured 3-5x slower than
        # identical-sized photo batches (incompressible 16.8 MB/step vs ~4).
        # A fair floor ships the same bytes as B/C, just with zero host work.
        n = packed.dataset_size
        ring = [(np.array(packed.images[np.arange(i, i + BATCH) % n]),
                 np.array(packed.labels[np.arange(i, i + BATCH) % n]))
                for i in range(0, n, BATCH)]

        def resident_gen():
            i = 0
            while True:
                yield ring[i % len(ring)]
                i += 1

        # one long-lived generator per config, shared across rounds
        configs = [
            ("resident_floor", "A resident", resident_gen(), DEVICE_AUG),
            ("packed_device_aug", "B packed+device-aug",
             packed.generate(BATCH, convert_to_one_hot=False, seed=0),
             DEVICE_AUG),
            ("png_device_aug", "C png+device-aug",
             gen.generate(BATCH, convert_to_one_hot=False, seed=0),
             DEVICE_AUG),
            ("packed_host_aug", "D packed+host-aug",
             packed.generate(BATCH, convert_to_one_hot=False, seed=0, **HOST_AUG),
             None),
        ]

        # warm up both executables (device-aug step, plain step) once
        log("warmup (compiles)...")
        for aug in (DEVICE_AUG, None):
            model.train(resident_gen(), epochs=1, steps_per_epoch=WARM_STEPS,
                        **_train_kwargs(aug))
        float(np.asarray(model.state.step))

        samples = {key: [] for key, *_ in configs}
        for r in range(ROUNDS):
            log(f"round {r + 1}/{ROUNDS}:")
            for key, tag, generator, aug in configs:
                samples[key].append(
                    timed_train(model, generator, device_augment=aug, tag=tag))
        results = {key: max(v) for key, v in samples.items()}  # best img/s

        print(json.dumps({
            "metric": "e2e_train_images_per_sec_per_chip_1024x512",
            "unit": "images/sec/chip",
            "shape": f"{BATCH}x{H}x{W}",
            "timed_steps": TIMED_STEPS,
            "rounds": ROUNDS,
            **{k: round(v, 2) for k, v in results.items()},
            "samples": {k: [round(x, 1) for x in v] for k, v in samples.items()},
            "packed_vs_resident_pct": round(
                100 * results["packed_device_aug"] / results["resident_floor"], 1),
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
