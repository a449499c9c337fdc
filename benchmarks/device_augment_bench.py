"""A/B: full train step with vs without device-resident augmentation.

Measures the BASELINE.json config-4 north star — "flip/translate/scale/
brightness on-device" — as a step-time delta at the headline training shape
(8x1024x512, full-width FCN-8s, Adam, keep_prob 0.5). Augmentations compile
INTO the train step (parallel/steps.py), so the expected cost is a few ms of
VPU/gather work overlapped with the conv pipeline, vs the reference's
serial host OpenCV pass (~100s of ms per batch on CPU,
`/root/reference/data_generator/batch_generator.py:268-387`).

Run on the real TPU:  python benchmarks/device_augment_bench.py
Prints one JSON line; in-process A/B (the axon tunnel is time-shared, so
cross-process comparisons are meaningless — CLAUDE.md).
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
WARMUP = 3
ITERS = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_step(step, state, im, lb, mk, key):
    for _ in range(WARMUP):
        state, loss = step(state, im, lb, mk, key, 1e-4, 0.0, 0.5)
    float(loss)  # hard sync (block_until_ready is a no-op on axon)
    t0 = time.time()
    for _ in range(ITERS):
        state, loss = step(state, im, lb, mk, key, 1e-4, 0.0, 0.5)
    float(loss)
    return (time.time() - t0) / ITERS, state


def main():
    import jax

    from fcn8s_tensorflow_tpu.models.fcn8s import init_fcn8s
    from fcn8s_tensorflow_tpu.ops.augment_device import make_augment_fn
    from fcn8s_tensorflow_tpu.parallel.mesh import create_mesh, shard_batch
    from fcn8s_tensorflow_tpu.parallel.steps import (
        compile_train_step,
        create_train_state,
        make_optimizer,
    )

    log(f"devices: {jax.devices()}")
    mesh = create_mesh()
    rng = np.random.default_rng(0)

    params = jax.jit(lambda k: init_fcn8s(k, NUM_CLASSES))(jax.random.PRNGKey(0))
    optimizer = make_optimizer()
    state = create_train_state(params, optimizer)
    im, lb, mk = shard_batch(
        mesh,
        rng.integers(0, 255, (BATCH, H, W, 3), np.uint8),
        rng.integers(0, NUM_CLASSES, (BATCH, H, W), np.uint8),
        np.ones((BATCH,), np.float32),
    )
    key = jax.random.key(1, impl="rbg")

    base_step = compile_train_step(mesh, optimizer, NUM_CLASSES, example_state=state)
    base_dt, state = time_step(base_step, state, im, lb, mk, key)
    log(f"baseline: {base_dt * 1e3:.1f} ms/step")

    # the north-star set: flip + brightness + translate + scale, host-parity
    # parameters (reference tutorial flip 0.5; translate/scale/brightness at
    # representative magnitudes)
    aug = make_augment_fn(
        flip=0.5,
        brightness=(0.8, 1.2, 0.5),
        translate=((0, 16), (0, 8), 0.5),
        scale=(0.8, 1.2, 0.5),
        void_class_id=0,
    )
    aug_step = compile_train_step(
        mesh, optimizer, NUM_CLASSES, example_state=state, augment_fn=aug
    )
    aug_dt, state = time_step(aug_step, state, im, lb, mk, key)
    log(f"device-augmented: {aug_dt * 1e3:.1f} ms/step")

    # + the beyond-reference photometric extras on top (pure VPU
    # arithmetic, expected ~free relative to the geometric gathers)
    aug_photo = make_augment_fn(
        flip=0.5,
        brightness=(0.8, 1.2, 0.5),
        translate=((0, 16), (0, 8), 0.5),
        scale=(0.8, 1.2, 0.5),
        contrast=(0.7, 1.3, 0.5),
        saturation=(0.5, 1.5, 0.5),
        hue=(0.1, 0.5),
        gamma=(0.7, 1.4, 0.5),
        void_class_id=0,
    )
    photo_step = compile_train_step(
        mesh, optimizer, NUM_CLASSES, example_state=state, augment_fn=aug_photo
    )
    photo_dt, state = time_step(photo_step, state, im, lb, mk, key)
    log(f"+photometric extras: {photo_dt * 1e3:.1f} ms/step")

    print(json.dumps({
        "metric": "device_augment_step_overhead_ms",
        "baseline_ms_per_step": round(base_dt * 1e3, 1),
        "augmented_ms_per_step": round(aug_dt * 1e3, 1),
        "overhead_ms": round((aug_dt - base_dt) * 1e3, 1),
        "overhead_pct": round((aug_dt / base_dt - 1) * 100, 1),
        "photometric_ms_per_step": round(photo_dt * 1e3, 1),
        "photometric_marginal_ms": round((photo_dt - aug_dt) * 1e3, 1),
        "config": "flip 0.5 + brightness(0.8,1.2,0.5) + translate((0,16),(0,8),0.5) + scale(0.8,1.2,0.5)",
        "photometric_config": "+ contrast(0.7,1.3,0.5) + saturation(0.5,1.5,0.5) + hue(0.1,0.5) + gamma(0.7,1.4,0.5)",
        "shape": f"{BATCH}x{H}x{W}",
    }))


if __name__ == "__main__":
    main()
