"""A/B: single-step dispatch vs lax.scan-of-S-steps per dispatch.

Motivation: the per-op profile attributes ~106 ms of the 109.5 ms wall step
to device time (TODO.md) — ~3 ms/step is host dispatch riding the axon
tunnel. Scanning S train steps inside ONE executable amortizes that
dispatch cost over S steps (the classic on-device train-loop TPU pattern);
inputs are the S stacked batches (S x 50 MB uint8 — noise next to the
537 MB conv1 activations).

Semantics: the scanned steps share one (lr, l2, keep_prob) tuple — a
schedule advances per DISPATCH, not per step (train_step's per-step RNG
fold keeps dropout masks distinct). Run within one process, steady-state,
hard-synced (float(loss) D2H; block_until_ready is a no-op here).

RESULT (2026-08-17, v5e, full-width 8x1024x512): single 108.34/108.59
ms/step vs scanned 108.44/108.46 (S=4/S=8) — +-0.1%, no win: the training
loop never syncs per step, so async dispatch already pipelines the
per-dispatch cost away. Negative result recorded in TODO.md.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(steps_per_dispatch=4, total_steps=16, h=1024, w=512, batch=8):
    import jax
    import jax.numpy as jnp

    from fcn8s_tensorflow_tpu.models.fcn8s import init_fcn8s
    from fcn8s_tensorflow_tpu.parallel.mesh import create_mesh, shard_batch
    from fcn8s_tensorflow_tpu.parallel.steps import (
        compile_multi_train_step,
        compile_train_step,
        create_train_state,
        make_optimizer,
    )

    log(f"devices: {jax.devices()}")
    mesh = create_mesh()
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, size=(batch, h, w, 3), dtype=np.uint8)
    labels = rng.integers(0, 20, size=(batch, h, w), dtype=np.uint8)
    mask = np.ones((batch,), np.float32)
    s = steps_per_dispatch
    images_s = np.broadcast_to(images, (s, *images.shape)).copy()
    labels_s = np.broadcast_to(labels, (s, *labels.shape)).copy()
    mask_s = np.broadcast_to(mask, (s, batch)).copy()

    params = jax.jit(lambda k: init_fcn8s(k, 20))(jax.random.PRNGKey(0))
    optimizer = make_optimizer()
    state = create_train_state(params, optimizer)
    key = jax.random.key(0, impl="rbg")

    step1 = compile_train_step(mesh, optimizer, 20, tensor_parallel=False,
                               example_state=state)
    stepS = compile_multi_train_step(mesh, optimizer, 20, steps_per_dispatch=s,
                                     tensor_parallel=False, example_state=state)

    im_d, lb_d, mk_d = (shard_batch(mesh, x) for x in (images, labels, mask))
    im_s, lb_s, mk_s = (jax.device_put(x) for x in (images_s, labels_s, mask_s))

    def run_single(n):
        nonlocal state
        for _ in range(n):
            state, loss = step1(state, im_d, lb_d, mk_d, key, 1e-4, 0.0, 0.5)
        return float(loss)

    def run_multi(n_dispatch):
        nonlocal state
        for _ in range(n_dispatch):
            state, losses = stepS(state, im_s, lb_s, mk_s, key, 1e-4, 0.0, 0.5)
        return float(losses[-1])

    # interleaved warmup (compile both), then timed windows
    run_single(2)
    run_multi(1)
    results = {}
    for name, fn, n, per in (("single", run_single, total_steps, total_steps),
                             ("multi", run_multi, total_steps // s, total_steps)):
        fn(1 if name == "multi" else 2)  # re-enter steady state
        t0 = time.perf_counter()
        last = fn(n)
        dt = time.perf_counter() - t0  # float() inside fn's last call synced
        results[name] = dt / per * 1e3
        log(f"{name}: {results[name]:.2f} ms/step (last loss {last:.4f})")
    log(f"delta: {results['single'] - results['multi']:+.2f} ms/step "
        f"({(results['single'] / results['multi'] - 1) * 100:+.1f}% throughput)")
    return results


if __name__ == "__main__":
    s = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    main(steps_per_dispatch=s)
