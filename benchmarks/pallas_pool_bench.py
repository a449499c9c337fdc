"""A/B: Pallas packed-lane max-pool pair vs XLA reduce_window (pool1).

Measures (in one process, steady-state — the axon tunnel is time-shared):

1. standalone fwd+bwd pair at the pool1 shape (8,1024,512,64) bf16, both
   impls, inputs device-resident in the layout each impl wants;
2. the full train step with pool1 swapped to the Pallas pair (the rest of
   the model untouched) vs the default step.

(1) isolates the packed-lane win; (2) includes the boundary relayouts the
XLA graph inserts around the kernel (the producer conv writes lane-padded
{3,0,2,1:T(8,128)(2,1)}, the kernel wants row-major packed). See
ops/pallas_pool.py docstring for the recorded verdict.

Run: python benchmarks/pallas_pool_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N, H, W, C = 8, 1024, 512, 64
WARMUP, ITERS = 3, 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from fcn8s_tensorflow_tpu.models import vgg16 as vgg16_mod
    from fcn8s_tensorflow_tpu.models.fcn8s import init_fcn8s
    from fcn8s_tensorflow_tpu.ops.nn import max_pool_2x2
    from fcn8s_tensorflow_tpu.ops.pallas_pool import max_pool_2x2_pallas
    from fcn8s_tensorflow_tpu.parallel.mesh import create_mesh, shard_batch
    from fcn8s_tensorflow_tpu.parallel.steps import (
        compile_train_step,
        create_train_state,
        make_optimizer,
    )

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x_host = rng.standard_normal((N, H, W, C)).astype(np.float32)
    dy_host = rng.standard_normal((N, H // 2, W // 2, C)).astype(np.float32)

    results = {}

    # ---- standalone pair ----
    def pair_time(pool_fn, tag):
        x = jnp.asarray(x_host, jnp.bfloat16)
        dy = jnp.asarray(dy_host, jnp.bfloat16)

        @jax.jit
        def fwd_bwd(x, dy):
            y, vjp = jax.vjp(pool_fn, x)
            (dx,) = vjp(dy)
            # scalar probes keep both outputs live without a big D2H
            return y.astype(jnp.float32).sum(), dx.astype(jnp.float32).sum()

        for _ in range(WARMUP):
            a, b = fwd_bwd(x, dy)
        float(a)
        t0 = time.time()
        for _ in range(ITERS):
            a, b = fwd_bwd(x, dy)
        float(a), float(b)
        dt = (time.time() - t0) / ITERS * 1e3
        log(f"standalone {tag}: {dt:.2f} ms fwd+bwd")
        return dt

    results["standalone_xla_ms"] = round(pair_time(max_pool_2x2, "xla"), 2)
    results["standalone_pallas_ms"] = round(
        pair_time(lambda x: max_pool_2x2_pallas(x, False), "pallas"), 2)

    # ---- full train step A/B ----
    mesh = create_mesh()
    params = jax.jit(lambda k: init_fcn8s(k, 20))(jax.random.PRNGKey(0))
    optimizer = make_optimizer()
    state = create_train_state(params, optimizer)
    im, lb, mk = shard_batch(
        mesh,
        rng.integers(0, 255, (N, H, W, 3), np.uint8),
        rng.integers(0, 20, (N, H, W), np.uint8),
        np.ones((N,), np.float32),
    )
    key = jax.random.key(1, impl="rbg")

    def step_time(tag):
        # fresh state per run: the compiled step DONATES its carried state,
        # so a shared one is deleted after the first run's first call
        params = jax.jit(lambda k: init_fcn8s(k, 20))(jax.random.PRNGKey(0))
        s = create_train_state(params, optimizer)
        step = compile_train_step(mesh, optimizer, 20, example_state=s)
        for _ in range(WARMUP):
            s, loss = step(s, im, lb, mk, key, 1e-4, 0.0, 0.5)
        float(loss)
        t0 = time.time()
        for _ in range(ITERS):
            s, loss = step(s, im, lb, mk, key, 1e-4, 0.0, 0.5)
        float(loss)
        dt = (time.time() - t0) / ITERS * 1e3
        log(f"train step [{tag}]: {dt:.1f} ms")
        return dt

    results["step_default_ms"] = round(step_time("default pool"), 1)

    # swap pool1 only (C==64 is unique to block 1)
    orig = vgg16_mod.max_pool_2x2

    def hybrid_pool(x):
        if x.shape[-1] == 64 and x.shape[1] % 16 == 0:
            return max_pool_2x2_pallas(x, False)
        return orig(x)

    vgg16_mod.max_pool_2x2 = hybrid_pool
    try:
        results["step_pallas_pool1_ms"] = round(step_time("pallas pool1"), 1)
    finally:
        vgg16_mod.max_pool_2x2 = orig

    results["step_delta_ms"] = round(
        results["step_pallas_pool1_ms"] - results["step_default_ms"], 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
