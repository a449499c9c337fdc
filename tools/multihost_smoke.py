"""Two-process ``jax.distributed`` smoke: the multi-host (DCN) path.

PARITY.md claims the mesh/step code "extends to multi-host via
``jax.distributed`` without code changes"; this script proves it on one
machine: two OS processes, each owning half of a virtual CPU device pool,
initialize ``jax.distributed`` (process 0 is the coordinator — exactly the
multi-host TPU pattern, with localhost standing in for DCN), build ONE
global ('data', 'model') mesh spanning both processes, and run the full
sharded train step (DP gradient psum + Megatron TP all-reduce crossing the
process boundary). Success = both processes print the same finite loss.

Run:  python tools/multihost_smoke.py                  (spawns both children)
      python tools/multihost_smoke.py --procs 4        (4-process matrix point)
      python tools/multihost_smoke.py --child I ...    (internal)

Used by tests/test_multihost.py.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

NUM_PROCESSES = 2
DEVICES_PER_PROCESS = 4
PORT = 12355


def _argval(flag: str, default: int) -> int:
    return int(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default


def child(process_id: int, num_processes: int, devices_per_process: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devices_per_process}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=num_processes,
        process_id=process_id,
    )
    import jax.numpy as jnp
    import numpy as np

    from fcn8s_tensorflow_tpu.models.fcn8s import init_fcn8s
    from fcn8s_tensorflow_tpu.parallel.mesh import batch_sharding, create_mesh
    from fcn8s_tensorflow_tpu.parallel.steps import (
        compile_train_step,
        create_train_state,
        make_optimizer,
    )

    n_global = num_processes * devices_per_process
    assert len(jax.devices()) == n_global, (
        f"expected {n_global} global devices, got {len(jax.devices())}"
    )

    # (n/2)-way DP x 2-way TP, the TP pairs spanning processes when the
    # device order interleaves; either way at least one collective crosses
    # the process boundary (DP grad psum reduces over all global devices).
    mesh = create_mesh(data=n_global // 2, model=2)
    num_classes = 20
    params = init_fcn8s(jax.random.PRNGKey(0), num_classes, width_mult=1 / 16,
                        fc_channels=64)
    optimizer = make_optimizer()
    state = create_train_state(params, optimizer)
    step = compile_train_step(
        mesh, optimizer, num_classes, tensor_parallel=True,
        compute_dtype=jnp.float32, example_state=state,
    )

    # Each process contributes its local half of the global batch
    # (multi-host input pattern: make_array_from_process_local_data).
    rng = np.random.default_rng(0)  # same seed -> same global batch content
    global_batch = 8
    images = rng.integers(0, 255, (global_batch, 64, 64, 3), np.uint8)
    labels = rng.integers(0, num_classes, (global_batch, 64, 64), np.uint8)
    mask = np.ones((global_batch,), np.float32)
    sharding = batch_sharding(mesh)

    def put(arr):
        return jax.make_array_from_process_local_data(sharding, arr)

    im, lb, mk = put(images), put(labels), put(mask)
    new_state, loss = step(state, im, lb, mk, jax.random.PRNGKey(1),
                           1e-4, 0.0, 1.0)
    loss = float(loss)
    assert np.isfinite(loss), f"non-finite loss {loss}"
    assert int(new_state.step) == 1
    print(f"process {process_id}: multihost step OK, loss={loss:.6f}",
          flush=True)


def main() -> int:
    num_processes = _argval("--procs", NUM_PROCESSES)
    devices_per_process = _argval("--devices-per-proc", DEVICES_PER_PROCESS)
    if "--child" in sys.argv:
        child(_argval("--child", 0), num_processes, devices_per_process)
        return 0

    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child", str(i),
             "--procs", str(num_processes),
             "--devices-per-proc", str(devices_per_process)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(num_processes)
    ]
    ok, losses = True, []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        tail = "\n".join(out.strip().splitlines()[-5:])
        print(f"--- process {i} (rc={p.returncode}) ---\n{tail}")
        ok &= p.returncode == 0
        for line in out.splitlines():
            if "multihost step OK, loss=" in line:
                losses.append(float(line.rsplit("=", 1)[1]))
    if ok and len(losses) == num_processes and len(set(losses)) == 1:
        print(f"MULTIHOST SMOKE OK: {num_processes} processes agree, "
              f"loss={losses[0]:.6f}")
        return 0
    print("MULTIHOST SMOKE FAILED")
    return 1


if __name__ == "__main__":
    sys.exit(main())
