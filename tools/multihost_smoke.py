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
      python tools/multihost_smoke.py --sharded-input  (disjoint per-host data)
      python tools/multihost_smoke.py --child I ...    (internal)

``--sharded-input`` additionally proves the multi-host INPUT pipeline:
each process owns a ``BatchGenerator.generate(shard=(process_id,
num_processes))`` slice of one shared dataset and contributes only its
local images via ``jax.make_array_from_process_local_data`` — the
canonical multi-host feeding pattern (no cross-host data exchange).
The parent asserts the consumed shards are disjoint, cover the epoch,
and that every process still computes the identical global psum loss.

Used by tests/test_multihost.py.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

NUM_PROCESSES = 2
DEVICES_PER_PROCESS = 4
PORT = 12355


def _argval(flag: str, default: int) -> int:
    return int(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default


def _strarg(flag: str):
    return sys.argv[sys.argv.index(flag) + 1] if flag in sys.argv else None


def make_dataset(root: str, n_images: int, num_classes: int) -> None:
    """Tiny Cityscapes-shaped tree whose image i is the constant pixel
    value ``i*10 + 5`` — a child can report exactly which images its
    shard consumed by reading one pixel back."""
    import numpy as np
    from PIL import Image

    img_dir = os.path.join(root, "img", "aachen")
    gt_dir = os.path.join(root, "gt", "aachen")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    for i in range(n_images):
        stem = f"aachen_{i:06d}_000019"
        Image.fromarray(
            np.full((64, 64, 3), i * 10 + 5, np.uint8)
        ).save(os.path.join(img_dir, stem + "_leftImg8bit.png"))
        Image.fromarray(
            np.full((64, 64), i % 20, np.uint8)
        ).save(os.path.join(gt_dir, stem + "_gtFine_labelIds.png"))


def child(process_id: int, num_processes: int, devices_per_process: int,
          data_dir: str | None = None) -> None:
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

    # Each process contributes its local slice of the global batch
    # (multi-host input pattern: make_array_from_process_local_data).
    global_batch = 8
    if data_dir is not None:
        # Disjoint per-host input: this process reads ONLY its
        # generate(shard=...) slice of the shared dataset — no other
        # host ever touches these files (batch_generator.py:140-417's
        # single-host loop has no analog; this is the TPU-pod pattern).
        from fcn8s_tensorflow_tpu.data.generator import BatchGenerator

        gen = BatchGenerator(
            image_dirs=[os.path.join(data_dir, "img")],
            ground_truth_dirs=[os.path.join(data_dir, "gt")],
            image_name_split_separator="leftImg8bit",
            ground_truth_suffix="gtFine_labelIds",
            num_classes=num_classes,
        )
        local_batch = global_batch // num_processes
        it = gen.generate(batch_size=local_batch, convert_to_one_hot=False,
                          shuffle=True, seed=7,
                          shard=(process_id, num_processes))
        imgs, gts = next(it)
        images = np.stack(imgs).astype(np.uint8)
        labels = np.stack(gts).astype(np.uint8)
        mask = np.ones((local_batch,), np.float32)
        consumed = sorted(int(im[0, 0, 0]) // 10 for im in images)
        print(f"process {process_id}: consumed={consumed}", flush=True)
    else:
        rng = np.random.default_rng(0)  # same seed -> same global batch
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
    data_dir = _strarg("--data-dir")
    if "--child" in sys.argv:
        child(_argval("--child", 0), num_processes, devices_per_process,
              data_dir)
        return 0

    sharded = "--sharded-input" in sys.argv
    extra = []
    if sharded:
        import tempfile

        data_dir = tempfile.mkdtemp(prefix="multihost_data_")
        make_dataset(data_dir, n_images=8, num_classes=20)
        extra = ["--data-dir", data_dir]

    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child", str(i),
             "--procs", str(num_processes),
             "--devices-per-proc", str(devices_per_process)] + extra,
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(num_processes)
    ]
    ok, losses, consumed = True, [], {}
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        tail = "\n".join(out.strip().splitlines()[-5:])
        print(f"--- process {i} (rc={p.returncode}) ---\n{tail}")
        ok &= p.returncode == 0
        for line in out.splitlines():
            if "multihost step OK, loss=" in line:
                losses.append(float(line.rsplit("=", 1)[1]))
            if "consumed=" in line:
                consumed[i] = json.loads(line.rsplit("=", 1)[1])
    if sharded and ok:
        shards = [set(consumed.get(i, ())) for i in range(num_processes)]
        union = set().union(*shards)
        disjoint = sum(len(s) for s in shards) == len(union)
        if not (disjoint and len(union) == 8):
            print(f"MULTIHOST SMOKE FAILED: shards not disjoint-covering: "
                  f"{consumed}")
            return 1
        print(f"sharded input OK: disjoint shards {sorted(map(sorted, shards))}")
    if ok and len(losses) == num_processes and len(set(losses)) == 1:
        print(f"MULTIHOST SMOKE OK: {num_processes} processes agree, "
              f"loss={losses[0]:.6f}")
        return 0
    print("MULTIHOST SMOKE FAILED")
    return 1


if __name__ == "__main__":
    sys.exit(main())
