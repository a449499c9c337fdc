"""Multi-host fault-injection: crash mid-run, restart, resume bit-exactly.

The reference's only recovery story is manual re-construction from a
checkpoint (`/root/reference/fcn8s_tensorflow.py:72-101,122-125`; SURVEY.md
§5 "Failure detection: none"). The TPU-native framework's claim is stronger:
a crashed multi-host run restarted from its last checkpoint reproduces the
uninterrupted run EXACTLY, because

* the checkpoint carries step + params + full TF1-Adam state + the EMA
  weight average (engine/checkpoint.py),
* the per-step dropout/augment RNG folds the global step into one run key
  (parallel/steps.py: ``fold_in(rng, state.step)``), so replayed steps draw
  identical randomness.

The bit-exactness fingerprint covers BOTH the final params and the final
EMA average (decay 0.9 maintained every step), so a restart that restored
the weights but silently re-seeded the EMA would fail the check.

Scenario (all on one machine; localhost = DCN stand-in):

1. **Straight run** — a 2-process ``jax.distributed`` group trains
   ``TOTAL_STEPS`` on deterministic data, checkpointing at the end.
2. **Faulted run** — a fresh group trains, but process 1 calls ``os._exit``
   mid-step-3 after the step-2 checkpoint; process 0's next collective
   dies with it (distributed-runtime error), exactly as when a TPU host
   drops. The launcher observes nonzero exit codes (failure DETECTION).
3. **Resume run** — a new group restores the step-2 checkpoint and trains
   the remaining steps.
4. The final params of (1) and (3) must match bit-exactly.

Run:  python tools/multihost_fault_injection.py
Used by tests/test_multihost.py.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

NUM_PROCESSES = 2
DEVICES_PER_PROCESS = 2
PORT = 12356
TOTAL_STEPS = 4
CRASH_AFTER = 2  # checkpointed steps before the injected fault
NUM_CLASSES = 5


def child(process_id: int, mode: str, workdir: str) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEVICES_PER_PROCESS}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=NUM_PROCESSES,
        process_id=process_id,
    )
    import jax.numpy as jnp
    import numpy as np

    from fcn8s_tensorflow_tpu.engine import checkpoint as ckpt
    from fcn8s_tensorflow_tpu.models.fcn8s import init_fcn8s
    from fcn8s_tensorflow_tpu.parallel.mesh import batch_sharding, create_mesh, replicated
    from fcn8s_tensorflow_tpu.parallel.steps import (
        TrainState,
        compile_train_step,
        create_train_state,
        make_optimizer,
    )

    mesh = create_mesh()  # pure DP over all global devices
    params = init_fcn8s(jax.random.PRNGKey(0), NUM_CLASSES, width_mult=1 / 16,
                        fc_channels=64)
    optimizer = make_optimizer()
    state = create_train_state(params, optimizer)

    start_step = 0
    ema = None
    if mode == "resume":
        restore_dir = os.path.join(workdir, f"ckpt_step{CRASH_AFTER}")
        example = {"step": state.step, "params": state.params,
                   "opt_state": state.opt_state}
        restored = ckpt.load_checkpoint(restore_dir, example)
        rep = replicated(mesh)

        def put(tree):
            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
                tree,
            )

        state = TrainState(step=put(restored["step"]), params=put(restored["params"]),
                           opt_state=put(restored["opt_state"]))
        assert restored["ema"] is not None, "checkpoint must carry the EMA tree"
        ema = put(restored["ema"])
        start_step = int(restored["step"])
        assert start_step == CRASH_AFTER

    step_fn = compile_train_step(
        mesh, optimizer, NUM_CLASSES, tensor_parallel=False,
        compute_dtype=jnp.float32, example_state=state,
    )
    sharding = batch_sharding(mesh)
    global_batch = DEVICES_PER_PROCESS * NUM_PROCESSES

    def batch_for(step_i: int):
        rng = np.random.default_rng(1000 + step_i)  # deterministic per step
        images = rng.integers(0, 255, (global_batch, 32, 32, 3), np.uint8)
        labels = rng.integers(0, NUM_CLASSES, (global_batch, 32, 32), np.uint8)
        mask = np.ones((global_batch,), np.float32)
        put = lambda a: jax.make_array_from_process_local_data(sharding, a)
        return put(images), put(labels), put(mask)

    run_key = jax.random.PRNGKey(7)
    loss = None
    for step_i in range(start_step, TOTAL_STEPS):
        if mode == "fault" and process_id == 1 and step_i == CRASH_AFTER + 1:
            print(f"process 1: injecting fault before step {step_i}", flush=True)
            os._exit(17)  # simulated host loss: no cleanup, no goodbye
        im, lb, mk = batch_for(step_i)
        state, loss = step_fn(state, im, lb, mk, run_key, 1e-3, 0.0, 1.0)
        # EMA average rides the run (and the checkpoint): seeded at the first
        # step, then ema = 0.9*ema + 0.1*params — engine/model.py semantics
        ema = (jax.tree.map(jnp.copy, state.params) if ema is None else
               jax.tree.map(lambda e, p: e * 0.9 + p * 0.1, ema, state.params))
        loss = float(loss)  # sync every step so the crash lands deterministically
        print(f"process {process_id}: step {step_i} loss={loss:.6f}", flush=True)
        if step_i + 1 in (CRASH_AFTER, TOTAL_STEPS) and process_id == 0:
            ckpt.save_checkpoint(
                os.path.join(workdir, f"ckpt_step{step_i + 1}"), state,
                {"global_step": step_i + 1, "mode": mode},
                ema_params=ema,
            )
    if process_id == 0:
        # host-gathered final params+EMA fingerprint for the bit-exactness
        # check (EMA included: a restart that re-seeded the average from the
        # live params would differ here even with identical weights)
        flat = np.concatenate([
            np.asarray(jax.device_get(x)).ravel().view(np.uint8)
            for x in jax.tree.leaves(state.params) + jax.tree.leaves(ema)
        ])
        np.save(os.path.join(workdir, f"final_params_{mode}.npy"), flat)
    print(f"process {process_id}: {mode} run complete", flush=True)


def _launch(mode: str, workdir: str, expect_failure: bool = False) -> bool:
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child", str(i),
             "--mode", mode, "--workdir", workdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(NUM_PROCESSES)
    ]
    rcs = []
    for i, p in enumerate(procs):
        try:
            # In the fault scenario the survivor may block in the dead
            # collective until the distributed runtime's heartbeat timeout;
            # a survivor still wedged after 240 s counts as detected-by-
            # timeout (what a production watchdog would do) and is killed.
            out, _ = p.communicate(timeout=240 if expect_failure else 600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        tail = "\n".join(out.strip().splitlines()[-4:])
        print(f"--- {mode} process {i} (rc={p.returncode}) ---\n{tail}")
        rcs.append(p.returncode)
    if expect_failure:
        # fault DETECTION: the injected death must surface as nonzero exits —
        # the crashed process's code and a distributed-runtime error /
        # heartbeat timeout / watchdog kill on the survivor.
        return rcs[1] == 17 and rcs[0] != 0
    return all(rc == 0 for rc in rcs)


def main() -> int:
    if "--child" in sys.argv:
        i = int(sys.argv[sys.argv.index("--child") + 1])
        mode = sys.argv[sys.argv.index("--mode") + 1]
        workdir = sys.argv[sys.argv.index("--workdir") + 1]
        child(i, mode, workdir)
        return 0

    import tempfile

    import numpy as np

    workdir = tempfile.mkdtemp(prefix="fcn8s_fault_")
    print(f"workdir: {workdir}")
    if not _launch("straight", workdir):
        print("FAULT INJECTION FAILED: straight run did not complete")
        return 1
    if not _launch("fault", workdir, expect_failure=True):
        print("FAULT INJECTION FAILED: injected fault was not detected")
        return 1
    if not _launch("resume", workdir):
        print("FAULT INJECTION FAILED: resume run did not complete")
        return 1
    a = np.load(os.path.join(workdir, "final_params_straight.npy"))
    b = np.load(os.path.join(workdir, "final_params_resume.npy"))
    if a.shape == b.shape and np.array_equal(a, b):
        print("FAULT INJECTION OK: resumed run matches straight run bit-exactly")
        return 0
    print(f"FAULT INJECTION FAILED: {np.count_nonzero(a != b)} differing bytes")
    return 1


if __name__ == "__main__":
    sys.exit(main())
