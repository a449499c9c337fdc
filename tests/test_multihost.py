"""Multi-host (DCN-analog) smoke: two ``jax.distributed`` processes run one
full sharded train step over a global mesh (tools/multihost_smoke.py).
Subprocess-driven because each participant needs its own JAX runtime."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_distributed_train_step():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # Children provision their own device pools; drop this session's flags.
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_smoke.py")],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "MULTIHOST SMOKE OK" in out.stdout


@pytest.mark.slow
def test_four_process_distributed_train_step():
    """4-process x 2-device matrix point (mesh data=4 x model=2)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_smoke.py"),
         "--procs", "4", "--devices-per-proc", "2"],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "MULTIHOST SMOKE OK: 4 processes agree" in out.stdout


@pytest.mark.slow
def test_two_process_sharded_input():
    """Each process feeds ONLY its generate(shard=...) slice of a shared
    dataset via make_array_from_process_local_data; the smoke asserts the
    shards are disjoint-covering and the global psum loss is identical."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_smoke.py"),
         "--sharded-input"],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "sharded input OK" in out.stdout
    assert "MULTIHOST SMOKE OK" in out.stdout


@pytest.mark.slow
def test_fault_injection_resume_bit_exact():
    """Kill a process mid-run; restart from checkpoint; final params must
    match the uninterrupted run bit-exactly (tools/multihost_fault_injection.py)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_fault_injection.py")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
    assert "FAULT INJECTION OK" in out.stdout
