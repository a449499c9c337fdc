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
