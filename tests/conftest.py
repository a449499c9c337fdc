"""Test configuration: force an 8-device virtual CPU mesh so pjit/sharding
paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

# Force CPU even when the session env points JAX_PLATFORMS at real TPU
# hardware ('axon'): unit tests must be hermetic and exercise the virtual
# 8-device mesh. TPU-hardware validation happens via bench.py / verify drives.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# A pytest plugin may already have imported jax (baking in the env default),
# so set the config knob directly too — legal until the backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8, (
    "tests require the 8-device virtual CPU mesh; got "
    f"{jax.devices()} — was a backend initialized before conftest?"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Everything not explicitly @pytest.mark.slow is 'fast', so both
    ``-m fast`` (~3 min inner loop) and ``-m slow`` select cleanly."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.fast)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


class FixedRng:
    """Host-rng stub returning pinned draws, so host and device transforms
    can be compared with identical parameters (shared by test_data and
    test_device_augment)."""

    def __init__(self, uniform_value=None, random_value=0.0, integers_value=None):
        self._u, self._r, self._i = uniform_value, random_value, integers_value

    def uniform(self, lo, hi):
        return self._u

    def random(self):
        return self._r

    def integers(self, lo, hi):
        return self._i
