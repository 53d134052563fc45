import os
import sys

# Multi-device CPU simulation must be configured before jax initialises its
# backends. The axon sitecustomize in this image force-selects the TPU
# platform regardless of JAX_PLATFORMS, so reset the config knob directly.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


# ---- fast/e2e split: `pytest -q tests/` runs the fast set (<5 min on this
# 1-core host); `pytest --run-e2e` adds the slow end-to-end tests
# (multi-epoch training loops, full CLI runs, HF-scale parity).

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--run-e2e", action="store_true", default=False,
                     help="also run tests marked e2e (full suite)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--run-e2e"):
        return
    skip = pytest.mark.skip(reason="e2e test: enable with --run-e2e")
    for item in items:
        if "e2e" in item.keywords:
            item.add_marker(skip)
