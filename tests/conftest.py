"""Test configuration: run JAX on a fake 8-device CPU mesh with float64.

The standard JAX pattern for testing multi-chip sharding without hardware
(SURVEY.md section 4): force the host platform and split it into 8 virtual
devices.  float64 is enabled so CPU tests can track the float64 C reference
semantics closely; the TPU path runs float32 by default.

NOTE: this environment's sitecustomize imports jax and registers the TPU
("axon") PJRT plugin before any user code runs, and exports
JAX_PLATFORMS=axon — so env vars are too late here.  jax.config.update works
because no backend has been initialized yet at conftest import time.
"""

import os

# XLA_FLAGS is read at backend init (first jax.devices() call), which hasn't
# happened yet even though jax itself is already imported by sitecustomize.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
M3500_TXT = "/root/reference/data/M3500.txt"
M3500_GRAPH = "/root/reference/data/M3500.graph"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def m3500():
    from aprilsam_tpu.io import load_g2o_text

    return load_g2o_text(M3500_TXT)
