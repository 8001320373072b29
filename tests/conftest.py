"""Test configuration: run on CPU with 8 virtual devices so sharding tests work
without TPU hardware (the driver separately dry-runs multichip compile)."""

import os

# Must be set before the CPU client is created.  NOTE: the axon TPU plugin in
# this image overrides the JAX_PLATFORMS env var, so we must also force the
# platform through jax.config (see below).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
# separate compilation cache for the CPU test platform (avoids AOT
# machine-feature mismatch with TPU-session cache entries)
os.environ.setdefault(
    "H264TPU_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache", "cpu"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


REF_ROOT = "/root/reference"
FOREMAN_QCIF = os.path.join(
    REF_ROOT, "4.对比程序", "jm18.5", "JM", "bin", "foreman_part_qcif.yuv")


@pytest.fixture(scope="session")
def foreman_qcif():
    """Real test sequence shipped with the reference (176x144 YUV420)."""
    if not os.path.exists(FOREMAN_QCIF):
        pytest.skip("foreman_part_qcif.yuv not available")
    from h264tpu.utils.yuv import YUVReader
    return YUVReader(FOREMAN_QCIF, 176, 144)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
