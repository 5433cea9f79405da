import os
import sys

# Tests run on a virtual 8-device CPU mesh: multi-chip shardings are
# validated without TPU hardware (the driver's dryrun does the same), and
# float64 paths run natively.  The environment pins JAX_PLATFORMS=axon via
# sitecustomize before conftest runs, so the platform is overridden through
# jax.config (effective because no backend has been initialised yet).
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAMPLE = "/root/reference/sampleData"

import pytest


@pytest.fixture(scope="session")
def sample_dir():
    return SAMPLE
