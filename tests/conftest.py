import os
import sys

# Multi-device sharding tests run on a virtual CPU mesh; the real-TPU bench
# path is exercised separately by bench.py.
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAMPLE = "/root/reference/sampleData"

import pytest


@pytest.fixture(scope="session")
def sample_dir():
    return SAMPLE
