"""Test configuration: force an 8-device virtual CPU mesh.

The build machine exposes one real TPU chip; multi-device sharding is
validated on virtual CPU devices instead. The axon sitecustomize registers the
TPU backend unconditionally, so JAX_PLATFORMS env alone does not stick — we
must update jax.config before the backend initializes, which this conftest
does at collection time (before any test module imports txr)."""

import os
import sys

# Keep XLA from eating all host RAM across workers.
os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest

if os.environ.get("TXR_TEST_DIAG"):
    # Per-test resource trace for diagnosing in-process crashes: memory-map
    # count (vm.max_map_count exhaustion segfaults inside XLA's LLVM JIT) and
    # RSS, appended to TXR_TEST_DIAG.
    @pytest.fixture(autouse=True)
    def _diag(request):
        yield
        try:
            with open("/proc/self/maps") as f:
                n_maps = sum(1 for _ in f)
            with open("/proc/self/statm") as f:
                rss_pages = int(f.read().split()[1])
            with open(os.environ["TXR_TEST_DIAG"], "a") as f:
                f.write(f"{n_maps}\t{rss_pages * 4 // 1024}\t"
                        f"{request.node.nodeid}\n")
        except OSError:
            pass


@pytest.fixture()
def rng():
    # Function-scoped: every test sees the same deterministic stream, so no
    # test's data depends on which tests ran before it.
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def devices():
    d = jax.devices()
    assert len(d) == 8 and d[0].platform == "cpu"
    return d
