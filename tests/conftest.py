"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh; the axon
TPU plugin (when present) is bypassed by selecting the cpu platform
in-process before any computation runs.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# CPU-backend tests don't benefit from the persistent compile cache
# (workloads/common.py enables it for the TPU tunnel), and a zstd
# cache write once segfaulted the suite while a TPU artifact queue was
# writing the same .jax_cache concurrently — keep tests out of it.
jax.config.update("jax_enable_compilation_cache", False)

# The full suite JIT-compiles hundreds of XLA CPU executables; each
# maps multiple code/data segments and the process crosses the default
# vm.max_map_count=65530 around the 105th test, at which point an mmap
# failure surfaces as a segfault inside LLVM compilation.  Raise the
# limit best-effort (the test image runs as root).
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        if int(_f.read()) < 1 << 20:
            with open("/proc/sys/vm/max_map_count", "w") as _g:
                _g.write(str(1 << 20))
except OSError:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference data not available")
    return REFERENCE_DIR


@pytest.fixture(scope="session")
def base_solution():
    """One shared baseline explicit solve (dr=0.2) reused across tests."""
    from gab1_shp2_tpu import base_system, default_co, default_params, solve_explicit

    co = default_co()
    sol = solve_explicit(base_system(), co, default_params(), dr=0.2, tf=5.0,
                         Nts=100, tol=1e-4, maxiters=20)
    return sol, co
