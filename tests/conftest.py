"""Test configuration: 8 virtual CPU devices + x64 for precision oracles.

Env vars must be set before jax initializes its backends, hence at module
import time here (conftest is imported before any test module).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU: the axon TPU tunnel is too slow for unit tests
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-selects the TPU tunnel via
# jax.config.update("jax_platforms", "axon,cpu"); unit tests must run on the
# 8-device virtual CPU mesh, so override it back after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compile cache: repeat gate runs skip recompiles (measured
# ~2x on compile-heavy tests). Keyed by HLO hash, so code changes recompile
# automatically; programs with host callbacks (interpret-mode Pallas) are
# excluded by jax itself. Directory is gitignored.
#
# The directory is ALSO keyed by the host CPU's feature flags: the cache
# stores XLA:CPU AOT machine code, and this box's virtual CPU feature set
# can change between sessions (cpu_aot_loader then warns about mismatched
# machine features and loading the stale executable SEGFAULTS — observed
# as exit 139 inside compilation_cache.get_executable_and_time). A feature
# change now simply starts a fresh cache dir.
import hashlib  # noqa: E402


def _cpu_signature() -> str:
    # Hash the IDENTITY lines, not just flags: XLA picks codegen
    # preferences (+prefer-no-gather/scatter) from the CPU MODEL, so two
    # virtual CPUs with identical flags can still produce incompatible
    # AOT executables (cpu_aot_loader warns, then may SIGILL/segfault).
    keys = ("vendor_id", "cpu family", "model", "model name", "stepping",
            "flags")
    try:
        parts, seen = [], set()
        with open("/proc/cpuinfo") as f:
            for line in f:
                k = line.split(":")[0].strip()
                if k in keys and k not in seen:
                    seen.add(k)
                    parts.append(line)
        if parts:
            return hashlib.md5("".join(parts).encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.md5(platform.processor().encode()).hexdigest()[:10]


jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               f".jax_cache-{_cpu_signature()}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs


@pytest.fixture
def rng():
    return np.random.default_rng(42)
