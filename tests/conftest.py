"""Test configuration: 8 virtual CPU devices + x64 for precision oracles.

Env vars must be set before jax initializes its backends, hence at module
import time here (conftest is imported before any test module).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU: the axon TPU tunnel is too slow for unit tests
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Cap XLA:CPU codegen at AVX2: this VM's virtual CPU advertises exotic
# AVX512 subsets (fp16/bf16/vbmi2...) AND changes model between sessions;
# two full-gate runs segfaulted (exit 139) ~300 tests in, inside
# backend_compile_and_load / executable serialization, on the largest
# scan programs — crash-free standalone, so it is accumulated native
# JIT state on the exotic ISA paths. AVX2 is the conservative, fast,
# everywhere-supported tier. Override with OPTIONSLAB_FULL_ISA=1.
if ("xla_cpu_max_isa" not in flags
        and os.environ.get("OPTIONSLAB_FULL_ISA") != "1"):
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The axon sitecustomize force-selects the TPU tunnel via
# jax.config.update("jax_platforms", "axon,cpu"); unit tests must run on the
# 8-device virtual CPU mesh, so override it back after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compile cache — OPT-IN via OPTIONSLAB_COMPILE_CACHE=1.
# Repeat gate runs skip recompiles (measured ~2x on compile-heavy tests);
# keyed by HLO hash, so code changes recompile automatically; programs with
# host callbacks (interpret-mode Pallas) are excluded by jax itself.
# Directory is gitignored.
#
# OFF BY DEFAULT because the XLA:CPU AOT machinery has segfaulted twice on
# this box's session-varying virtual CPU: (a) LOADING an entry compiled
# under a different CPU feature set/model (exit 139 inside
# compilation_cache.get_executable_and_time — mitigated by keying the dir
# by CPU identity below), and (b) FLAKILY while SERIALIZING a large
# executable (exit 139 inside compilation_cache.put_executable_and_time,
# seen mid-gate on american_price_interval; the same test passes alone).
# pytest runs in ONE process, so the in-memory jit cache already dedups
# within a run — the persistent cache only speeds up RE-runs in the same
# session. Enable it when iterating locally; leave it off for one-shot
# driver/judge runs where it is pure crash risk for zero win.
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


if os.environ.get("OPTIONSLAB_COMPILE_CACHE") == "1":
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
