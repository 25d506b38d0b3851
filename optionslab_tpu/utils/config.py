"""Global configuration: dtype policy, env-driven constants, feature flags.

TPU-first dtype policy
----------------------
Compute defaults to float32 (the MXU/VPU native width). Closed-form analytics
and tests may request float64; every public function is dtype-polymorphic and
follows its input dtypes, so passing float64 arrays (with jax x64 enabled,
e.g. on CPU for validation) yields float64 results.

Reference capability covered: ``src/common/config.py:6-17`` (env constants)
and the feature-flag booleans in ``src/pricing_models/__init__.py:108-111``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Env-driven constants (reference: src/common/config.py)
# ---------------------------------------------------------------------------
DATA_DIR = os.environ.get("OPTIONSLAB_DATA_DIR", "data")
MODEL_DIR = os.environ.get("OPTIONSLAB_MODEL_DIR", "models")
DEFAULT_SEED = int(os.environ.get("OPTIONSLAB_SEED", "42"))
DEFAULT_BATCH_SIZE = int(os.environ.get("OPTIONSLAB_BATCH_SIZE", "1024"))
DEFAULT_EPOCHS = int(os.environ.get("OPTIONSLAB_EPOCHS", "200"))

# Default compute dtype: fp32 on TPU (MXU native). fp64 available by passing
# float64 inputs under jax_enable_x64.
DEFAULT_DTYPE = jnp.float32

# Numerical floors shared across pricers.
EPS_TIME = 1e-10  # treat maturities below this as expired
EPS_VOL = 1e-12  # treat vols below this as deterministic


def resolve_dtype(*args, default=None):
    """Result dtype for a pricer given its (array-like) inputs.

    Follows jnp promotion over the inputs; falls back to DEFAULT_DTYPE when
    every input is a weak python scalar.
    """
    default = default or DEFAULT_DTYPE
    dtypes = [jnp.asarray(a).dtype for a in args if a is not None]
    floats = [d for d in dtypes if jnp.issubdtype(d, jnp.floating)]
    if not floats:
        return default
    out = floats[0]
    for d in floats[1:]:
        out = jnp.promote_types(out, d)
    return out


# ---------------------------------------------------------------------------
# Feature flags (import probes, reference: pricing_models/__init__.py:108-111)
# ---------------------------------------------------------------------------
def _probe(modname: str) -> bool:
    try:
        __import__(modname)
        return True
    except Exception:
        return False


SKLEARN_AVAILABLE = _probe("sklearn")
SCIPY_AVAILABLE = _probe("scipy")
PANDAS_AVAILABLE = _probe("pandas")
YFINANCE_AVAILABLE = _probe("yfinance")
OPTUNA_AVAILABLE = _probe("optuna")
ONNX_AVAILABLE = _probe("onnxruntime")


def tpu_available() -> bool:
    try:
        return any(d.platform.startswith(("tpu", "axon")) for d in jax.devices())
    except Exception:
        return False


def default_device_kind() -> str:
    try:
        return jax.devices()[0].device_kind
    except Exception:
        return "cpu"


def enable_compilation_cache(path: str | None = None) -> str:
    """Persist compiled XLA programs across processes (the TPU analog of the
    reference's Numba ``cache=True``, SURVEY.md §5 checkpoint/resume).

    First compile of the big kernels is 20–40 s on TPU; with the cache, a
    restarted server re-loads them in milliseconds.
    """
    cache_dir = path or os.environ.get(
        "OPTIONSLAB_COMPILE_CACHE", os.path.expanduser("~/.cache/optionslab_tpu/xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir
