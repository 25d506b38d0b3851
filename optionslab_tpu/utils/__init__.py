from .config import (
    DEFAULT_DTYPE,
    DEFAULT_SEED,
    enable_compilation_cache,
    resolve_dtype,
    tpu_available,
)
from .exceptions import (
    ArbitrageViolationError,
    CalibrationError,
    ConvergenceError,
    DataError,
    DependencyError,
    ModelError,
    OptionsLabTPUError,
    ValidationError,
)
from .logging import get_logger, setup_logging
from .timing import Timer, benchmark_fn, get_timings, reset_timings, timed
from .validation import (
    check_non_negative,
    check_option_type,
    check_positive,
    check_required_columns,
)

__all__ = [
    "DEFAULT_DTYPE",
    "DEFAULT_SEED",
    "resolve_dtype",
    "tpu_available",
    "enable_compilation_cache",
    "OptionsLabTPUError",
    "ValidationError",
    "CalibrationError",
    "ConvergenceError",
    "ArbitrageViolationError",
    "DataError",
    "ModelError",
    "DependencyError",
    "setup_logging",
    "get_logger",
    "timed",
    "Timer",
    "benchmark_fn",
    "get_timings",
    "reset_timings",
    "check_required_columns",
    "check_positive",
    "check_non_negative",
    "check_option_type",
]
