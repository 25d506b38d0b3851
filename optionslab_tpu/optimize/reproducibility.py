"""Reproducibility kit: seeds, determinism, data hashing, thread pinning.

Reference capabilities covered (SURVEY.md §2.7, ``src/optimization/
reproducibility.py:87-254``): global seeding across frameworks, SHA256
per-trial seeds, BLAS/OMP thread pinning, deterministic-algorithm toggles,
seeded CV splitting, data hashing.

TPU-first: JAX randomness is already explicit (keys are data — SURVEY.md §7
invariant #3), so ``set_global_seed`` mainly pins the HOST-side libraries
(numpy/random/torch-if-present) used by data prep and sklearn models;
``trial_key`` derives independent jax keys per trial from SHA256.
"""

from __future__ import annotations

import hashlib
import os
import random

import numpy as np

import jax


def set_global_seed(seed: int = 42) -> None:
    """Seed python/numpy(/torch if importable) and PYTHONHASHSEED."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    try:
        import torch

        torch.manual_seed(seed)
        torch.use_deterministic_algorithms(True, warn_only=True)
    except ImportError:
        pass


def get_trial_seed(base_seed: int, trial_number: int, study_name: str = "") -> int:
    """Deterministic, well-separated per-trial seed via SHA256
    (reference: ``reproducibility.py:122``)."""
    payload = f"{study_name}|{base_seed}|{trial_number}".encode()
    return int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")


def trial_key(base_seed: int, trial_number: int, study_name: str = ""):
    """jax PRNG key for a trial (the TPU-native face of get_trial_seed)."""
    return jax.random.PRNGKey(get_trial_seed(base_seed, trial_number, study_name))


def set_thread_limits(n_threads: int = 1) -> None:
    """Pin BLAS/OMP thread pools for run-to-run determinism
    (reference: ``reproducibility.py:144``)."""
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
                "NUMEXPR_NUM_THREADS"):
        os.environ[var] = str(n_threads)


def compute_data_hash(data) -> str:
    """SHA256 of array/DataFrame contents (reference: ``:254``)."""
    if hasattr(data, "to_csv"):
        payload = data.to_csv(index=False).encode()
    else:
        payload = np.ascontiguousarray(np.asarray(data)).tobytes()
    return hashlib.sha256(payload).hexdigest()


def seeded_kfold(n: int, k: int, seed: int):
    """Deterministic k-fold index generator (reference seeded CV splitter)."""
    rng = np.random.default_rng(seed)
    idx = rng.permutation(n)
    folds = np.array_split(idx, k)
    for i in range(k):
        val = folds[i]
        train = np.concatenate([folds[j] for j in range(k) if j != i])
        yield train, val


def environment_fingerprint() -> dict:
    """Versions + git commit for study metadata (reference:
    ``study_manager.py:47-88``)."""
    import platform
    import subprocess
    import sys

    try:
        commit = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                                text=True, timeout=5).stdout.strip() or None
    except Exception:
        commit = None
    return {
        "python": sys.version.split()[0],
        "platform": platform.platform(),
        "jax": jax.__version__,
        "numpy": np.__version__,
        "git_commit": commit,
        "device": str(jax.devices()[0]) if jax.devices() else "none",
    }
