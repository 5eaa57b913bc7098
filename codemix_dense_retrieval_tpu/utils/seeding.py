"""Determinism helpers (reference seeds random/numpy/torch at seed=42,
`onepass_dense_run.py:122-125`; here the JAX PRNG key is the primary seed)."""

from __future__ import annotations

import random

import numpy as np


def seed_everything(seed: int = 42) -> "np.random.Generator":
    """Seed python + numpy global RNGs and return a fresh numpy Generator.

    JAX code should derive keys via ``jax.random.key(seed)`` at call sites;
    this helper covers the host-side (selection sampling, shuffling) paths.
    """
    random.seed(seed)
    np.random.seed(seed)
    return np.random.default_rng(seed)
