"""Vector-mix ops: L2 normalization and lambda-interpolation of bilingual
query embeddings, fused-friendly (pure jnp; XLA fuses these into adjacent
matmuls).

Behavioral parity with the reference's ``safe_mix``
(`onepass_dense_mix_run_custom_lang.py:342-377`):

- alpha within eps of 0 / 1 returns the primary / secondary vector as-is
  (the reference leaves endpoints unnormalized; ranking under inner
  product is scale-invariant, and the caller may normalize);
- interior alpha: lerp, then L2-renormalize;
- non-finite results fall back to the nearer endpoint vector
  (alpha > 0.5 -> secondary).
"""

from __future__ import annotations

import functools
from typing import Tuple, Union

import jax.numpy as jnp

_EPS = 1e-8


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """x / max(||x||, eps) along ``axis`` (torch.nn.functional.normalize
    semantics, used by sentence-transformers' normalize_embeddings)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def mix_and_renorm(
    primary: jnp.ndarray,
    secondary: jnp.ndarray,
    alpha: Union[float, jnp.ndarray],
    *,
    normalize_endpoints: bool = False,
) -> jnp.ndarray:
    """Batched safe_mix: (1-alpha)*primary + alpha*secondary, renormalized.

    ``primary``/``secondary`` are (B, d); ``alpha`` is a scalar or (A,)
    vector — a vector produces an (A, B, d) sweep in ONE traced program so
    an alpha-band sweep amortizes index residency (SURVEY §7 step 5).

    Non-finite mixed rows fall back to the nearer endpoint, matching the
    reference's fallback branch.
    """
    alpha_arr = jnp.asarray(alpha, dtype=jnp.float32)
    scalar = alpha_arr.ndim == 0
    a = alpha_arr.reshape(-1)[:, None, None]  # (A, 1, 1)

    p = primary.astype(jnp.float32)[None]  # (1, B, d)
    s = secondary.astype(jnp.float32)[None]

    mixed = (1.0 - a) * p + a * s
    normed = l2_normalize(mixed, axis=-1)

    finite = jnp.all(jnp.isfinite(normed), axis=-1, keepdims=True)
    fallback = jnp.where(jnp.abs(a) > 0.5, s, p)
    out = jnp.where(finite, normed, fallback)

    # endpoint passthrough (reference returns raw vectors at alpha ~ 0/1)
    if normalize_endpoints:
        p_end, s_end = l2_normalize(p, -1), l2_normalize(s, -1)
    else:
        p_end, s_end = p, s
    out = jnp.where(jnp.abs(a) <= _EPS, p_end, out)
    out = jnp.where(jnp.abs(a - 1.0) <= _EPS, s_end, out)

    return out[0] if scalar else out


# Jitted entry for HOST callers (per-alpha loops in the runners): eager
# execution costs ~10 relay dispatches per alpha on remote-TPU platforms
# (the eager-dispatch class of bug fixed for sharded search, BENCH_NOTES
# round 2). Inside an existing jit (pipeline/fused.py) call the plain
# function. Scalar alphas trace as 0-d weak arrays: no per-value recompile.
def mix_and_renorm_jit(primary, secondary, alpha, *, normalize_endpoints=False):
    return _mix_jitted()(primary, secondary, jnp.asarray(alpha, jnp.float32),
                         normalize_endpoints=normalize_endpoints)


@functools.lru_cache(maxsize=1)
def _mix_jitted():
    import jax

    return jax.jit(mix_and_renorm, static_argnames=("normalize_endpoints",))
