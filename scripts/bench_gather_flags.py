"""Probe: does lax.gather's ``indices_are_sorted``/``unique_indices``
hint unlock a faster TPU path for the deep-k candidate gather?

The production path sorts bin ids ascending per query, so both flags are
legitimately true for the (G,1)-slice bin gather. One JSON line each.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timed(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.ravel(out)[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.ravel(out)[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def report(name, dt, B):
    print(json.dumps({"probe": name, "ms": round(dt * 1e3, 1),
                      "qps": round(B / dt, 0)}), flush=True)


def main():
    N, B, kb, G = 1_097_728, 1024, 1000, 8
    rng = np.random.default_rng(0)
    scores = rng.standard_normal((N, B), dtype=np.float32)
    # kb sorted unique bin ids per query (production: bin ids sorted asc)
    keys = rng.random((B, N // G), dtype=np.float32)
    bins = np.sort(
        np.argpartition(keys, kb, axis=1)[:, :kb].astype(np.int32), axis=1
    )
    del keys
    elem = (bins[:, :, None] * G + np.arange(G, dtype=np.int32)).reshape(B, kb * G)
    st = jnp.asarray(scores)
    bins_d = jnp.asarray(bins)
    elem_d = jnp.asarray(elem)
    print(json.dumps({"workload": f"gather {kb}x{G} of {N}, B={B}",
                      "backend": jax.default_backend()}), flush=True)

    # baseline: take_along_axis elementwise
    fa = jax.jit(lambda s, i: jnp.take_along_axis(s, i.T, axis=0).T)
    report("take_along_axis_elem", timed(fa, st, elem_d), B)

    # lax.gather, (1,)-slices along axis 0 batched over queries via vmap,
    # with and without sortedness hints
    def g_elem(sorted_flag):
        def one(col, idx):  # col (N,), idx (kG,)
            return lax.gather(
                col, idx[:, None],
                lax.GatherDimensionNumbers(
                    offset_dims=(), collapsed_slice_dims=(0,),
                    start_index_map=(0,)),
                (1,),
                indices_are_sorted=sorted_flag, unique_indices=False,
            )
        return jax.jit(lambda s, i: jax.vmap(one, in_axes=(1, 0))(s, i))

    report("gather_elem_unsorted", timed(g_elem(False), st, elem_d), B)
    report("gather_elem_sorted", timed(g_elem(True), st, elem_d), B)

    # lax.gather with (G,)-slices at bin granularity (indices unique+sorted)
    def g_bin(sorted_flag, unique):
        def one(col, bidx):  # col (N,), bidx (kb,)
            out = lax.gather(
                col, (bidx * G)[:, None],
                lax.GatherDimensionNumbers(
                    offset_dims=(1,), collapsed_slice_dims=(),
                    start_index_map=(0,)),
                (G,),
                indices_are_sorted=sorted_flag, unique_indices=unique,
            )
            return out.reshape(-1)
        return jax.jit(lambda s, i: jax.vmap(one, in_axes=(1, 0))(s, i))

    report("gather_bin_plain", timed(g_bin(False, False), st, bins_d), B)
    report("gather_bin_hints", timed(g_bin(True, True), st, bins_d), B)

    # correctness spot-check
    a = np.asarray(fa(st, elem_d))
    b = np.asarray(g_bin(True, True)(st, bins_d))
    print(json.dumps({"probe": "exact", "ok": bool(np.array_equal(a, b))}),
          flush=True)


if __name__ == "__main__":
    main()
