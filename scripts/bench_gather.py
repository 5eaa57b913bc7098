"""Probe candidate-score gather strategies for the deep-k path.

BENCH deepk round 2: at k=1000 the element gather of k*G=8000 scores per
query from the (N, B) score matrix costs 139 ms (B=1024) — the single
largest phase. Candidates:

  a) XLA take_along_axis on (N, B)  [current: 139 ms]
  b) XLA take_along_axis on (B, N)  [transposed layout]
  c) Pallas tile-scan gather: stream (tile_n, lane_b) score tiles
     sequentially, per-lane take_along_axis of in-range indices into a
     resident (kG, lane_b) accumulator  [bandwidth-bound by one
     sequential score re-read]
  d) (c) with bf16 scores (halves the re-read)

One JSON line per probe.
"""

import functools
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.ravel(jax.tree.leaves(out)[0])[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], out


def report(name, dt, B):
    print(json.dumps({"probe": name, "ms": round(dt * 1e3, 1),
                      "qps": round(B / dt, 0)}), flush=True)


# --- pallas tile-scan gather ------------------------------------------------

def _scan_gather_kernel(idx_ref, s_ref, o_ref, *, tile_n):
    # Mosaic's dynamic-gather lowering requires indices.shape ==
    # operand.shape, so the index/output blocks are padded to tile_n rows.
    j = pl.program_id(1)
    base = j * tile_n
    local = idx_ref[:] - base                      # (tile_n, lane_b) int32
    inb = (local >= 0) & (local < tile_n)
    clamped = jnp.where(inb, local, 0)
    vals = jnp.take_along_axis(s_ref[:], clamped, axis=0)  # per-lane gather

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] = jnp.where(inb, vals.astype(o_ref.dtype), o_ref[:])


def scan_gather(scores_t, idx, *, tile_n=8192, lane_b=128, interpret=False):
    """out[s, q] = scores_t[idx[s, q], q]; scores_t (Npad, B), idx (kg, B).

    Grid (i: query-lane tiles, j: doc tiles, j innermost): the idx and
    output blocks are VMEM-resident across the j sweep (constant block
    index), the score tile streams; every score column is read exactly
    once (disjoint (tile_n, lane_b) blocks). kg is padded up to tile_n
    (Mosaic gather wants matching shapes); VMEM = tile_n*lane_b*(4+4) +
    2*tile_n*lane_b*itemsize.
    """
    n_pad, b = scores_t.shape
    kg = idx.shape[0]
    assert kg <= tile_n, (kg, tile_n)
    assert n_pad % tile_n == 0 and b % lane_b == 0
    if kg < tile_n:  # pad index rows with -1 (never in range)
        idx = jnp.pad(idx, ((0, tile_n - kg), (0, 0)), constant_values=-1)
    kernel = functools.partial(_scan_gather_kernel, tile_n=tile_n)
    out = pl.pallas_call(
        kernel,
        grid=(b // lane_b, n_pad // tile_n),
        in_specs=[
            pl.BlockSpec((tile_n, lane_b), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, lane_b), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, lane_b), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tile_n, b), jnp.float32),
        interpret=interpret,
    )(idx, scores_t)
    return out[:kg]


def main():
    N, B, kG = 1_097_728, 1024, 8000  # N a multiple of tile_n=8192
    rng = np.random.default_rng(0)
    scores = rng.standard_normal((N, B), dtype=np.float32)
    # sorted ascending per query (the production path sorts bin ids)
    idx_np = np.sort(
        rng.integers(0, N, size=(B, kG), dtype=np.int32), axis=1
    )
    print(json.dumps({"workload": f"gather {kG} of {N} rows, B={B}",
                      "backend": jax.default_backend()}), flush=True)

    st = jnp.asarray(scores)
    idx = jnp.asarray(idx_np)

    # (a) XLA on (N, B) — baseline
    fa = jax.jit(lambda s, i: jnp.take_along_axis(s, i.T, axis=0).T)
    dt, out_a = timed(fa, st, idx)
    report("xla_NB_f32", dt, B)

    # (c) pallas tile-scan on (N, B)
    for tile_n in (8192,):
        fc = jax.jit(functools.partial(scan_gather, tile_n=tile_n, lane_b=128))
        dt, out_c = timed(lambda s, i: fc(s, i.T), st, idx)
        report(f"pallas_scan_NB_f32_t{tile_n}", dt, B)
        ok = np.array_equal(np.asarray(out_c)[:, :8], np.asarray(out_a)[:8].T)
        print(json.dumps({"probe": f"pallas_scan_t{tile_n}_exact", "ok": bool(ok)}),
              flush=True)
        out_c.delete()

    # (d) pallas tile-scan on bf16 scores
    stb = st.astype(jnp.bfloat16)
    fd = jax.jit(functools.partial(scan_gather, tile_n=8192, lane_b=128))
    dt, out_d = timed(lambda s, i: fd(s, i.T), stb, idx)
    report("pallas_scan_NB_bf16_t8192", dt, B)
    out_d.delete()
    out_a.delete()
    del stb

    # (b) XLA on (B, N) layout
    sbn = jnp.asarray(np.ascontiguousarray(scores.T))
    st.delete()
    fb = jax.jit(lambda s, i: jnp.take_along_axis(s, i, axis=1))
    dt, out_b = timed(fb, sbn, idx)
    report("xla_BN_f32", dt, B)


if __name__ == "__main__":
    main()
