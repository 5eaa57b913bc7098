"""Two-process ``jax.distributed`` CPU worker.

Spawned by tests/test_multihost.py (one process per rank) to validate the
multi-host path for real — the reference has nothing here (SURVEY §2.3),
but the framework's DCN story (`parallel/multihost.py`) must be exercised
with an actual coordinator, an actual cross-process Gloo collective, and
rows uploaded strictly from process-local data.

Flow per rank:
  1. ``initialize_multihost`` against a localhost coordinator.
  2. Build the global mesh over all processes' (virtual CPU) devices.
  3. Upload index rows via ``shard_rows_multihost`` — ``rows_fn`` slices a
     seeded matrix and ASSERTS it is only asked for this process's
     ``process_local_rows`` window.
  4. Run one exact sharded search (all_gather merge crosses the process
     boundary) and assert parity with a local numpy oracle.

Prints ``PARITY_OK <rank>`` on success; any failure exits nonzero.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def main() -> None:
    rank, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    import jax

    from codemix_dense_retrieval_tpu.parallel.multihost import (
        global_mesh,
        initialize_multihost,
        process_local_rows,
        shard_rows_multihost,
    )
    from codemix_dense_retrieval_tpu.parallel.sharded_search import (
        sharded_topk_ip,
    )

    assert initialize_multihost(f"localhost:{port}", nproc, rank)
    assert jax.process_count() == nproc, jax.process_count()
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    assert n_global == n_local * nproc, (n_local, n_global)

    mesh = global_mesh(shard=n_global, tp=1)

    # deterministic corpus: every rank can build any row range on demand,
    # but shard_rows_multihost must only ever ask for the local window
    n, dim, k = 1000, 64, 10
    rng = np.random.default_rng(7)
    docs_full = rng.standard_normal((n, dim)).astype(np.float32)
    docs_full /= np.linalg.norm(docs_full, axis=1, keepdims=True)
    queries = rng.standard_normal((16, dim)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    asked: list[range] = []

    def rows_fn(start: int, stop: int) -> np.ndarray:
        asked.append(range(start, stop))
        return docs_full[start:stop]

    docs_dev, counts, rows_per_shard = shard_rows_multihost(
        rows_fn, n, dim, np.float32, mesh, pad_multiple=32
    )
    local = process_local_rows(rows_per_shard * n_global, rows_per_shard)
    assert asked, "rows_fn never called — no addressable shard materialized"
    for r in asked:
        assert local.start <= r.start and r.stop <= max(local.stop, r.start), (
            r,
            local,
        )

    vals, gids = sharded_topk_ip(
        queries, docs_dev, counts, k, mesh=mesh, method="bins_xla",
        bin_size=8, tile_n=32,
    )
    jax.block_until_ready((vals, gids))

    # replicated outputs: every process holds the full (B, k) result
    vals_np, gids_np = np.asarray(vals), np.asarray(gids)

    # numpy oracle with FAISS tie-breaking (lower id wins)
    scores = queries @ docs_full.T
    order = np.lexsort((np.arange(n)[None, :].repeat(len(queries), 0), -scores), axis=1)
    oracle_ids = order[:, :k]
    np.testing.assert_array_equal(gids_np, oracle_ids)
    np.testing.assert_allclose(
        vals_np, np.take_along_axis(scores, oracle_ids, axis=1), rtol=1e-5
    )

    # sketch tier across the REAL process boundary: per-shard
    # certificates AND-combine through a cross-process all_gather, and
    # certified rows must match the exact result above bit-for-bit
    import jax.numpy as jnp

    from codemix_dense_retrieval_tpu.ops.sketch import fit_sketch, sketch_rows
    from codemix_dense_retrieval_tpu.parallel.sharded_search import (
        sharded_topk_ip_sketch,
    )

    proj = jnp.asarray(fit_sketch(docs_full, dim // 2))
    sk, tails = jax.jit(sketch_rows)(docs_dev, proj)
    s_vals, s_gids, cert = sharded_topk_ip_sketch(
        queries, docs_dev, counts, sk, tails, proj, k, mesh=mesh,
        probe_bins=16, bin_size=8, super_size=2, tile_n=32,
    )
    jax.block_until_ready((s_vals, s_gids, cert))
    cert_np = np.asarray(cert)
    assert cert_np.shape == (16,)
    for qi in np.flatnonzero(cert_np):
        np.testing.assert_array_equal(np.asarray(s_gids)[qi], oracle_ids[qi])

    print(f"PARITY_OK {rank} cert={cert_np.mean():.2f}", flush=True)


if __name__ == "__main__":
    main()
