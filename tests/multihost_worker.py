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
    ndev_expect = int(sys.argv[4]) if len(sys.argv) > 4 else None

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
    if ndev_expect is not None:
        assert n_local == ndev_expect, (n_local, ndev_expect)

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

    # merge-payload assertion (VERDICT r4 item 9): the only data that
    # crosses device (and hence process/DCN) boundaries in the merge is
    # the per-shard (k values, k global ids) candidate lists — a few KB —
    # never anything corpus-sized. Checked on the COMPILED program: every
    # all-gather in the HLO must produce at most B x (S*k) elements.
    import re

    from codemix_dense_retrieval_tpu.parallel.sharded_search import (
        _build_sharded_search,
    )

    fn = _build_sharded_search(
        mesh, "shard", k, "bins_xla", 8, 32, 256, True, False,
        docs_dev.shape[0] // n_global,
    )
    dummy_scales = jax.device_put(
        np.zeros(n_global, np.float32),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("shard")),
    )
    hlo = fn.lower(
        jax.ShapeDtypeStruct(queries.shape, np.float32),
        jax.ShapeDtypeStruct(docs_dev.shape, docs_dev.dtype),
        jax.ShapeDtypeStruct(counts.shape, counts.dtype),
        jax.ShapeDtypeStruct(dummy_scales.shape, np.float32),
    ).compile().as_text()
    ag_shapes = re.findall(
        r"=\s+[a-z0-9]+\[([0-9,]*)\][^\n]*?\ball-gather(?:-start)?\(", hlo)
    assert ag_shapes, "no all-gather in the compiled merge program"
    b = queries.shape[0]
    max_payload = b * n_global * k  # (B, S*k) candidate lists
    for shp in ag_shapes:
        elems = int(np.prod([int(x) for x in shp.split(",") if x] or [1]))
        assert elems <= max_payload, (
            f"all-gather moves {elems} elements (> merge payload "
            f"{max_payload}); shape=[{shp}]"
        )
    # and the merge payload itself is tiny vs the sharded corpus
    assert max_payload * 8 < docs_dev.shape[0] * docs_dev.shape[1] * 4 / 10

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
