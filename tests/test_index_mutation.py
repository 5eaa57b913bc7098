"""Online index mutation (FAISS add_with_ids / remove_ids analogs) on the
virtual 8-CPU mesh: adds fill capacity-padded shard space, removes
swap-delete against the count mask, search results stay EXACT (oracle
parity) after every mutation, and the sketch tier tracks mutations."""

import numpy as np
import pytest

from codemix_dense_retrieval_tpu.index import DenseFlatIndex
from codemix_dense_retrieval_tpu.ops.topk import topk_ip_oracle
from codemix_dense_retrieval_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def mesh(eight_cpu_devices):
    return make_mesh(shard=8, tp=1, devices=eight_cpu_devices)


def _normalize(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _rows(rng, n, d=32):
    return _normalize(rng.standard_normal((n, d)).astype(np.float32))


def _oracle_check(idx, queries, live, k):
    """live: dict docid -> vector. Search must match brute force exactly."""
    vals, docids = idx.search(queries, k)
    ids = sorted(live)
    mat = np.stack([live[i] for i in ids])
    ovals, oidx = topk_ip_oracle(queries, mat, k)
    for q in range(len(queries)):
        got = list(docids[q])
        want = [ids[j] for j in oidx[q]]
        # scores must match; docid order may differ only on exact ties
        np.testing.assert_allclose(vals[q], ovals[q], rtol=2e-2, atol=2e-2)
        assert set(got) == set(want) or got == want, (q, got, want)


def _fresh(rng, mesh, n=500, d=32):
    docs = _rows(rng, n, d)
    ids = [f"d{i}" for i in range(n)]
    idx = DenseFlatIndex.build(docs, ids, dtype="float32")
    idx.to_device(mesh, pad_multiple=128)
    live = {f"d{i}": docs[i] for i in range(n)}
    return idx, live


def test_add_then_search(mesh):
    rng = np.random.default_rng(0)
    idx, live = _fresh(rng, mesh)
    queries = _rows(rng, 8)
    new = _rows(rng, 40)
    idx.add(new, [f"n{i}" for i in range(40)])
    for i in range(40):
        live[f"n{i}"] = new[i]
    assert idx.count == 540
    _oracle_check(idx, queries, live, 20)


def test_remove_then_search(mesh):
    rng = np.random.default_rng(1)
    idx, live = _fresh(rng, mesh)
    queries = _rows(rng, 8)
    # remove a mix of positions incl. shard-boundary rows
    gone = [f"d{i}" for i in (0, 1, 63, 64, 127, 128, 499, 250)]
    assert idx.remove(gone) == len(gone)
    for g in gone:
        live.pop(g)
    assert idx.count == 500 - len(gone)
    _oracle_check(idx, queries, live, 20)
    # removed docids never appear
    _, docids = idx.search(queries, 50)
    assert not (set(map(str, docids.ravel())) & set(gone))


def test_remove_unknown_ignored(mesh):
    rng = np.random.default_rng(2)
    idx, _ = _fresh(rng, mesh)
    assert idx.remove(["nope", "also-nope"]) == 0
    assert idx.count == 500


def test_add_duplicate_rejected(mesh):
    rng = np.random.default_rng(3)
    idx, _ = _fresh(rng, mesh)
    with pytest.raises(ValueError, match="already present"):
        idx.add(_rows(rng, 1), ["d0"])


def test_interleaved_add_remove_readd(mesh):
    rng = np.random.default_rng(4)
    idx, live = _fresh(rng, mesh, n=300)
    queries = _rows(rng, 4)
    for step in range(3):
        new = _rows(rng, 25)
        names = [f"s{step}-{i}" for i in range(25)]
        idx.add(new, names)
        live.update(zip(names, new))
        gone = list(live)[step::7][:20]
        idx.remove(gone)
        for g in gone:
            live.pop(g)
        _oracle_check(idx, queries, live, 10)
    # a removed docid can be re-added and is searchable again
    gone_id = next(i for i in (f"d{j}" for j in range(300)) if i not in live)
    v = _rows(rng, 1)
    idx.add(v, [gone_id])
    live[gone_id] = v[0]
    assert idx.count == len(live)
    _, docids = idx.search(v, 1)
    assert str(docids[0][0]) == gone_id  # its own vector retrieves it
    _oracle_check(idx, queries, live, 10)


def test_add_rejects_in_batch_duplicates(mesh):
    rng = np.random.default_rng(9)
    idx, _ = _fresh(rng, mesh)
    with pytest.raises(ValueError, match="within the batch"):
        idx.add(_rows(rng, 2), ["same", "same"])
    # nothing was inserted
    assert idx.count == 500 and idx.remove(["same"]) == 0


def test_growth_reshards(mesh):
    rng = np.random.default_rng(5)
    idx, live = _fresh(rng, mesh, n=500)
    queries = _rows(rng, 4)
    rps_before = idx._rows_per_shard
    big = _rows(rng, 1200)  # > 8*128 - 500 spare rows -> must grow
    idx.add(big, [f"g{i}" for i in range(1200)])
    live.update({f"g{i}": big[i] for i in range(1200)})
    assert idx._rows_per_shard > rps_before
    assert idx.count == 1700
    _oracle_check(idx, queries, live, 20)


def test_mutation_updates_sketch_tier(mesh):
    rng = np.random.default_rng(6)
    idx, live = _fresh(rng, mesh)
    queries = _rows(rng, 8)
    idx.enable_sketch(sketch_dim=16, probe_bins=64)
    new = _rows(rng, 30)
    idx.add(new, [f"n{i}" for i in range(30)])
    live.update({f"n{i}": new[i] for i in range(30)})
    idx.remove(["d5", "d77"])
    live.pop("d5"); live.pop("d77")
    vals, docids = idx.search(queries, 10, approx=True)
    cert = idx.last_certified
    # certified rows must match exact post-mutation search
    evals, edocids = idx.search(queries, 10)
    for q in np.flatnonzero(cert):
        assert list(docids[q]) == list(edocids[q])
    # exact path itself matches the oracle on the mutated corpus
    _oracle_check(idx, queries, live, 10)


def test_mutated_index_roundtrips_through_store(mesh, tmp_path):
    rng = np.random.default_rng(7)
    idx, live = _fresh(rng, mesh, n=200)
    idx.add(_rows(rng, 10), [f"n{i}" for i in range(10)])
    idx.remove(["d0", "d100"])
    idx.save(tmp_path / "mut")
    re = DenseFlatIndex.load(tmp_path / "mut")
    assert re.count == 208
    assert set(re.docids) == (set(f"d{i}" for i in range(200)) - {"d0", "d100"}) | {
        f"n{i}" for i in range(10)
    }


def _tok_corpus(rng, n, td, d):
    toks = rng.standard_normal((n, td, d)).astype(np.float32)
    toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
    dense = toks.sum(axis=1)
    dense /= np.linalg.norm(dense, axis=1, keepdims=True)
    return toks, dense


def _write_tok_store(path, toks, lens, dtype="bfloat16"):
    from codemix_dense_retrieval_tpu.io.token_shards import (
        TokenShardStore,
        TokenShardWriter,
    )

    w = TokenShardWriter(
        path, token_dim=toks.shape[2], tokens_per_doc=toks.shape[1],
        dtype=dtype,
    )
    w.append(toks, lens, [f"d{i}" for i in range(len(toks))])
    w.finalize()
    return TokenShardStore.open(path)


def _brute_two_stage(q_dense, q_toks, live_toks, live_ids, k, k_dense):
    """numpy oracle: dense top-k_dense then full MaxSim rerank."""
    ids = sorted(live_ids)
    dense = np.stack([live_toks[i].sum(0) for i in ids])
    dense /= np.linalg.norm(dense, axis=1, keepdims=True)
    out = []
    for qi in range(len(q_dense)):
        dd = dense @ q_dense[qi]
        cand = np.argsort(-dd, kind="stable")[:k_dense]
        scored = []
        for c in cand:
            sims = q_toks[qi] @ live_toks[ids[c]].T  # (Tq, Td)
            scored.append((float(sims.max(axis=1).sum()), ids[c]))
        scored.sort(key=lambda x: (-x[0], x[1]))
        out.append([s[1] for s in scored[:k]])
    return out


@pytest.mark.parametrize("dtype,dense_dtype", [
    ("bfloat16", "float32"),
    ("int8", "float32"),
    ("int8", "int8"),  # r4: int8 DENSE indexes mutate too
])
def test_two_stage_resident_mutation(mesh, tmp_path, dtype, dense_dtype):
    """Device-resident two-stage add/remove: the searcher mirrors the
    dense side's positions and swap journal, and post-mutation rerank
    matches a numpy dense->MaxSim oracle over the LIVE corpus."""
    from codemix_dense_retrieval_tpu.pipeline.rerank import TwoStageSearcher

    rng = np.random.default_rng(20)
    n, td, d, k = 96, 4, 32, 5
    toks, dense = _tok_corpus(rng, n, td, d)
    store = _write_tok_store(tmp_path / f"tok-{dtype}-{dense_dtype}", toks,
                             np.full(n, td, np.int32), dtype=dtype)
    idx = DenseFlatIndex.build(dense, [f"d{i}" for i in range(n)],
                               dtype=dense_dtype)
    idx.to_device(mesh, pad_multiple=32)
    s = TwoStageSearcher(idx, store, device_resident=True)
    live = {f"d{i}": toks[i] for i in range(n)}

    new_toks, new_dense = _tok_corpus(rng, 7, td, d)
    s.add(new_dense, [f"n{i}" for i in range(7)], new_toks,
          np.full(7, td, np.int32))
    live.update({f"n{i}": new_toks[i] for i in range(7)})
    assert s.remove(["d0", "d33", "n2", "ghost"]) == 3
    for g in ("d0", "d33", "n2"):
        live.pop(g)
    assert s.count == idx.count == n + 7 - 3

    q_toks, q_dense = _tok_corpus(rng, 4, td, d)
    scores, got = s.search(q_dense, q_toks, np.full(4, td), k,
                           k_dense=24, return_docids=True)
    want = _brute_two_stage(q_dense, q_toks, live, set(live), k, 24)
    tol = 0.08 if dtype == "int8" else 0.02
    for qi in range(4):
        hit = len(set(map(str, got[qi])) & set(want[qi])) / k
        assert hit >= (0.8 if dtype == "int8" else 1.0) or (
            # int8 quantization may reorder near-ties at the boundary
            hit >= 0.6 and dtype == "int8"
        ), (qi, got[qi], want[qi])
    # removed docids never come back
    _, wide = s.search(q_dense, q_toks, np.full(4, td), 20, k_dense=64)
    assert not (set(map(str, np.asarray(wide).ravel())) & {"d0", "d33", "n2"})


def test_two_stage_mutation_fuzz(mesh, tmp_path):
    """10 rounds of random add/remove batches (removals biased to force
    long swap chains within shards); after every round the resident token
    arrays must score EXACTLY like a from-scratch oracle over the live
    corpus — any journal-replay slip shows up as a wrong MaxSim score."""
    from codemix_dense_retrieval_tpu.pipeline.rerank import TwoStageSearcher

    import jax.numpy as jnp

    def bf16_corpus(rng_, m, td_, d_):
        # bf16-REPRESENTABLE tokens: the store round-trips losslessly, so
        # the numpy oracle and the resident arrays score identical values
        t, _ = _tok_corpus(rng_, m, td_, d_)
        t = np.asarray(jnp.asarray(t, jnp.bfloat16).astype(jnp.float32))
        dn = t.sum(axis=1)
        dn /= np.linalg.norm(dn, axis=1, keepdims=True)
        return t, dn

    rng = np.random.default_rng(40)
    n, td, d, k = 64, 3, 16, 4
    toks, dense = bf16_corpus(rng, n, td, d)
    store = _write_tok_store(tmp_path / "tok", toks, np.full(n, td, np.int32))
    idx = DenseFlatIndex.build(dense, [f"d{i}" for i in range(n)],
                               dtype="float32")
    idx.to_device(mesh, pad_multiple=16)  # capacity 128
    s = TwoStageSearcher(idx, store, device_resident=True)
    live = {f"d{i}": toks[i] for i in range(n)}
    serial = 0
    for rnd in range(10):
        n_add = int(rng.integers(0, 5))
        if n_add and idx.count + n_add <= 120:
            at, ad = bf16_corpus(rng, n_add, td, d)
            names = [f"f{serial + i}" for i in range(n_add)]
            serial += n_add
            s.add(ad, names, at, np.full(n_add, td, np.int32))
            live.update(zip(names, at))
        pool = sorted(live)
        n_rm = int(rng.integers(0, min(6, len(pool) - 8)))
        gone = list(rng.choice(pool, size=n_rm, replace=False))
        assert s.remove(gone) == n_rm
        for g in gone:
            live.pop(g)
        assert s.count == idx.count == len(live)
        # oracle check on a few queries; depth <= rows_per_shard (16) so
        # the dense clamp never diverges the candidate pools
        kd = min(12, len(live))
        q_toks, q_dense = bf16_corpus(rng, 3, td, d)
        scores, got = s.search(q_dense, q_toks, np.full(3, td), k,
                               k_dense=kd, return_docids=True)
        want = _brute_two_stage(q_dense, q_toks, live, set(live), k, kd)
        for qi in range(3):
            assert list(map(str, got[qi])) == want[qi], (
                rnd, qi, got[qi], want[qi]
            )


def test_two_stage_mutation_requires_resident(mesh, tmp_path):
    from codemix_dense_retrieval_tpu.pipeline.rerank import TwoStageSearcher

    rng = np.random.default_rng(21)
    toks, dense = _tok_corpus(rng, 48, 4, 32)
    store = _write_tok_store(tmp_path / "tok", toks, np.full(48, 4, np.int32))
    idx = DenseFlatIndex.build(dense, [f"d{i}" for i in range(48)],
                               dtype="float32")
    idx.to_device(mesh, pad_multiple=16)
    s = TwoStageSearcher(idx, store, device_resident=False)
    with pytest.raises(ValueError, match="device-resident"):
        s.add(dense[:1], ["x"], toks[:1], [4])


def test_two_stage_add_refuses_regrow(mesh, tmp_path):
    from codemix_dense_retrieval_tpu.pipeline.rerank import TwoStageSearcher

    rng = np.random.default_rng(22)
    toks, dense = _tok_corpus(rng, 48, 4, 32)
    store = _write_tok_store(tmp_path / "tok", toks, np.full(48, 4, np.int32))
    idx = DenseFlatIndex.build(dense, [f"d{i}" for i in range(48)],
                               dtype="float32")
    idx.to_device(mesh, pad_multiple=8)  # capacity 64, spare 16
    s = TwoStageSearcher(idx, store, device_resident=True)
    big_toks, big_dense = _tok_corpus(rng, 20, 4, 32)
    with pytest.raises(ValueError, match="regrow"):
        s.add(big_dense, [f"b{i}" for i in range(20)], big_toks,
              np.full(20, 4, np.int32))
    assert idx.count == 48  # nothing mutated


def test_mutation_invalidates_two_stage(mesh, tmp_path):
    """A mutated dense index must be rejected by TwoStageSearcher — its
    row ids no longer map to the (unmutated) token store's rows."""
    from codemix_dense_retrieval_tpu.io.token_shards import (
        TokenShardStore,
        TokenShardWriter,
    )
    from codemix_dense_retrieval_tpu.pipeline.rerank import TwoStageSearcher

    rng = np.random.default_rng(10)
    n, d, td = 64, 32, 4
    toks = rng.standard_normal((n, td, d)).astype(np.float32)
    toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
    w = TokenShardWriter(tmp_path / "tok", token_dim=d, tokens_per_doc=td)
    w.append(toks, np.full(n, td, np.int32), [f"d{i}" for i in range(n)])
    w.finalize()
    store = TokenShardStore.open(tmp_path / "tok")
    dense = toks.sum(axis=1)
    dense /= np.linalg.norm(dense, axis=1, keepdims=True)
    idx = DenseFlatIndex.build(dense, [f"d{i}" for i in range(n)], dtype="float32")
    idx.to_device(mesh, pad_multiple=8)
    s = TwoStageSearcher(idx, store)
    q = _rows(rng, 2, d)
    qt = rng.standard_normal((2, td, d)).astype(np.float32)
    idx.add(_rows(rng, 1, d), ["extra"])
    with pytest.raises(ValueError, match="mutated"):
        s.search(q, qt, np.full(2, td), 3, k_dense=8)
    # and a fresh searcher over the mutated index is rejected outright
    with pytest.raises(ValueError, match="mutated|count"):
        TwoStageSearcher(idx, store)


def test_rebalance_evens_shards_and_stays_exact(mesh):
    rng = np.random.default_rng(30)
    idx, live = _fresh(rng, mesh, n=512)
    queries = _rows(rng, 6)
    # skew: remove most of shard 0's rows (rps=128 -> rows d0..d63 + swaps)
    gone = [f"d{i}" for i in range(0, 120)]
    idx.remove(gone)
    for g in gone:
        live.pop(g)
    counts = idx._mutable["counts"].copy()
    assert counts.max() - counts.min() > 32  # actually skewed
    idx.rebalance()
    counts = idx._mutable["counts"]
    assert counts.max() - counts.min() <= 1
    assert idx.count == len(live)
    _oracle_check(idx, queries, live, 20)
    # sketch tier survives a rebalance
    idx.enable_sketch(sketch_dim=16, probe_bins=48)
    idx.rebalance()
    vals, ids = idx.search(queries, 10, return_docids=False, approx="guaranteed")
    evals, eids = idx.search(queries, 10, return_docids=False)
    np.testing.assert_array_equal(ids, eids)


def test_int8_index_mutates(mesh):
    """int8 indexes mutate online too (r4): the f32 host mirror is
    authoritative, the device boundary re-quantizes rows AND the scale
    sidecar in lockstep, and quantize(dequantize(quantize(x))) is an
    exact roundtrip (the max code is always +-127), so searches stay
    bit-consistent with a from-scratch int8 index over the live rows."""
    from codemix_dense_retrieval_tpu.ops.quant import quantize_rows_np

    rng = np.random.default_rng(8)
    docs = _rows(rng, 256)
    idx = DenseFlatIndex.build(docs, [str(i) for i in range(256)], dtype="int8")
    idx.to_device(mesh, pad_multiple=128)

    new = _rows(rng, 5)
    idx.add(new, [f"x{i}" for i in range(5)])
    assert idx.remove(["3", "77", "ghost"]) == 2
    assert idx.count == 256 + 5 - 2

    # oracle: exact int8 scores over the live corpus, FAISS tie-break
    live_ids = [str(i) for i in range(256) if i not in (3, 77)] + [
        f"x{i}" for i in range(5)
    ]
    live = {str(i): docs[i] for i in range(256) if i not in (3, 77)}
    live.update({f"x{i}": new[i] for i in range(5)})
    rows_f32 = np.stack([live[d] for d in live_ids])
    dv, dsc = quantize_rows_np(rows_f32)
    q = _rows(rng, 9)
    qv, qs = quantize_rows_np(q)
    scores = (qv.astype(np.int32) @ dv.astype(np.int32).T).astype(np.float32)
    scores = scores * dsc[None, :] * qs[:, None]
    want_top = [live_ids[j] for j in scores.argmax(axis=1)]

    vals, got = idx.search(q, 1)
    assert [str(g[0]) for g in got] == want_top

    # added rows are their own nearest neighbor; removed rows are gone
    va, ga = idx.search(new, 1)
    assert [str(g[0]) for g in ga] == [f"x{i}" for i in range(5)]
    _, wide = idx.search(q, 20)
    assert not ({"3", "77"} & set(map(str, np.asarray(wide).ravel())))


def test_int8_mutation_with_sketch_and_persistence(mesh, tmp_path):
    """Sketch sidecars track int8 mutations; to_store() persists the
    mutated corpus and a reload searches identically."""
    rng = np.random.default_rng(9)
    docs = _rows(rng, 256)
    idx = DenseFlatIndex.build(docs, [str(i) for i in range(256)], dtype="int8")
    idx.to_device(mesh, pad_multiple=128)
    idx.enable_sketch(sketch_dim=8, cache=False)

    new = _rows(rng, 4)
    idx.add(new, [f"x{i}" for i in range(4)])
    idx.remove(["0", "100"])
    q = _rows(rng, 8)
    ev, ei = idx.search(q, 5, return_docids=False)
    gv, gi = idx.search(q, 5, return_docids=False, approx="guaranteed")
    np.testing.assert_array_equal(gi, ei)

    idx.save(tmp_path / "snap")
    re = DenseFlatIndex.load(tmp_path / "snap")
    re.to_device(mesh, pad_multiple=128)
    rv, ri = re.search(q, 5)
    ov, oi = idx.search(q, 5)
    assert [list(map(str, r)) for r in ri] == [list(map(str, o)) for o in oi]
    np.testing.assert_allclose(rv, ov, rtol=1e-5, atol=1e-6)


def test_int8_grow_and_rebalance_keep_sketch_consistent(mesh):
    """Regrowth and rebalance over an int8 index re-quantize the mirror,
    rebuild the scale sidecar, and re-project the sketch from the
    DEQUANTIZED rows — guaranteed search stays byte-equal to exact."""
    rng = np.random.default_rng(10)
    docs = _rows(rng, 256)
    idx = DenseFlatIndex.build(docs, [str(i) for i in range(256)], dtype="int8")
    idx.to_device(mesh, pad_multiple=32)  # tight capacity: adds force _grow
    idx.enable_sketch(sketch_dim=8, cache=False)

    extra = _rows(rng, 80)
    idx.add(extra, [f"x{i}" for i in range(80)])  # 256 -> 336 > capacity
    # skewed removals then rebalance
    idx.remove([str(i) for i in range(0, 60, 2)])
    idx.rebalance()

    q = _rows(rng, 8)
    ev, ei = idx.search(q, 7, return_docids=False)
    gv, gi = idx.search(q, 7, return_docids=False, approx="guaranteed")
    np.testing.assert_array_equal(gi, ei)
    va, ga = idx.search(extra[:5], 1)
    assert [str(g[0]) for g in ga] == [f"x{i}" for i in range(5)]
