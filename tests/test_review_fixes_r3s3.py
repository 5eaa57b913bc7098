"""Regression tests for the session-3 review findings (second pass):
per-alpha certificate recording, two-stage save, ablation empty-pair
guard, make-plan argument handling, fused+approx rejection."""

import json
import pathlib

import numpy as np
import pytest

from codemix_dense_retrieval_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def mesh(eight_cpu_devices):
    return make_mesh(shard=8, tp=1, devices=eight_cpu_devices)


def test_vector_mix_cert_out_is_per_alpha(tmp_path):
    """cert_out must capture each alpha's OWN certificate rate, not the
    last search's (the old bilingual meta bug)."""
    from codemix_dense_retrieval_tpu.pipeline.runs import run_vector_mix_search

    class FakeIndex:
        count = 100
        calls = 0

        def search(self, q, k, *, query_block=0, approx=False, **kw):
            self.calls += 1
            # a DIFFERENT certificate rate per call
            self.last_certified = np.arange(len(q)) < self.calls
            vals = np.tile(np.arange(k, 0, -1, dtype=np.float32), (len(q), 1))
            ids = np.array(
                [[f"doc{j}" for j in range(k)]] * len(q), dtype=object
            )
            return vals, ids

    idx = FakeIndex()
    qids = [f"q{i}" for i in range(4)]
    vecs = np.eye(4, 8, dtype=np.float32)
    cert = {}
    run_vector_mix_search(
        idx, qids, vecs, vecs, [0.0, 0.5, 1.0], tmp_path, k=3,
        approx=True, cert_out=cert,
    )
    assert cert == {0.0: 0.25, 0.5: 0.5, 1.0: 0.75}


def test_bilingual_meta_records_per_alpha_cert(tmp_path, mesh):
    from codemix_dense_retrieval_tpu.index import DenseFlatIndex
    from codemix_dense_retrieval_tpu.pipeline.bilingual import (
        run_bilingual_vector_mix,
    )

    rng = np.random.default_rng(0)
    docs = rng.standard_normal((2048, 32)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    hub = DenseFlatIndex.build(docs, [f"d{i}" for i in range(2048)])
    hub.to_device(mesh, pad_multiple=256)
    hub.enable_sketch(sketch_dim=8, probe_bins=16)
    q = docs[:6]
    run_bilingual_vector_mix(
        hub, [f"q{i}" for i in range(6)], q, q, [0.0, 0.5], tmp_path,
        k=10, approx="guaranteed",
    )
    for label in ("0", "0.5"):
        meta = json.loads((tmp_path / f"cm-alpha-{label}_meta.json").read_text())
        assert meta["approx"] == "guaranteed"
        assert meta["certified_frac"] == 1.0  # guaranteed escalates to all-True


def test_two_stage_save_roundtrip(tmp_path, mesh):
    """save() persists a MUTATED two-stage corpus; a searcher rebuilt from
    the snapshot ranks identically."""
    from codemix_dense_retrieval_tpu.index import DenseFlatIndex
    from codemix_dense_retrieval_tpu.io.token_shards import (
        TokenShardStore,
        TokenShardWriter,
    )
    from codemix_dense_retrieval_tpu.pipeline.rerank import TwoStageSearcher

    rng = np.random.default_rng(1)
    n, td, d = 80, 3, 16
    toks = rng.standard_normal((n, td, d)).astype(np.float32)
    toks /= np.linalg.norm(toks, axis=-1, keepdims=True)
    dense = toks.sum(1)
    dense /= np.linalg.norm(dense, axis=1, keepdims=True)
    w = TokenShardWriter(tmp_path / "tok", token_dim=d, tokens_per_doc=td,
                         dtype="int8")
    w.append(toks, np.full(n, td, np.int32), [f"d{i}" for i in range(n)])
    w.finalize()
    idx = DenseFlatIndex.build(dense, [f"d{i}" for i in range(n)],
                               dtype="float32")
    idx.to_device(mesh, pad_multiple=16)
    s = TwoStageSearcher(idx, TokenShardStore.open(tmp_path / "tok"),
                         device_resident=True)
    new_t = rng.standard_normal((3, td, d)).astype(np.float32)
    new_t /= np.linalg.norm(new_t, axis=-1, keepdims=True)
    new_d = new_t.sum(1)
    new_d /= np.linalg.norm(new_d, axis=1, keepdims=True)
    s.add(new_d, ["x0", "x1", "x2"], new_t, np.full(3, td, np.int32))
    s.remove(["d5", "x1"])
    s.save(tmp_path / "snap")

    re_idx = DenseFlatIndex.load(tmp_path / "snap")
    re_idx.to_device(mesh, pad_multiple=16)
    re_s = TwoStageSearcher(
        re_idx, TokenShardStore.open(tmp_path / "snap" / "tokens"),
        device_resident=True,
    )
    assert re_s.count == s.count == n + 3 - 2
    q_t = rng.standard_normal((4, td, d)).astype(np.float32)
    q_d = q_t.sum(1)
    q_d /= np.linalg.norm(q_d, axis=1, keepdims=True)
    _, a = s.search(q_d, q_t, np.full(4, td), 5, k_dense=12)
    _, b = re_s.search(q_d, q_t, np.full(4, td), 5, k_dense=12)
    for qi in range(4):
        assert set(map(str, a[qi])) == set(map(str, b[qi])), qi


def test_ablation_summary_survives_empty_pair():
    from codemix_dense_retrieval_tpu.analysis.ablation import (
        compute_reference_ablation_summary,
    )

    rows = [{
        "dataset": "mmarco", "docs_size": "100", "num_bands": 4,
        "exp_tag": "weird", "exp_type": "weird", "block": "x",
        "doc_lang": None, "query_lang_a": None, "query_lang_b": None,
        "pair": "", "doc_mix": "docs", "method": "embed",
        "mix_ratio": 50.0, "model": "m", "result_kind": "vector_mix",
        "result_variant": "", "ndcg10": 10.0,
    }]
    out = compute_reference_ablation_summary(rows)
    assert out[0]["doc_regime"] == "other docs"


def test_make_plan_size_and_validation(tmp_path):
    from codemix_dense_retrieval_tpu.cli import main

    with pytest.raises(SystemExit, match="index_root"):
        main(["make-plan", "all-pairs", "--query_tsv_root", str(tmp_path),
              "--result_root", str(tmp_path), "--out", str(tmp_path / "p.json")])
    main(["make-plan", "all-pairs", "--index_root", str(tmp_path / "idx"),
          "--query_tsv_root", str(tmp_path), "--result_root", str(tmp_path),
          "--size", "100000", "--out", str(tmp_path / "p.json")])
    plan = json.loads((tmp_path / "p.json").read_text())
    assert len(plan["jobs"]) == 105
    assert all("100000" in json.dumps(j) for j in plan["jobs"])
