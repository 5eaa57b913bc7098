"""Golden-file tests for the host IO contracts (SURVEY §1 artifact table)."""

import numpy as np
import pytest

from codemix_dense_retrieval_tpu.config import format_alpha
from codemix_dense_retrieval_tpu.io import (
    collapse_run_max,
    read_qrels,
    read_queries_tsv,
    read_run,
    write_queries_tsv,
    write_run,
)
from codemix_dense_retrieval_tpu.io.naming import (
    ExperimentName,
    encoder_tag,
    parse_eval_stem,
    parse_experiment_dirname,
)
from codemix_dense_retrieval_tpu.io.tsv import BadQueryLine, read_id_list, write_qrels_tsv


class TestQueriesTsv:
    def test_roundtrip(self, tmp_path):
        rows = [("q1", "hello world"), ("q2", "你好 world"), ("q3", "a\tb".replace("\t", " "))]
        p = tmp_path / "queries.tsv"
        write_queries_tsv(p, rows)
        assert read_queries_tsv(p) == rows

    def test_header_skipped(self, tmp_path):
        p = tmp_path / "q.tsv"
        p.write_text("qid\ttext\n1\tfoo\n2\tbar\n")
        assert read_queries_tsv(p) == [("1", "foo"), ("2", "bar")]

    def test_non_header_first_line_kept(self, tmp_path):
        p = tmp_path / "q.tsv"
        p.write_text("100\twhat is x\n2\tbar\n")
        assert read_queries_tsv(p) == [("100", "what is x"), ("2", "bar")]

    def test_blank_lines_skipped(self, tmp_path):
        p = tmp_path / "q.tsv"
        p.write_text("1\tfoo\n\n2\tbar\n")
        assert len(read_queries_tsv(p)) == 2

    def test_bad_line_raises(self, tmp_path):
        p = tmp_path / "q.tsv"
        p.write_text("1\tfoo\njustonefield\n")
        with pytest.raises(BadQueryLine):
            read_queries_tsv(p)

    def test_reads_reference_band_format(self, tmp_path):
        # format identical to the shipped data/mmarco_dev band files
        p = tmp_path / "queries-cm0-20.tsv"
        p.write_text("1000459\tWhere do black widow 蜘蛛 live in the US?\n")
        rows = read_queries_tsv(p)
        assert rows[0][0] == "1000459"
        assert "蜘蛛" in rows[0][1]


class TestQrels:
    def test_three_col(self, tmp_path):
        p = tmp_path / "qrels.tsv"
        p.write_text("q1\td1\t1\nq1\td2\t0\nq2\td3\t2\n")
        q = read_qrels(p)
        assert q == {"q1": {"d1": 1, "d2": 0}, "q2": {"d3": 2}}

    def test_four_col_trec(self, tmp_path):
        p = tmp_path / "qrels.txt"
        p.write_text("q1 0 d1 1\nq2 0 d2 1\n")
        assert read_qrels(p) == {"q1": {"d1": 1}, "q2": {"d2": 1}}

    def test_header_skipped(self, tmp_path):
        p = tmp_path / "qrels.tsv"
        p.write_text("qid\tdocid\trel\nq1\td1\t1\n")
        assert read_qrels(p) == {"q1": {"d1": 1}}

    def test_roundtrip(self, tmp_path):
        qrels = {"q1": {"d1": 1}, "q2": {"d2": 1, "d9": 3}}
        p = tmp_path / "qr.tsv"
        write_qrels_tsv(p, qrels)
        assert read_qrels(p) == qrels


class TestTrecRun:
    def test_write_read_roundtrip(self, tmp_path):
        qids = ["q1", "q2"]
        docids = [["d1", "d2"], ["d3", "d4"]]
        scores = np.array([[0.9, 0.8], [0.7, 0.6]], np.float32)
        p = tmp_path / "run.trec"
        n = write_run(p, qids, docids, scores, tag="onepass")
        assert n == 4
        entries = read_run(p)
        assert [e.docid for e in entries] == ["d1", "d2", "d3", "d4"]
        assert [e.rank for e in entries] == [1, 2, 1, 2]
        assert entries[0].score == pytest.approx(0.9)
        assert entries[0].tag == "onepass"

    def test_collapse_run_max(self, tmp_path):
        raw = tmp_path / "raw.trec"
        # q1: d1 appears under both langs -> keep max 0.9; d2 once.
        raw.write_text(
            "q1 Q0 d1#en 1 0.900000 t\n"
            "q1 Q0 d2#zh 2 0.850000 t\n"
            "q1 Q0 d1#zh 3 0.800000 t\n"
            "q2 Q0 d9#zh 1 0.500000 t\n"
        )
        out = tmp_path / "base.trec"
        collapse_run_max(raw, out)
        entries = read_run(out)
        assert [(e.qid, e.docid, e.rank) for e in entries] == [
            ("q1", "d1", 1),
            ("q1", "d2", 2),
            ("q2", "d9", 1),
        ]
        assert entries[0].score == pytest.approx(0.9)

    def test_collapse_tie_keeps_first_seen(self, tmp_path):
        raw = tmp_path / "raw.trec"
        raw.write_text("q1 Q0 b#en 1 0.5 t\nq1 Q0 a#zh 2 0.5 t\n")
        out = tmp_path / "base.trec"
        collapse_run_max(raw, out)
        entries = read_run(out)
        # python sort is stable: first-seen (b) wins rank 1 on tie
        assert [e.docid for e in entries] == ["b", "a"]


class TestNativeFastio:
    def test_native_write_matches_python(self, tmp_path, fastio_lib):
        qids = [f"q{i}" for i in range(7)]
        docids = [[f"d{i}_{j}" for j in range(5)] for i in range(7)]
        scores = np.arange(35, dtype=np.float32).reshape(7, 5) / 7.0
        native_p = tmp_path / "native.trec"
        n = fastio_lib.write_run(str(native_p), qids, docids, scores, "tag", 4)
        assert n == 35
        from codemix_dense_retrieval_tpu.io.trec import iter_run_lines

        py_lines = list(iter_run_lines(qids, docids, scores, "tag", 4))
        native_lines = native_p.read_text().splitlines()
        assert native_lines == py_lines

    def test_native_collapse_matches_python(self, tmp_path, fastio_lib, rng):
        # randomized raw run with lang-tagged docids and ties
        lines = []
        for qi in range(20):
            for r, di in enumerate(rng.permutation(30)[:15], 1):
                lang = "en" if di % 2 else "zh"
                score = float(rng.integers(0, 10)) / 10.0
                lines.append(f"q{qi} Q0 d{di % 8}#{lang} {r} {score:.6f} t")
        raw = tmp_path / "raw.trec"
        raw.write_text("\n".join(lines) + "\n")

        out_native = tmp_path / "n.trec"
        assert fastio_lib.collapse_run_max(str(raw), str(out_native), "bilingual-onepass")

        # force the python path
        import codemix_dense_retrieval_tpu.io.trec as trec_mod

        out_py = tmp_path / "p.trec"
        old = trec_mod._NATIVE, trec_mod._NATIVE_TRIED
        trec_mod._NATIVE, trec_mod._NATIVE_TRIED = None, True
        try:
            trec_mod.collapse_run_max(raw, out_py)
        finally:
            trec_mod._NATIVE, trec_mod._NATIVE_TRIED = old
        native_entries = [l.split() for l in out_native.read_text().splitlines()]
        py_entries = [l.split() for l in out_py.read_text().splitlines()]
        assert native_entries == py_entries


class TestNaming:
    def test_dirname_roundtrip_mono(self):
        n = ExperimentName("mmarco", 8841823, "chinese", "en", "zh", "bge-m3")
        assert n.dirname() == "mmarco-8841823-chinese-en-zh-5bands-bge-m3"
        parsed = parse_experiment_dirname(n.dirname())
        assert parsed == n
        assert parsed.doc_langs == ("zh",)

    def test_dirname_roundtrip_bilingual(self):
        n = ExperimentName("mmarco", 100000, "bilingual-en-zh", "en", "zh", "bge-m3")
        parsed = parse_experiment_dirname(n.dirname())
        assert parsed is not None and parsed.is_bilingual
        assert parsed.doc_langs == ("en", "zh")

    def test_parse_rejects_garbage(self):
        assert parse_experiment_dirname("not-an-experiment") is None

    def test_encoder_tag(self):
        assert encoder_tag("BAAI/bge-m3") == "bge-m3"
        assert encoder_tag("intfloat/multilingual-e5-large") == "multilingual-e5-large"

    def test_eval_stem(self):
        assert parse_eval_stem("cm-alpha-0.5_dev_20260118-184044") == (
            "cm-alpha-0.5",
            "dev",
            "20260118-184044",
        )
        assert parse_eval_stem("nounderscore") is None


class TestAlphaLabels:
    def test_format_alpha(self):
        # parity with reference onepass_dense_mix_run_custom_lang.py:304-309
        assert format_alpha(0.0) == "0"
        assert format_alpha(1.0) == "1"
        assert format_alpha(0.5) == "0.5"
        assert format_alpha(0.25) == "0.25"
        assert format_alpha(0.1) == "0.1"
        assert format_alpha(1e-9) == "0"


class TestIdList:
    def test_read_id_list(self, tmp_path):
        p = tmp_path / "qids-common.tsv"
        p.write_text("6217\n6791\n\n8701\n")
        assert read_id_list(p) == ["6217", "6791", "8701"]
