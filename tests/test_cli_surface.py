"""CLI surface tests: every subcommand parses, help renders, edge inputs
are handled gracefully."""

import pytest

from codemix_dense_retrieval_tpu.cli import build_parser


SUBCOMMANDS = [
    "encode-corpus", "run-mono", "run-mix", "run-bilingual",
    "run-bilingual-mix", "cache-queries", "generate-bands",
    "download-queries", "analyze", "convert", "sweep", "collect",
]


def test_all_subcommands_have_help():
    ap = build_parser()
    for cmd in SUBCOMMANDS:
        with pytest.raises(SystemExit) as e:
            ap.parse_args([cmd, "--help"])
        assert e.value.code == 0, cmd


def test_required_args_enforced():
    ap = build_parser()
    with pytest.raises(SystemExit):
        ap.parse_args(["run-mix"])  # missing required args
    with pytest.raises(SystemExit):
        ap.parse_args(["nonexistent-command"])


def test_collect_empty_tree(tmp_path, capsys):
    from codemix_dense_retrieval_tpu.cli import main as cli_main

    (tmp_path / "results").mkdir()
    cli_main([
        "collect", "--results_root", str(tmp_path / "results"),
        "--out", str(tmp_path / "out.csv"),
    ])
    out = capsys.readouterr().out
    assert "collected 0 rows" in out
    assert (tmp_path / "out.csv").exists()


def test_bad_lang_path_spec():
    from codemix_dense_retrieval_tpu.cli import _parse_lang_path

    with pytest.raises(SystemExit):
        _parse_lang_path(["no_equals_sign"])
    assert _parse_lang_path(["en=/a", "zh=/b"]) == {
        "en": __import__("pathlib").Path("/a"),
        "zh": __import__("pathlib").Path("/b"),
    }


def test_profile_synthetic(tmp_path, capsys):
    import json

    from codemix_dense_retrieval_tpu.cli import main as cli_main

    cli_main([
        "profile", "--docs", "1000", "--dim", "32", "--queries", "8",
        "--k", "5", "--iters", "1", "--trace_dir", str(tmp_path / "tr"),
        "--smoke_dim", "32",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["docs"] == 1000 and out["k"] == 5 and out["qps"] > 0
    assert (tmp_path / "tr" / "search").is_dir()
