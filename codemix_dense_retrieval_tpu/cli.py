"""Command-line interface.

One ``python -m codemix_dense_retrieval_tpu <command>`` binary replaces
the reference's flat script collection (SURVEY §1 L3/L4):

========================  ==============================================
command                   replaces (reference)
========================  ==============================================
encode-corpus             encode_multilingual_corpus.py
run-mono                  onepass_dense_run.py
run-mix                   onepass_dense_mix_run_custom_lang.py
run-bilingual             onepass_bilingual_hub.py
run-bilingual-mix         onepass_bilingual_mix_hub_custom_lang.py
cache-queries             cache_queries_for_mix.py
download-queries          download_mmarco_queries.py
evaluate                  evaluate.py
sweep                     run_all_vector_pairs.sh / run_ablation.sh
collect                   collect_results.py / collect_ablation_results.py
========================  ==============================================

Query TSVs, index directories, TREC runs and eval artifacts keep the
reference's on-disk contracts, so outputs are directly comparable.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
from typing import Dict, List, Optional, Sequence, Tuple

from codemix_dense_retrieval_tpu.config import DEFAULT_ALPHAS
from codemix_dense_retrieval_tpu.utils.logging import get_logger, setup_logging

log = get_logger("cli")


def _parse_lang_path(specs: Sequence[str]) -> Dict[str, pathlib.Path]:
    """Parse repeated ``LANG=PATH`` arguments (reference --query_tsv)."""
    out: Dict[str, pathlib.Path] = {}
    for spec in specs:
        if "=" not in spec:
            raise SystemExit(f"[ERROR] expected LANG=PATH, got {spec!r}")
        lang, path = spec.split("=", 1)
        out[lang] = pathlib.Path(path)
    return out


def _encode_mesh(args):
    """Data-parallel encode mesh from --dp (1 = single device, -1 = all
    devices) — the GSPMD replacement for run_encode_index_groups.sh's
    4-way process parallelism."""
    dp = getattr(args, "dp", 1)
    if dp == 1:
        return None
    from codemix_dense_retrieval_tpu.parallel import make_mesh

    return make_mesh(shard=dp, tp=1)


def _build_encoder(args):
    """TextEncoder from --encoder/--checkpoint via the registry (any
    family); random-init + hash tokenizer when no checkpoint (smoke mode)."""
    mesh = _encode_mesh(args)
    wq = getattr(args, "weight_quant", None)
    if args.checkpoint:
        from codemix_dense_retrieval_tpu.models.registry import load_encoder

        return load_encoder(args.encoder, args.checkpoint, seed=args.seed,
                            mesh=mesh, weight_quant=wq)
    log.warning("no --checkpoint: random-init encoder + hash tokenizer (smoke mode)")
    from codemix_dense_retrieval_tpu.models.dialects import default_pooling
    from codemix_dense_retrieval_tpu.models.encoder import TextEncoder
    from codemix_dense_retrieval_tpu.models.xlmr import XLMRConfig

    cfg = XLMRConfig.tiny(
        vocab_size=30_000,
        hidden_size=args.smoke_dim,
        num_heads=4,
        intermediate_size=args.smoke_dim * 4,
        pooling=default_pooling(args.encoder),
        use_flash=False,
    )
    return TextEncoder(args.encoder, cfg, seed=args.seed, mesh=mesh, weight_quant=wq)


def _device_index(index, args):
    from codemix_dense_retrieval_tpu.parallel import make_mesh

    mesh = make_mesh(shard=args.shards, tp=1)
    return index.to_device(mesh)


def _load_query_sets(args) -> Dict[str, List[Tuple[str, str]]]:
    """A directory of band files (queries-cm*.tsv), single TSV files, or an
    HF streaming split (the reference's 3 query modes,
    `onepass_dense_run.py:382-466`)."""
    from codemix_dense_retrieval_tpu.io.tsv import read_queries_tsv

    sets: Dict[str, List[Tuple[str, str]]] = {}
    if getattr(args, "queries_repo", None):
        from datasets import load_dataset

        ds = load_dataset(
            args.queries_repo, args.queries_config, split=args.queries_split,
            streaming=True,
        )
        rows = []
        for rec in ds:
            rows.append((str(rec[args.qid_field]), rec[args.qtext_field]))
            if args.max_queries and len(rows) >= args.max_queries:
                break
        sets[args.queries_config or "hf"] = rows
        return sets
    for spec in args.queries or []:
        p = pathlib.Path(spec)
        if p.is_dir():
            for f in sorted(p.glob("queries-cm*.tsv")):
                sets[f.stem.replace("queries-", "")] = read_queries_tsv(f)
        else:
            sets[p.stem] = read_queries_tsv(p)
    if not sets:
        raise SystemExit("[ERROR] no query sets found")
    return sets


# ---------------------------------------------------------------------------
# commands
# ---------------------------------------------------------------------------

def cmd_encode_corpus(args) -> None:
    from codemix_dense_retrieval_tpu.pipeline.corpus import (
        HFCorpusSource,
        SelectionState,
        TsvCorpusSource,
        encode_corpus,
    )

    encoder = _build_encoder(args)
    sources = {}
    if args.corpus_tsv:
        for lang, path in _parse_lang_path(args.corpus_tsv).items():
            sources[lang] = TsvCorpusSource(path, lang)
    elif args.repo:
        for lang in args.langs:
            sources[lang] = HFCorpusSource(args.repo, f"collection-{lang}")
    else:
        raise SystemExit("[ERROR] need --corpus_tsv or --repo")

    rel_ids = set()
    if args.rel_ids:
        rel_ids = set(pathlib.Path(args.rel_ids).read_text().split())
    elif args.rel_qrels:
        # harvest relevant docids from a qrels file (the reference streams
        # them from the HF qrels dataset, `encode_multilingual_corpus.py:164-187`)
        from codemix_dense_retrieval_tpu.io.tsv import read_qrels

        qr = read_qrels(args.rel_qrels)
        rel_ids = {d for judged in qr.values() for d, r in judged.items() if r > 0}
        log.info("harvested %d relevant docids from %s", len(rel_ids), args.rel_qrels)
    selection = SelectionState(
        rel_ids=rel_ids,
        subset_neg_cap=args.subset_neg_cap,
        neg_prob=args.neg_prob,
        seed=args.seed,
    )
    dirs = encode_corpus(
        encoder,
        sources,
        args.out,
        selection=selection,
        batch_size=args.batch,
        enc_batch=args.enc_batch,
        max_docs=args.max_docs,
        storage_dtype=args.storage_dtype,
        force=args.force,
        tokens_per_doc=args.tokens_per_doc,
        token_dtype=args.token_dtype,
        pack=args.pack,
    )
    print(json.dumps({lang: str(d) for lang, d in dirs.items()}, indent=2))


def _approx_mode(args):
    """Map --approx {off,fast,guaranteed,adaptive} to the index.search
    value."""
    mode = getattr(args, "approx", "off")
    return {
        "off": False, "fast": True,
        "guaranteed": "guaranteed", "adaptive": "adaptive",
    }[mode]


def _add_approx_flag(p):
    p.add_argument("--approx",
                   choices=["off", "fast", "guaranteed", "adaptive"],
                   default="off",
                   help="search tier: 'fast' = PCA sketch, approximate "
                        "(certificate rate recorded in meta); "
                        "'guaranteed' escalates uncertified queries to "
                        "exact search, so run files are IDENTICAL to "
                        "exact output, just faster when certificates "
                        "hold; 'adaptive' = probed-exact cover (always "
                        "exact, fastest on cluster-ordered indexes; not "
                        "supported inside --fused)")


def cmd_run_mono(args) -> None:
    from codemix_dense_retrieval_tpu.index import DenseFlatIndex
    from codemix_dense_retrieval_tpu.pipeline.runs import run_word_mix_search

    encoder = _build_encoder(args)
    index = _device_index(DenseFlatIndex.load(args.index), args)
    sets = _load_query_sets(args)
    if args.max_queries:
        sets = {k: v[: args.max_queries] for k, v in sets.items()}
    runs = run_word_mix_search(
        index, encoder, sets, args.outdir, k=args.k, query_block=args.qblock,
        approx=_approx_mode(args),
    )
    print(json.dumps({k: str(v) for k, v in runs.items()}, indent=2))


def cmd_run_rerank(args) -> None:
    from codemix_dense_retrieval_tpu.index import DenseFlatIndex
    from codemix_dense_retrieval_tpu.io.token_shards import TokenShardStore
    from codemix_dense_retrieval_tpu.pipeline.rerank import (
        run_two_stage_bilingual,
        run_two_stage_search,
    )

    encoder = _build_encoder(args)
    indexes, stores = [], []
    for ix_dir in args.index:
        tok_dir = pathlib.Path(ix_dir) / "tokens"
        if not TokenShardStore.exists(tok_dir):
            raise SystemExit(
                f"[ERROR] {tok_dir} is not a token store — re-run encode-corpus "
                "with --tokens_per_doc"
            )
        indexes.append(_device_index(DenseFlatIndex.load(ix_dir), args))
        stores.append(TokenShardStore.open(tok_dir))
    sets = _load_query_sets(args)
    if args.max_queries:
        sets = {k: v[: args.max_queries] for k, v in sets.items()}
    if len(indexes) == 1:
        runs = run_two_stage_search(
            indexes[0], stores[0], encoder, sets, args.outdir,
            k=args.k, k_dense=args.k_dense or None, query_block=args.qblock,
            cache_root=args.query_cache,
        )
    else:
        # bilingual hub: per-language two-stage + score merge + collapse
        # (queries are shared across the hub's languages: one cache works)
        runs = run_two_stage_bilingual(
            indexes, stores, encoder, sets, args.outdir,
            k=args.k, k_dense=args.k_dense or None, query_block=args.qblock,
            cache_root=args.query_cache,
        )
    print(json.dumps({k: str(v) for k, v in runs.items()}, indent=2))


def cmd_run_mix(args) -> None:
    from codemix_dense_retrieval_tpu.index import DenseFlatIndex
    from codemix_dense_retrieval_tpu.io.tsv import read_queries_tsv
    from codemix_dense_retrieval_tpu.pipeline.query_cache import (
        QueryCacheMismatch,
        load_query_cache,
        save_query_cache,
    )
    from codemix_dense_retrieval_tpu.pipeline.runs import (
        intersect_query_sets,
        run_vector_mix_search,
    )

    encoder = _build_encoder(args)
    index = _device_index(DenseFlatIndex.load(args.index), args)
    tsvs = _parse_lang_path(args.query_tsv)
    if len(tsvs) != 2:
        raise SystemExit("[ERROR] run-mix needs exactly two LANG=PATH --query_tsv")
    (lang_a, path_a), (lang_b, path_b) = tsvs.items()
    qids, texts_a, texts_b = intersect_query_sets(
        read_queries_tsv(path_a), read_queries_tsv(path_b)
    )
    if not qids:
        raise SystemExit("[ERROR] empty qid intersection between the two query TSVs")

    def encode_cached(lang, texts):
        if args.query_cache:
            cache = pathlib.Path(args.query_cache) / lang / "queries.npz"
            if cache.exists():
                try:
                    _, vecs = load_query_cache(cache, expected_qids=qids)
                    return vecs
                except QueryCacheMismatch:
                    log.warning("stale query cache %s; re-encoding", cache)
            vecs = encoder.encode_queries(texts, batch_size=args.enc_batch)
            save_query_cache(cache, qids, vecs)
            return vecs
        return encoder.encode_queries(texts, batch_size=args.enc_batch)

    vecs_a = encode_cached(lang_a, texts_a)
    vecs_b = encode_cached(lang_b, texts_b)
    alphas = [float(a) for a in args.cm_alphas]
    if args.fused:
        # one-jit sweep: mix + sharded search (+ ON-DEVICE metrics when
        # qrels are given — run files are written either way)
        from codemix_dense_retrieval_tpu.io.trec import write_run
        from codemix_dense_retrieval_tpu.pipeline.fused import fused_alpha_sweep

        rel_matrix = None
        extra_zero = 0
        if args.qrels:
            from codemix_dense_retrieval_tpu.evals.device_metrics import (
                build_rel_matrix,
            )
            from codemix_dense_retrieval_tpu.io.tsv import read_qrels

            qrels = read_qrels(args.qrels)
            docid_to_row = {d: i for i, d in enumerate(index.docids)}
            rel_rows = [
                # positive judgments only: qrels keep rel=0 (judged
                # non-relevant) rows, which must not count as relevant —
                # host evaluator parity (evals/metrics.py uses rel > 0)
                [
                    docid_to_row[d]
                    for d, r in qrels.get(qid, {}).items()
                    if r > 0 and d in docid_to_row
                ]
                for qid in qids
            ]
            rel_matrix = build_rel_matrix(rel_rows)
            # host-evaluator denominator parity: qrels qids (with >=1
            # indexed relevant doc) absent from the run count as zeros
            run_qids = set(qids)
            extra_zero = sum(
                1 for qid, judged in qrels.items()
                if qid not in run_qids
                and any(r > 0 and d in docid_to_row for d, r in judged.items())
            )
        mode = _approx_mode(args)
        if mode == "adaptive":
            raise SystemExit(
                "--fused does not support --approx adaptive: the probed-"
                "exact escalation is host-driven and cannot run inside "
                "the one-jit sweep (use --approx guaranteed for exact "
                "output, or drop --fused)"
            )
        sketch = None
        if mode:  # fast AND guaranteed both route through the sketch tier
            if index._sketch is None:
                index.enable_sketch()
            sketch = index._sketch
        if mode == "guaranteed":
            # sketch sweep + exact escalation of uncertified (alpha,
            # query) pairs: byte-identical to the exact fused sweep
            from codemix_dense_retrieval_tpu.pipeline.fused import (
                fused_alpha_sweep_guaranteed,
            )

            vals, ids, metrics, cert = fused_alpha_sweep_guaranteed(
                vecs_a, vecs_b, alphas, index._docs_dev, index._counts_dev,
                args.k, mesh=index.mesh, sketch=sketch, rel_ids=rel_matrix,
                metric_extra_zero_queries=extra_zero,
                search_kwargs=index.search_kwargs,
            )
        else:
            vals, ids, metrics, cert = fused_alpha_sweep(
                vecs_a, vecs_b, alphas, index._docs_dev, index._counts_dev,
                args.k, mesh=index.mesh, rel_ids=rel_matrix,
                metric_extra_zero_queries=extra_zero,
                search_kwargs=index.search_kwargs,
                sketch=sketch,
            )
        outdir = pathlib.Path(args.outdir)
        out = {}
        import numpy as np

        from codemix_dense_retrieval_tpu.config import format_alpha

        for ai, alpha in enumerate(alphas):
            docids = index.docids[np.asarray(ids)[ai]]
            path = outdir / f"cm-alpha-{format_alpha(alpha)}.trec"
            write_run(path, qids, docids, np.asarray(vals)[ai], tag="onepass-cm")
            out[format_alpha(alpha)] = {
                "run": str(path),
                **({
                    name: round(float(v[ai]) * 100, 4)
                    for name, v in metrics.items()
                } if metrics else {}),
            }
            if cert is not None:
                # guaranteed: pre-escalation rate (the fraction that
                # avoided exact work; output is byte-exact regardless)
                out[format_alpha(alpha)]["certified_frac"] = round(
                    float(np.asarray(cert)[ai].mean()), 4
                )
                out[format_alpha(alpha)]["approx"] = (
                    "guaranteed" if mode == "guaranteed" else "fast"
                )
        print(json.dumps(out, indent=2))
        return
    approx = _approx_mode(args)
    runs = run_vector_mix_search(
        index, qids, vecs_a, vecs_b, alphas, args.outdir, k=args.k,
        query_block=args.qblock, approx=approx,
        # meta carries the certificate rate the --approx help promises
        write_meta=bool(approx),
    )
    print(json.dumps({str(a): str(p) for a, p in runs.items()}, indent=2))


def _load_hub(args):
    from codemix_dense_retrieval_tpu.index import DenseFlatIndex

    indexes = [DenseFlatIndex.load(p) for p in args.index]
    tags = args.lang_tags or [ix.store.manifest.lang or str(i) for i, ix in enumerate(indexes)]
    hub = DenseFlatIndex.merged(indexes, lang_tags=tags) if len(indexes) > 1 else indexes[0]
    return _device_index(hub, args)


def cmd_run_bilingual(args) -> None:
    from codemix_dense_retrieval_tpu.pipeline.bilingual import run_bilingual_word_mix

    encoder = _build_encoder(args)
    hub = _load_hub(args)
    sets = _load_query_sets(args)
    runs = run_bilingual_word_mix(
        hub, encoder, sets, args.outdir, k=args.k, query_block=args.qblock,
        approx=_approx_mode(args),
    )
    print(json.dumps({k: str(v) for k, v in runs.items()}, indent=2))


def cmd_run_bilingual_mix(args) -> None:
    from codemix_dense_retrieval_tpu.io.tsv import read_queries_tsv
    from codemix_dense_retrieval_tpu.pipeline.bilingual import run_bilingual_vector_mix
    from codemix_dense_retrieval_tpu.pipeline.runs import intersect_query_sets

    encoder = _build_encoder(args)
    hub = _load_hub(args)
    tsvs = _parse_lang_path(args.query_tsv)
    if len(tsvs) != 2:
        raise SystemExit("[ERROR] need exactly two LANG=PATH --query_tsv")
    (lang_a, path_a), (lang_b, path_b) = tsvs.items()
    qids, texts_a, texts_b = intersect_query_sets(
        read_queries_tsv(path_a), read_queries_tsv(path_b)
    )
    vecs_a = encoder.encode_queries(texts_a, batch_size=args.enc_batch)
    vecs_b = encoder.encode_queries(texts_b, batch_size=args.enc_batch)
    alphas = [float(a) for a in args.cm_alphas]
    if args.fused:
        from codemix_dense_retrieval_tpu.config import format_alpha
        from codemix_dense_retrieval_tpu.pipeline.bilingual import (
            run_bilingual_vector_mix_fused,
        )

        qrels = None
        if args.qrels:
            from codemix_dense_retrieval_tpu.io.tsv import read_qrels

            qrels = read_qrels(args.qrels)
        if _approx_mode(args) == "adaptive":
            raise SystemExit(
                "--fused does not support --approx adaptive: the probed-"
                "exact escalation is host-driven and cannot run inside "
                "the one-jit sweep (use --approx guaranteed for exact "
                "output, or drop --fused)"
            )
        try:
            runs, metrics = run_bilingual_vector_mix_fused(
                hub, qids, vecs_a, vecs_b, alphas, args.outdir, k=args.k,
                qrels=qrels, approx=_approx_mode(args),
            )
        except ValueError as e:
            raise SystemExit(
                f"[ERROR] --fused requires a parallel hub: {e}\n"
                "        Re-run without --fused to use the host-side "
                "collapse (handles non-parallel hubs)."
            )
        payload = {
            str(a): {"run": str(p), **(metrics.get(format_alpha(a), {}) if metrics else {})}
            for a, p in runs.items()
        }
        print(json.dumps(payload, indent=2))
        return
    runs = run_bilingual_vector_mix(
        hub, qids, vecs_a, vecs_b, alphas,
        args.outdir, k=args.k, query_block=args.qblock,
        approx=_approx_mode(args),
    )
    print(json.dumps({str(a): str(p) for a, p in runs.items()}, indent=2))


def cmd_cache_queries(args) -> None:
    from codemix_dense_retrieval_tpu.io.tsv import read_queries_tsv
    from codemix_dense_retrieval_tpu.pipeline.query_cache import save_query_cache
    from codemix_dense_retrieval_tpu.pipeline.runs import intersect_query_sets

    encoder = _build_encoder(args)
    tsvs = _parse_lang_path(args.query_tsv)
    rows_by_lang = {lang: read_queries_tsv(p) for lang, p in tsvs.items()}
    if len(rows_by_lang) == 2:
        (la, ra), (lb, rb) = rows_by_lang.items()
        qids, ta, tb = intersect_query_sets(ra, rb)
        per_lang = {la: (qids, ta), lb: (qids, tb)}
    else:
        per_lang = {
            lang: ([q for q, _ in rows], [t for _, t in rows])
            for lang, rows in rows_by_lang.items()
        }
    for lang, (qids, texts) in per_lang.items():
        vecs = encoder.encode_queries(texts, batch_size=args.enc_batch)
        out = pathlib.Path(args.cache_root) / lang / "queries.npz"
        save_query_cache(out, qids, vecs)
        print(f"{lang}: {out} ({len(qids)} queries)")


def cmd_generate_bands(args) -> None:
    """Generate code-mix band query sets (reference generate_cm_bands.py)."""
    from codemix_dense_retrieval_tpu.datagen.bands import (
        UsageTracker,
        generate_band_dataset,
        openai_generate_fn,
    )
    from codemix_dense_retrieval_tpu.io.tsv import read_queries_tsv, write_queries_tsv
    from codemix_dense_retrieval_tpu.pipeline.runs import intersect_query_sets

    rows_en = read_queries_tsv(args.en)
    rows_zh = read_queries_tsv(args.zh)
    qids, texts_en, texts_zh = intersect_query_sets(rows_en, rows_zh)
    if args.max_queries:
        qids, texts_en, texts_zh = (
            qids[: args.max_queries], texts_en[: args.max_queries], texts_zh[: args.max_queries]
        )
    bands = []
    for spec in args.bands:
        lo, hi = spec.split("-")
        bands.append((int(lo), int(hi)))
    usage = UsageTracker()
    if args.protocol == "kadapt":
        from codemix_dense_retrieval_tpu.datagen.bands import openai_band_generate_fn

        gen = openai_band_generate_fn(model=args.model, usage=usage)
    else:
        gen = openai_generate_fn(model=args.model, usage=usage)
    pairs = list(zip(qids, texts_en, texts_zh))
    generate_band_dataset(
        pairs, args.out_dir, gen, bands=bands, num_threads=args.workers,
        kadapt=args.protocol == "kadapt",
    )
    # pure-language endpoint bands used by the word-mix scripts
    out = pathlib.Path(args.out_dir)
    write_queries_tsv(out / "queries-cm0.tsv", list(zip(qids, texts_en)))
    write_queries_tsv(out / "queries-cm100.tsv", list(zip(qids, texts_zh)))
    print(json.dumps({"out_dir": str(out), "queries": len(qids), **usage.summary()}))


def cmd_download_queries(args) -> None:
    from codemix_dense_retrieval_tpu.datagen.download import download_mmarco_queries

    download_mmarco_queries(args.langs, args.out, repo=args.repo, split_prefix=args.split_prefix)


def cmd_evaluate(args, extra: Sequence[str]) -> None:
    from codemix_dense_retrieval_tpu.evals.evaluate import main as eval_main

    eval_main(extra)


def cmd_analyze(args) -> None:
    """Embedding-space geometry analysis over EN/ZH/CM query triplets."""
    import numpy as np

    from codemix_dense_retrieval_tpu.analysis.embedding_space import (
        analyze_triplets,
        plot_projection,
        project_embeddings,
        write_report,
    )
    from codemix_dense_retrieval_tpu.io.tsv import read_queries_tsv
    from codemix_dense_retrieval_tpu.pipeline.runs import intersect_query_sets

    encoder = _build_encoder(args)
    tsvs = _parse_lang_path(args.query_tsv)
    if len(tsvs) != 3:
        raise SystemExit("[ERROR] analyze needs three LANG=PATH --query_tsv (en, zh, cm)")
    (l_a, p_a), (l_b, p_b), (l_cm, p_cm) = tsvs.items()
    rows_a = read_queries_tsv(p_a)
    rows_b = read_queries_tsv(p_b)
    rows_cm = dict(read_queries_tsv(p_cm))
    qids, texts_a, texts_b = intersect_query_sets(rows_a, rows_b)
    # filter by INDEX so texts stay aligned with their qids: a plain
    # zip against the unfiltered text lists truncates instead of
    # filtering whenever the CM set is missing an intersected qid
    keep = [i for i, q in enumerate(qids) if q in rows_cm]
    qids = [qids[i] for i in keep]
    texts_a = [texts_a[i] for i in keep]
    texts_b = [texts_b[i] for i in keep]
    texts_cm = [rows_cm[q] for q in qids]
    if not qids:
        raise SystemExit("[ERROR] empty qid intersection across the three TSVs")
    E_a = encoder.encode_queries(texts_a, batch_size=args.enc_batch)
    E_b = encoder.encode_queries(texts_b, batch_size=args.enc_batch)
    E_cm = encoder.encode_queries(texts_cm, batch_size=args.enc_batch)
    result = analyze_triplets(E_a, E_b, E_cm, seed=args.seed)
    outdir = pathlib.Path(args.outdir)
    write_report(result, outdir, qids=qids)
    proj = project_embeddings(E_a, E_b, E_cm, seed=args.seed)
    plot_projection(proj, outdir / "projection.png")
    # interactive 3-D projection HTML (reference's plotly output,
    # `cm_embedding_space_analysis.py:859-1119`)
    from codemix_dense_retrieval_tpu.analysis.plots import write_projection_html

    proj3 = project_embeddings(E_a, E_b, E_cm, seed=args.seed, n_components=3)
    pts3 = np.vstack([proj3["en"], proj3["zh"], proj3["cm"]])
    groups = [0] * len(proj3["en"]) + [1] * len(proj3["zh"]) + [2] * len(proj3["cm"])
    write_projection_html(
        pts3, groups, [l_a.upper(), l_b.upper(), l_cm.upper()],
        outdir / "projection_3d.html",
    )
    print(json.dumps({k: v for k, v in result.summary().items()}, indent=2, default=float))


def cmd_profile(args) -> None:
    """Capture a jax.profiler trace around a search workload — the
    one-command observability entry (SURVEY §5 tracing; view the output
    dir with TensorBoard/xprof)."""
    import numpy as np

    from codemix_dense_retrieval_tpu.index import DenseFlatIndex
    from codemix_dense_retrieval_tpu.utils.profiling import maybe_trace, timed_device_fn

    if args.index:
        index = _device_index(DenseFlatIndex.load(args.index), args)
    else:
        rng = np.random.default_rng(args.seed)
        vecs = rng.standard_normal((args.docs, args.dim)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        index = _device_index(
            DenseFlatIndex.build(vecs, [str(i) for i in range(args.docs)]), args
        )
    rng = np.random.default_rng(args.seed + 1)
    q = rng.standard_normal((args.queries, index.dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    approx = _approx_mode(args)
    if approx == "adaptive":
        index.load_adaptive_calibration()  # no sketch sidecar needed
    elif approx:
        index.enable_sketch()
    # compile outside the trace so the capture shows steady-state execution
    index.search(q, args.k, return_docids=False, approx=approx)
    with maybe_trace("search", args.trace_dir):
        stats = timed_device_fn(
            lambda: index.search(q, args.k, return_docids=False, approx=approx),
            iters=args.iters,
        )
    if approx and index.last_certified is not None:
        stats["certified_frac"] = float(index.last_certified.mean())
    stats.update(
        queries=args.queries, k=args.k, docs=index.count,
        qps=round(args.queries / stats["mean_s"], 1) if stats.get("mean_s") else None,
        trace_dir=args.trace_dir,
    )
    print(json.dumps(stats))


def cmd_serve(args) -> None:
    """Online search serving: load encoder + index, start the
    microbatching HTTP endpoint (serving.py)."""
    from codemix_dense_retrieval_tpu.index import DenseFlatIndex
    from codemix_dense_retrieval_tpu.serving import SearchService, make_server

    encoder = _build_encoder(args)
    index = _load_hub(args)  # one dir, or several merged base#lang (hub)
    mode = False if args.approx == "off" else args.approx
    if mode in ("fast", "guaranteed"):
        index.enable_sketch(
            sketch_dim=args.sketch_dim, probe_bins=args.probe_bins or None
        )
    search_kwargs = {}
    if mode == "adaptive":
        # no sketch sidecar needed, but tune --adaptive's persisted
        # operating points (probe/speedup per depth) should apply
        index.load_adaptive_calibration()
        if args.probe_bins:
            search_kwargs["probe_bins"] = args.probe_bins
    if args.token_store:
        # two-stage (ColBERT) serving: dense recall + MaxSim rerank;
        # the dense stage keeps exact-equivalent semantics (guaranteed /
        # adaptive), so the candidate pool matches exact serving
        from codemix_dense_retrieval_tpu.io.token_shards import TokenShardStore
        from codemix_dense_retrieval_tpu.pipeline.rerank import TwoStageSearcher

        index = TwoStageSearcher(
            index, TokenShardStore.open(args.token_store),
            approx=(
                "adaptive" if mode == "adaptive"
                else ("guaranteed" if mode else False)
            ),
        )
        if args.k_dense:
            search_kwargs["k_dense"] = args.k_dense
    service = SearchService(
        encoder, index,
        default_k=args.k, max_k=args.max_k,
        max_batch=args.max_batch, max_wait_s=args.max_wait_ms / 1000.0,
        encode_batch=args.enc_batch,
        approx=mode if not args.token_store else False,
        snapshot_root=args.snapshot_root,
        index_search_kwargs=search_kwargs,
    )
    if args.warm:
        # compile every (batch, k) serving bucket BEFORE accepting
        # traffic — a cold bucket costs minutes on a fresh TPU process
        print(json.dumps({"warmup": service.warmup()}))
    server = make_server(
        service, host=args.host, port=args.port,
        info={"model": args.encoder, "docs": index.count},
    )
    host, port = server.server_address[:2]
    print(json.dumps({"serving": f"http://{host}:{port}", "docs": index.count}))
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        service.close()


def cmd_tune(args) -> None:
    """Autotune kernel/routing constants on the live backend and persist
    them to the per-device-kind store (FAISS `ParameterSpace` analog —
    see utils/autotune.py)."""
    from codemix_dense_retrieval_tpu.utils.autotune import (
        run_autotune,
        tune_file_path,
    )

    update = run_autotune(
        topk=not args.skip_topk,
        flash=not args.skip_flash,
        save=not args.dry_run,
        rows=args.rows,
        dim=args.dim,
        batch=args.batch,
        ks=tuple(args.ks),
        iters=args.iters,
    )
    update["tune_file"] = None if args.dry_run else str(tune_file_path())
    if args.sketch_index:
        # calibrate the sketch tier's operating points on a REAL index:
        # corpus rows double as probe queries (self-retrieval proxy);
        # results persist in that index's sketch.npz, not the tune file
        import numpy as np

        from codemix_dense_retrieval_tpu.index import DenseFlatIndex

        idx = DenseFlatIndex.load(args.sketch_index)
        idx.to_device()
        idx.enable_sketch(sketch_dim=args.sketch_dim)
        n_probe = min(512, idx.count)
        stride = max(1, idx.count // n_probe)
        probes = np.asarray(
            idx.store.vectors[::stride][:n_probe], np.float32
        )
        update["sketch"] = {
            str(kk): idx.calibrate_sketch(
                probes, kk, recall_target=args.sketch_recall
            )
            for kk in args.ks
        }
        if args.adaptive:
            # adaptive probed-exact operating points on the same probes:
            # fastest measured probe per depth + speedup-vs-exact (drives
            # guaranteed-mode routing); persists in the same sketch.npz
            update["adaptive"] = {
                str(kk): idx.calibrate_adaptive(probes, kk)
                for kk in args.ks
            }
    print(json.dumps(update))


def cmd_convert(args) -> None:
    """Convert an HF checkpoint directory to framework params (.npz)."""
    import json as _json

    from codemix_dense_retrieval_tpu.models.convert import (
        load_hf_checkpoint,
        save_params_npz,
    )
    from codemix_dense_retrieval_tpu.models.dialects import default_pooling

    cfg, params = load_hf_checkpoint(
        args.src, pooling=default_pooling(args.encoder)
    )
    if getattr(args, "weight_quant", None):
        # persist quantized (bitsandbytes save-quantized analog): 2x/~4x
        # smaller on disk, and from_checkpoint arms dequant automatically
        from codemix_dense_retrieval_tpu.ops.weight_quant import quantize_tree

        params = quantize_tree(params, args.weight_quant)
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    save_params_npz(out / "params.npz", params)
    import dataclasses

    cfg_dict = dataclasses.asdict(cfg)
    cfg_dict["dtype"] = str(cfg_dict["dtype"])
    (out / "encoder_config.json").write_text(_json.dumps(cfg_dict, indent=2))
    # copy tokenizer.json through when present so from_checkpoint finds it
    tok = pathlib.Path(args.src) / "tokenizer.json"
    if tok.exists():
        (out / "tokenizer.json").write_text(tok.read_text(encoding="utf-8"), encoding="utf-8")
    print(f"converted {args.src} -> {out} ({cfg.num_layers} layers, dim {cfg.hidden_size})")


def cmd_sweep(args) -> None:
    from codemix_dense_retrieval_tpu.orchestrate.scheduler import run_sweep_cli

    run_sweep_cli(args)


def cmd_make_plan(args) -> None:
    """Emit a sweep-plan JSON from the built-in experiment matrices
    (replaces the bash schedulers' inline job tables:
    run_all_vector_pairs.sh BILINGUAL_PAIRS_DEFAULT, reproduce_en_zh.sh,
    run_ablation.sh model x block maps)."""
    from codemix_dense_retrieval_tpu.orchestrate import plans as P

    if args.kind in ("all-pairs", "en-zh-repro") and not args.index_root:
        raise SystemExit(f"[ERROR] {args.kind} needs --index_root")
    runner_args = []
    for spec in args.runner_arg or []:
        runner_args.extend(spec.split())
    if args.kind == "all-pairs":
        plan = P.build_all_pairs_plan(
            index_root=args.index_root, query_tsv_root=args.query_tsv_root,
            result_root=args.result_root, encoder=args.encoder,
            checkpoint=args.checkpoint, qrels=args.qrels, size=args.size,
            k=args.k, extra_runner_args=runner_args,
        )
    elif args.kind == "en-zh-repro":
        plan = P.build_en_zh_repro_plan(
            index_root=args.index_root,
            query_tsv_en=str(pathlib.Path(args.query_tsv_root) / "queries.en.tsv"),
            query_tsv_zh=str(pathlib.Path(args.query_tsv_root) / "queries.zh.tsv"),
            band_dir=args.band_dir, result_root=args.result_root,
            encoder=args.encoder, checkpoint=args.checkpoint,
            qrels=args.qrels, size=args.size,
            k=args.k, extra_runner_args=runner_args,
        )
    else:  # ablation
        roots = dict(kv.split("=", 1) for kv in (args.index_root_by_model or []))
        if not roots:
            raise SystemExit(
                "[ERROR] ablation needs --index_root_by_model TAG=ROOT ..."
            )
        cps = dict(kv.split("=", 1) for kv in (args.checkpoints or []))
        plan = P.build_ablation_plan(
            index_root_by_model=roots, query_tsv_root=args.query_tsv_root,
            result_root=args.result_root, checkpoints=cps, qrels=args.qrels,
            size=args.size,
        )
    out = P.write_plan(plan, args.out)
    print(json.dumps({"plan": str(out), "jobs": len(plan["jobs"])}))


def cmd_collect(args) -> None:
    if args.ablation:
        from codemix_dense_retrieval_tpu.analysis.ablation import (
            collect_ablation_cli,
        )

        collect_ablation_cli(
            args.results_root, args.out,
            reference_format=getattr(args, "reference_format", False),
        )
    else:
        from codemix_dense_retrieval_tpu.analysis.collect import collect_cli

        collect_cli(args)


def cmd_paper_values(args) -> None:
    """Full paper-statistics report over a results tree (replaces
    `calculate_paper_values.py`)."""
    import pathlib

    from codemix_dense_retrieval_tpu.analysis.collect import collect_results, compute_summary
    from codemix_dense_retrieval_tpu.analysis.paper_values import paper_values_report

    rows = collect_results(args.results_root)
    summary = compute_summary(rows)
    report = paper_values_report(summary, rows, n_boot=args.n_boot)
    if args.out:
        out = pathlib.Path(args.out)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(report)
        print(f"wrote {out} ({len(summary)} summary rows)")
    else:
        print(report)


def cmd_plots(args) -> None:
    """Paper figures over a results tree (replaces `plot_diagram_2.py`)."""
    from codemix_dense_retrieval_tpu.analysis.collect import collect_results, compute_summary
    from codemix_dense_retrieval_tpu.analysis.plots import generate_all

    rows = collect_results(args.results_root)
    summary = compute_summary(rows)
    paths = generate_all(rows, summary, args.outdir)
    print(f"wrote {len(paths)} figures to {args.outdir}")


# ---------------------------------------------------------------------------

def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--encoder", default="BAAI/bge-m3")
    p.add_argument("--checkpoint", help="converted HF checkpoint dir (config.json + weights)")
    p.add_argument("--smoke_dim", type=int, default=64, help="hidden size for random-init smoke mode")
    p.add_argument("--weight_quant", choices=("int8", "nf4"),
                   help="quantize encoder Linear weights in HBM (the "
                        "bitsandbytes load_in_8bit/4bit analog)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--enc_batch", type=int, default=64)
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel encode devices (-1 = all)")
    p.add_argument("--shards", type=int, default=-1, help="index shard axis size (-1 = all devices)")
    p.add_argument("--verbosity", type=int, default=1)


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="codemix_dense_retrieval_tpu",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("encode-corpus", help="encode per-language corpora into shard stores")
    _add_common(p)
    p.add_argument("--repo", help="HF dataset repo (e.g. unicamp-dl/mmarco)")
    p.add_argument("--langs", nargs="+", default=["english"])
    p.add_argument("--corpus_tsv", nargs="+", help="LANG=PATH offline corpus TSVs")
    p.add_argument("--out", required=True)
    p.add_argument("--rel_ids", help="file with relevant docids (subset mode)")
    p.add_argument("--rel_qrels", help="qrels file to harvest relevant docids from")
    p.add_argument("--subset_neg_cap", type=int, default=0)
    p.add_argument("--neg_prob", type=float, default=1.0)
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--max_docs", type=int, default=0)
    p.add_argument("--storage_dtype", default="bfloat16")
    p.add_argument("--tokens_per_doc", type=int, default=0,
                   help="also write a <lang>/tokens store for two-stage MaxSim serving")
    p.add_argument("--token_dtype", default="int8")
    p.add_argument("--pack", action="store_true",
                   help="sequence-packed encode: short passages share device "
                        "rows under a block-diagonal attention mask (removes "
                        "intra-bucket pad waste)")
    p.add_argument("--force", action="store_true")
    p.set_defaults(fn=cmd_encode_corpus)

    p = sub.add_parser("run-mono", help="word-mix band search over one index")
    _add_common(p)
    p.add_argument("--index", required=True)
    p.add_argument("--queries", nargs="+", help="band dir or TSV files")
    p.add_argument("--queries_repo", help="HF dataset repo (streaming query mode)")
    p.add_argument("--queries_config", default=None)
    p.add_argument("--queries_split", default="dev")
    p.add_argument("--qid_field", default="id")
    p.add_argument("--qtext_field", default="text")
    p.add_argument("--outdir", required=True)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--qblock", type=int, default=256)
    p.add_argument("--max_queries", type=int, default=0)
    _add_approx_flag(p)
    p.set_defaults(fn=cmd_run_mono)

    p = sub.add_parser(
        "run-rerank",
        help="two-stage search: dense recall + MaxSim token rerank "
        "(needs a token store from encode-corpus --tokens_per_doc)",
    )
    _add_common(p)
    p.add_argument("--index", nargs="+", required=True,
                   help="shard dir(s) with tokens/ substores; 2+ dirs = "
                        "bilingual hub (merge + collapse)")
    p.add_argument("--queries", nargs="+", help="band dir or TSV files")
    p.add_argument("--queries_repo", help="HF dataset repo (streaming query mode)")
    p.add_argument("--queries_config", default=None)
    p.add_argument("--queries_split", default="dev")
    p.add_argument("--qid_field", default="id")
    p.add_argument("--qtext_field", default="text")
    p.add_argument("--outdir", required=True)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--k_dense", type=int, default=0,
                   help="dense recall depth (0 = max(4k, 100))")
    p.add_argument("--qblock", type=int, default=256)
    p.add_argument("--max_queries", type=int, default=0)
    p.add_argument("--query_cache",
                   help="dir for per-set dense+token query embedding caches")
    p.set_defaults(fn=cmd_run_rerank)

    p = sub.add_parser("profile", help="capture a jax.profiler trace of a search workload")
    _add_common(p)
    p.add_argument("--index", help="shard dir (omit for a synthetic index)")
    p.add_argument("--docs", type=int, default=100_000)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--queries", type=int, default=1024)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--trace_dir", help="profiler output dir (also CDR_PROFILE_DIR)")
    _add_approx_flag(p)
    p.set_defaults(fn=cmd_profile)

    p = sub.add_parser(
        "serve",
        help="online HTTP search endpoint with TPU microbatching "
             "(GET /healthz, POST /search {queries, k})",
    )
    _add_common(p)
    p.add_argument("--index", nargs="+", required=True,
                   help="shard dir(s); several merge into one base#lang "
                        "hub index (the bilingual-serving layout)")
    p.add_argument("--lang_tags", nargs="+")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--k", type=int, default=10, help="default result depth")
    p.add_argument("--max_k", type=int, default=1000)
    p.add_argument("--max_batch", type=int, default=256,
                   help="max coalesced queries per device batch")
    p.add_argument("--max_wait_ms", type=float, default=5.0,
                   help="max wait after the first request before dispatch")
    p.add_argument("--approx", nargs="?", const="fast", default="off",
                   choices=["off", "fast", "guaranteed", "adaptive"],
                   help="serve through an approx tier: 'fast' = PCA "
                        "sketch (each result carries a per-query "
                        "'certified' flag; response rows become {hits, "
                        "certified}); 'guaranteed' escalates uncertified "
                        "queries to exact; 'adaptive' = probed-exact "
                        "cover (always exact, fastest on cluster-ordered "
                        "indexes — see reorder_rows/calibrate_adaptive). "
                        "Bare --approx means 'fast'.")
    p.add_argument("--sketch_dim", type=int, default=128,
                   help="sketch dimensionality for --approx")
    p.add_argument("--probe_bins", type=int, default=0,
                   help="bins probed per shard for --approx (0 = auto; "
                        "the FAISS nprobe analog)")
    p.add_argument("--snapshot_root",
                   help="enable POST /save, restricted to this directory "
                        "(unset = snapshots disabled over HTTP)")
    p.add_argument("--token_store",
                   help="serve TWO-STAGE: dense recall + MaxSim rerank "
                        "against this token store (built by encode-corpus "
                        "--tokens_per_doc); with --approx the dense stage "
                        "runs guaranteed-exact through the sketch tier")
    p.add_argument("--k_dense", type=int, default=0,
                   help="two-stage dense recall depth (0 = max(4k, 100))")
    p.add_argument("--warm", action="store_true",
                   help="precompile every (batch, k) serving bucket before "
                        "accepting traffic (minutes per cold program on a "
                        "fresh TPU process; cached per device kind)")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser(
        "tune",
        help="autotune kernel/routing constants on the live chip "
             "(super_size, tile_b, flash crossover/window) into a "
             "per-device-kind store consulted by the auto pickers",
    )
    _add_common(p)
    p.add_argument("--rows", type=int, default=262_144)
    p.add_argument("--dim", type=int, default=1024)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--ks", type=int, nargs="+", default=[100, 1000])
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--skip_topk", action="store_true")
    p.add_argument("--skip_flash", action="store_true")
    p.add_argument("--dry_run", action="store_true",
                   help="print winners without writing the store")
    p.add_argument("--sketch_index",
                   help="also calibrate the sketch tier's probe depths on "
                        "this index dir (self-retrieval probes; operating "
                        "points persist in its sketch.npz)")
    p.add_argument("--sketch_dim", type=int, default=128)
    p.add_argument("--sketch_recall", type=float, default=0.99)
    p.add_argument("--adaptive", action="store_true",
                   help="with --sketch_index: also calibrate the adaptive "
                        "probed-exact tier (fastest measured probe per "
                        "depth; guaranteed mode routes through it when "
                        "faster than exact)")
    p.set_defaults(fn=cmd_tune)

    p = sub.add_parser("run-mix", help="vector-mix alpha sweep over one index")
    _add_common(p)
    p.add_argument("--index", required=True)
    p.add_argument("--query_tsv", nargs=2, required=True, metavar="LANG=PATH")
    p.add_argument("--cm_alphas", nargs="+", default=[str(a) for a in DEFAULT_ALPHAS])
    p.add_argument("--query_cache")
    p.add_argument("--outdir", required=True)
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--qblock", type=int, default=1024)
    p.add_argument("--fused", action="store_true",
                   help="one-jit sweep with on-device metrics (needs --qrels)")
    p.add_argument("--qrels", help="qrels file for --fused on-device metrics")
    _add_approx_flag(p)
    p.set_defaults(fn=cmd_run_mix)

    p = sub.add_parser("run-bilingual", help="bilingual hub word-mix search (collapse-max)")
    _add_common(p)
    p.add_argument("--index", nargs="+", required=True, help="per-language shard dirs")
    p.add_argument("--lang_tags", nargs="+")
    p.add_argument("--queries", nargs="+", required=True)
    p.add_argument("--outdir", required=True)
    p.add_argument("--k", type=int, default=500)
    p.add_argument("--qblock", type=int, default=256)
    _add_approx_flag(p)
    p.set_defaults(fn=cmd_run_bilingual)

    p = sub.add_parser("run-bilingual-mix", help="bilingual hub vector-mix sweep")
    _add_common(p)
    p.add_argument("--index", nargs="+", required=True)
    p.add_argument("--lang_tags", nargs="+")
    p.add_argument("--query_tsv", nargs=2, required=True, metavar="LANG=PATH")
    p.add_argument("--cm_alphas", nargs="+", default=[str(a) for a in DEFAULT_ALPHAS])
    p.add_argument("--outdir", required=True)
    p.add_argument("--k", type=int, default=500)
    p.add_argument("--qblock", type=int, default=1024)
    p.add_argument("--fused", action="store_true",
                   help="one-jit sweep: 2k-deep raw search + on-device "
                        "collapse. PRECONDITION: the hub must be a PARALLEL "
                        "two-language concat (both halves encode the same "
                        "docid stream, mirrored order). Non-parallel hubs "
                        "(different per-language subset selections) are "
                        "rejected with an error; drop --fused to use the "
                        "host-side collapse, which handles any hub")
    p.add_argument("--qrels", help="qrels file for --fused on-device metrics")
    _add_approx_flag(p)
    p.set_defaults(fn=cmd_run_bilingual_mix)

    p = sub.add_parser("cache-queries", help="pre-encode query TSVs into npz caches")
    _add_common(p)
    p.add_argument("--query_tsv", nargs="+", required=True, metavar="LANG=PATH")
    p.add_argument("--cache_root", required=True)
    p.set_defaults(fn=cmd_cache_queries)

    p = sub.add_parser("generate-bands", help="generate code-mix band query sets (needs OPENAI_API_KEY)")
    p.add_argument("--en", required=True)
    p.add_argument("--zh", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--bands", nargs="+", default=["0-20", "20-40", "40-60", "60-80", "80-100"])
    p.add_argument("--model", default="gpt-5-mini")
    p.add_argument("--workers", type=int, default=1)
    p.add_argument("--max_queries", type=int, default=0)
    p.add_argument("--protocol", choices=["kadapt", "multi"], default="kadapt",
                   help="kadapt = reference-parity per-band K budgets "
                        "(one JSON call per attempt); multi = simple "
                        "multi-candidate protocol")
    p.set_defaults(fn=cmd_generate_bands)

    p = sub.add_parser("download-queries", help="download mMARCO dev queries to TSVs")
    p.add_argument("--langs", nargs="+", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--repo", default="unicamp-dl/mmarco")
    p.add_argument("--split_prefix", default="queries-")
    p.set_defaults(fn=cmd_download_queries)

    sub.add_parser(
        "evaluate",
        help="evaluate a TREC run (all reference evaluate.py flags)",
        add_help=False,
    ).set_defaults(fn=cmd_evaluate, passthrough=True)

    p = sub.add_parser("analyze", help="embedding-space geometry analysis (EN/ZH/CM triplets)")
    _add_common(p)
    p.add_argument("--query_tsv", nargs=3, required=True, metavar="LANG=PATH")
    p.add_argument("--outdir", required=True)
    p.set_defaults(fn=cmd_analyze)

    p = sub.add_parser("convert", help="convert an HF checkpoint to framework params")
    p.add_argument("--encoder", default="BAAI/bge-m3")
    p.add_argument("--src", required=True, help="HF checkpoint dir")
    p.add_argument("--out", required=True)
    p.add_argument("--weight_quant", choices=("int8", "nf4"),
                   help="persist Linear kernels quantized (2x/~4x smaller "
                        "checkpoint; loads straight into the fused-dequant "
                        "forward)")
    p.set_defaults(fn=cmd_convert)

    p = sub.add_parser(
        "make-plan",
        help="emit a sweep-plan JSON from the built-in matrices "
             "(all-pairs 105 jobs / en-zh-repro 6 jobs / ablation blocks)",
    )
    p.add_argument("kind", choices=["all-pairs", "en-zh-repro", "ablation"])
    p.add_argument("--index_root")
    p.add_argument("--index_root_by_model", nargs="+", metavar="TAG=ROOT")
    p.add_argument("--query_tsv_root", required=True,
                   help="directory of queries.<lang>.tsv files")
    p.add_argument("--band_dir", help="word-mix band dir (en-zh-repro)")
    p.add_argument("--result_root", required=True)
    p.add_argument("--encoder", default="BAAI/bge-m3")
    p.add_argument("--checkpoint")
    p.add_argument("--checkpoints", nargs="+", metavar="TAG=PATH")
    p.add_argument("--qrels")
    p.add_argument("--size", type=int, default=100_000)
    p.add_argument("--k", type=int, help="search depth override for every job")
    p.add_argument("--runner_arg", action="append", metavar="'--flag value'",
                   help="extra args appended to every runner argv "
                        "(repeatable; e.g. --runner_arg '--smoke_dim 32')")
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_make_plan)

    p = sub.add_parser("sweep", help="experiment scheduler (replaces the bash schedulers)")
    p.add_argument("--plan", required=True, help="JSON sweep plan file")
    p.add_argument("--max_failures", type=int, default=1)
    p.add_argument("--slots", type=int, default=1,
                   help="concurrency when the plan has no device_slots table")
    p.add_argument("--dry_run", action="store_true")
    p.set_defaults(fn=cmd_sweep)

    p = sub.add_parser("collect", help="aggregate result trees into CSV summaries")
    p.add_argument("--results_root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--ablation", action="store_true")
    p.add_argument("--reference_format", action="store_true",
                   help="emit the reference collector's CSV schema "
                        "(full_mmarco_results.csv columns, metrics x100)")
    p.set_defaults(fn=cmd_collect)

    p = sub.add_parser("paper-values", help="paper statistics report over a results tree")
    p.add_argument("--results_root", required=True)
    p.add_argument("--out", help="report path (stdout when omitted)")
    p.add_argument("--n_boot", type=int, default=2000)
    p.set_defaults(fn=cmd_paper_values)

    p = sub.add_parser("plots", help="paper figures over a results tree")
    p.add_argument("--results_root", required=True)
    p.add_argument("--outdir", required=True)
    p.set_defaults(fn=cmd_plots)

    return ap


def main(argv: Optional[Sequence[str]] = None) -> None:
    # honor JAX_PLATFORMS=cpu even when a sitecustomize pre-registered a
    # TPU plugin (env vars are otherwise ignored there; backends are lazy
    # so an in-process config flip here still works)
    import os

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    from codemix_dense_retrieval_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    # passthrough for `evaluate` (keeps the reference CLI intact)
    if argv and argv[0] == "evaluate":
        from codemix_dense_retrieval_tpu.evals.evaluate import main as eval_main

        eval_main(argv[1:])
        return
    ap = build_parser()
    args = ap.parse_args(argv)
    setup_logging(getattr(args, "verbosity", 1))
    args.fn(args)


if __name__ == "__main__":
    main()
