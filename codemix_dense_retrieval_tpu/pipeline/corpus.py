"""Corpus streaming, subset selection, and the encode+index builder.

Replaces the reference's corpus encoder+indexer
(`encode_multilingual_corpus.py:191-532`) with:

- pluggable streaming sources (TSV file / HF datasets / synthetic);
- **exact selection-semantics parity** (`:400-421`): in subset mode the
  first language keeps every relevant docid and samples non-relevant ones
  with probability ``neg_prob`` until ``subset_neg_cap`` negatives are
  kept (early-stopping once the cap is hit and all relevants are seen);
  every later language mirrors the first language's selected docid set;
- per-language ShardStore output with the reference's artifact layout and
  resume-if-manifest-exists semantics (`:342-344`);
- data-parallel encoding through the jitted TextEncoder (the hot loop —
  SURVEY §3.1).
"""

from __future__ import annotations

import json
import pathlib
import random
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, Iterable, Iterator, List, Optional, Sequence, Set, Tuple

import numpy as np

from codemix_dense_retrieval_tpu.io.shards import ShardStore, ShardWriter
from codemix_dense_retrieval_tpu.io.token_shards import TokenShardStore, TokenShardWriter
from codemix_dense_retrieval_tpu.utils.logging import get_logger

log = get_logger("corpus")

Doc = Tuple[str, str]  # (docid, text)


class TsvCorpusSource:
    """``docid \\t text`` file source."""

    def __init__(self, path, lang: Optional[str] = None) -> None:
        self.path = pathlib.Path(path)
        self.lang = lang

    def __iter__(self) -> Iterator[Doc]:
        with open(self.path, encoding="utf-8") as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                parts = line.split("\t", 1)
                if len(parts) == 2 and parts[1]:
                    yield parts[0], parts[1]


class HFCorpusSource:
    """HF datasets streaming source (mMARCO ``collection-<lang>``),
    mirroring `encode_multilingual_corpus.py:330`."""

    def __init__(
        self,
        repo: str,
        config: str,
        split: str = "collection",
        id_field: str = "id",
        text_field: str = "text",
    ) -> None:
        self.repo, self.config, self.split = repo, config, split
        self.id_field, self.text_field = id_field, text_field

    def __iter__(self) -> Iterator[Doc]:
        from datasets import load_dataset

        ds = load_dataset(self.repo, self.config, split=self.split, streaming=True)
        for x in ds:
            text = x.get(self.text_field, "")
            if text:
                yield str(x[self.id_field]), text


class SyntheticCorpusSource:
    """Deterministic synthetic passages (tests/benchmarks)."""

    def __init__(self, n: int, lang: str = "en", seed: int = 0) -> None:
        self.n, self.lang, self.seed = n, lang, seed

    def __iter__(self) -> Iterator[Doc]:
        rng = random.Random(self.seed)
        words = [f"w{i}" for i in range(500)]
        for i in range(self.n):
            text = " ".join(rng.choice(words) for _ in range(rng.randint(5, 30)))
            yield str(i), f"[{self.lang}] {text}"


@dataclass
class SelectionState:
    """First-language selection state shared across languages (mirror)."""

    rel_ids: Set[str]
    subset_neg_cap: int = 0
    neg_prob: float = 1.0
    seed: int = 42
    selected: Set[str] = field(default_factory=set)
    neg_kept: int = 0
    _rng: random.Random = field(default=None, repr=False)  # type: ignore[assignment]

    def __post_init__(self) -> None:
        self._rng = random.Random(self.seed)

    @property
    def subset_mode(self) -> bool:
        return bool(self.subset_neg_cap)

    def select_first_lang(self, docid: str) -> bool:
        """Relevant docids always kept; negatives sampled up to the cap."""
        if not self.subset_mode:
            self.selected.add(docid)
            return True
        if docid in self.rel_ids:
            self.selected.add(docid)
            return True
        if self.neg_kept < self.subset_neg_cap and self._rng.random() < self.neg_prob:
            if docid not in self.selected:
                self.selected.add(docid)
                self.neg_kept += 1
            return True
        return False

    def first_lang_done(self, seen_rel: Set[str]) -> bool:
        """Early stop: negative cap reached and all relevants captured."""
        return (
            self.subset_mode
            and self.neg_kept >= self.subset_neg_cap
            and seen_rel >= self.rel_ids
        )

    def select_mirror(self, docid: str) -> bool:
        return docid in self.selected


def _batched(it: Iterable, n: int) -> Iterator[List]:
    buf: List = []
    for x in it:
        buf.append(x)
        if len(buf) == n:
            yield buf
            buf = []
    if buf:
        yield buf


def _backfill_tokens(
    encoder,
    source: Iterable[Doc],
    lang: str,
    lang_dir: pathlib.Path,
    existing: ShardStore,
    tokens_per_doc: int,
    token_dtype: str,
    batch_size: int,
    enc_batch: int,
) -> None:
    """Token store for a language whose dense index is already complete:
    a token-only encode pass over exactly the docids the index kept."""
    log.info("backfilling token store for already-indexed language %s", lang)
    wanted = set(existing.docids)
    tok_writer, tok_written = TokenShardWriter.resume_partial(
        lang_dir / "tokens",
        token_dim=encoder.dim,
        tokens_per_doc=tokens_per_doc,
        dtype=token_dtype,
        lang=lang,
        encoder=getattr(encoder, "name", None),
    )
    done = len(tok_written)
    for batch in _batched(iter(source), batch_size):
        if done >= len(wanted):
            break
        keep = [
            (d, t) for d, t in batch if d in wanted and d not in tok_written
        ]
        if not keep:
            continue
        ids = [d for d, _ in keep]
        toks, lens = encoder.encode_documents_tokens(
            [t for _, t in keep], batch_size=enc_batch
        )
        tok_writer.append(toks, lens, ids, [f"{d}#{lang}" for d in ids])
        tok_written.update(ids)
        done += len(ids)
    tok_writer.finalize()
    # the backfill reconstructs row order by re-iterating the source; any
    # source-order drift or duplicate docid would silently desync rows
    # against the dense index (advisor r2) — verify before shipping
    built = TokenShardStore.open(lang_dir / "tokens")
    if list(built.docids) != list(existing.docids):
        raise RuntimeError(
            f"token-store backfill for {lang} produced a docid order that "
            f"does not match the dense index ({built.count} vs "
            f"{existing.count} rows) — source stream drifted since the "
            f"index was built; re-encode with --force"
        )


def encode_corpus(
    encoder,
    sources: Dict[str, Iterable[Doc]],
    out_root,
    *,
    selection: Optional[SelectionState] = None,
    batch_size: int = 256,
    enc_batch: int = 64,
    max_docs: int = 0,
    storage_dtype: str = "bfloat16",
    force: bool = False,
    progress: Optional[Callable[[str, int], None]] = None,
    tokens_per_doc: int = 0,
    token_dtype: str = "int8",
    pack: bool = False,
) -> Dict[str, pathlib.Path]:
    """Encode per-language corpora into ShardStore directories.

    ``sources`` maps language code -> doc stream; the FIRST entry drives
    selection, later ones mirror (reference `:419-421`). Languages whose
    manifest already exists are skipped (resume, `:342-344`).
    Returns {lang: shard_dir}.

    ``tokens_per_doc > 0`` additionally writes a per-language
    :class:`~codemix_dense_retrieval_tpu.io.token_shards.TokenShardStore`
    at ``<lang>/tokens`` for two-stage MaxSim serving — one backbone pass
    produces both the dense row and the token block
    (``encode_documents_with_tokens``). Each store resumes independently,
    so a crash between the two appends self-heals on restart; a language
    whose dense index is already complete gets its token store backfilled
    with a token-only encode pass.
    """
    out_root = pathlib.Path(out_root)
    out_root.mkdir(parents=True, exist_ok=True)
    selection = selection or SelectionState(rel_ids=set())
    results: Dict[str, pathlib.Path] = {}
    base_ids_global: Set[str] = set()
    started = time.strftime("%Y-%m-%d %H:%M:%S")

    for lang_idx, (lang, source) in enumerate(sources.items()):
        lang_dir = out_root / lang
        results[lang] = lang_dir
        if not force and ShardStore.exists(lang_dir):
            log.info("language %s already indexed; skipping (resume)", lang)
            existing = ShardStore.open(lang_dir)
            if lang_idx == 0:
                # rebuild selection state from the checkpoint, like
                # load_existing_state (`:130-161`)
                selection.selected.update(existing.docids)
                selection.neg_kept += sum(
                    1 for d in existing.docids if d not in selection.rel_ids
                )
            base_ids_global.update(existing.docids)
            if tokens_per_doc and not TokenShardStore.exists(lang_dir / "tokens"):
                _backfill_tokens(
                    encoder, source, lang, lang_dir, existing,
                    tokens_per_doc, token_dtype, batch_size, enc_batch,
                )
            elif tokens_per_doc:
                tok_existing = TokenShardStore.open(lang_dir / "tokens")
                if tok_existing.count != existing.count:
                    raise ValueError(
                        f"token store for {lang} is finalized with "
                        f"{tok_existing.count} rows but the dense index has "
                        f"{existing.count}; delete {lang_dir / 'tokens'} and "
                        f"re-run to rebuild it"
                    )
            continue

        # mid-language resume: reopen partial shard files and skip docids
        # already encoded (selection is deterministic under the same seed
        # and stream order, so replaying it reproduces the same keep-set)
        writer, already_written = ShardWriter.resume_partial(
            lang_dir,
            dim=encoder.dim,
            dtype=storage_dtype,
            lang=lang,
            encoder=getattr(encoder, "name", None),
        )
        if already_written:
            log.info(
                "resuming language %s mid-encode: %d vectors already on disk",
                lang, len(already_written),
            )
            # pre-crash rows are part of the language's index: without
            # this the root docids.txt would omit them after a resume
            base_ids_global.update(already_written)
        tok_writer = None
        tok_written: Set[str] = set()
        if tokens_per_doc:
            tok_writer, tok_written = TokenShardWriter.resume_partial(
                lang_dir / "tokens",
                token_dim=encoder.dim,
                tokens_per_doc=tokens_per_doc,
                dtype=token_dtype,
                lang=lang,
                encoder=getattr(encoder, "name", None),
            )
        seen_rel: Set[str] = set()
        kept = writer.count

        def tok_lagging() -> bool:
            # a crash between the dense and token appends leaves the
            # token store short of the dense one; every "dense looks
            # done" early stop must keep scanning until the token side
            # has caught up, or finalize() would pin a short token
            # manifest that only fails at serving time
            return tok_writer is not None and tok_writer.count < writer.count

        for batch in _batched(iter(source), batch_size):
            if lang_idx == 0 and selection.first_lang_done(seen_rel) and not tok_lagging():
                break
            if (
                lang_idx > 0
                and selection.subset_mode
                and kept >= len(selection.selected)
                and not tok_lagging()
            ):
                break
            keep_ids: List[str] = []
            keep_texts: List[str] = []
            new_dense = 0
            for docid, text in batch:
                if lang_idx == 0:
                    ok = selection.select_first_lang(docid)
                    if ok and docid in selection.rel_ids:
                        seen_rel.add(docid)
                else:
                    ok = selection.select_mirror(docid)
                if not ok:
                    continue
                need_dense = docid not in already_written
                if max_docs and need_dense and kept + new_dense >= max_docs:
                    # past the dense cap. Token catch-up rows can only be
                    # docids ALREADY in the dense store, and both stores
                    # fill in stream order, so none can lie past this
                    # point — stop scanning the batch.
                    break
                need_tok = tok_writer is not None and docid not in tok_written
                if need_dense or need_tok:
                    keep_ids.append(docid)
                    keep_texts.append(text)
                    if need_dense:
                        new_dense += 1
            if not keep_ids:
                if max_docs and kept >= max_docs and not tok_lagging():
                    break
                continue
            if tok_writer is None:
                # bf16 stores never see the f32 mantissa — downcast the
                # device->host transfer itself (halves tunnel bytes)
                vecs = encoder.encode_documents(
                    keep_texts, batch_size=enc_batch,
                    readback_dtype="bfloat16" if storage_dtype == "bfloat16" else None,
                    pack=pack,
                )
                toks = lens = None
            else:
                vecs, toks, lens = encoder.encode_documents_with_tokens(
                    keep_texts, batch_size=enc_batch, pack=pack
                )
            # each store skips only its OWN already-written rows, so a
            # crash between the dense and token appends self-heals here
            dense_new = [i for i, d in enumerate(keep_ids) if d not in already_written]
            if dense_new:
                ids_n = [keep_ids[i] for i in dense_new]
                writer.append(vecs[dense_new], ids_n, [f"{d}#{lang}" for d in ids_n])
                kept += len(ids_n)
                base_ids_global.update(ids_n)
            if tok_writer is not None:
                tok_new = [i for i, d in enumerate(keep_ids) if d not in tok_written]
                if tok_new:
                    ids_t = [keep_ids[i] for i in tok_new]
                    tok_writer.append(
                        toks[tok_new], lens[tok_new], ids_t,
                        [f"{d}#{lang}" for d in ids_t],
                    )
            if progress:
                progress(lang, kept)
            if max_docs and kept >= max_docs and not tok_lagging():
                break
        writer.finalize(
            extra={
                "subset_mode": selection.subset_mode,
                "neg_kept": selection.neg_kept,
                "rel_ids": len(selection.rel_ids),
            }
        )
        if tok_writer is not None:
            tok_writer.finalize()
        log.info("saved %d vectors for language %s -> %s", kept, lang, lang_dir)

    # root-level artifacts (reference `:513-531`)
    (out_root / "docids.txt").write_text(
        "\n".join(sorted(base_ids_global)), encoding="utf-8"
    )
    meta = {
        "started_at": started,
        "encoder": getattr(encoder, "name", None),
        "dtype": storage_dtype,
        "normalize_embeddings": True,
        "langs": list(sources.keys()),
        "subset_neg_cap": selection.subset_neg_cap,
        "neg_prob": selection.neg_prob,
        "rel_ids": len(selection.rel_ids),
        "saved_dir": str(out_root),
        "dimension": encoder.dim,
        "tokens_per_doc": tokens_per_doc,
        "token_dtype": token_dtype if tokens_per_doc else None,
        "indexes": [
            {"lang": lang, "path": str(path)} for lang, path in results.items()
        ],
    }
    (out_root / "meta.json").write_text(json.dumps(meta, indent=2), encoding="utf-8")
    return results
