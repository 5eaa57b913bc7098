"""Token-level embedding shard store for multi-vector (late-interaction)
serving.

Completes the two-stage ColBERT/BGE-M3-colbert serving path at corpus
scale: the dense stage recalls candidates from the flat index
(`index/flat.py`), then the candidates' *token* embeddings are gathered
from this store and reranked by the chunked MaxSim kernel
(`ops/maxsim.py`). The reference serves only the dense CLS vector
(`onepass_dense_run.py:305`, BGE-M3 dense head); the colbert head this
store enables is the documented beyond-parity capability
(ROUND_STATUS round-1 item 6).

Layout — composition over the proven `ShardStore` machinery: each
document's token block is one flat row of ``tokens_per_doc * token_dim``
in an inner shard directory, plus two sidecars:

    <dir>/...                 inner ShardStore files (emb.*.bin, docids,
                              manifest with extra.kind = "token_store")
    <dir>/lengths.bin         int32 valid-token count per row
    <dir>/token_scales.bin    f32 (count * tokens_per_doc) per-TOKEN
                              symmetric int8 scales (int8 storage only)

Per-token (not per-row) scales keep MaxSim dot products accurate: a
single hot token would otherwise crush the resolution of every other
token in its document. Storage cost at int8 is Td*d bytes/doc — 16 KB
at (128, 128) — vs 64 KB for f32 token blocks.

Crash-resume mirrors the dense store: the inner writer reconciles torn
vector rows and the docid sidecar; this wrapper then truncates
``lengths.bin``/``token_scales.bin`` to the reconciled row count.
"""

from __future__ import annotations

import pathlib
from typing import List, Optional, Sequence, Set, Tuple

import numpy as np

from codemix_dense_retrieval_tpu.io.shards import (
    PathLike,
    ShardStore,
    ShardWriter,
    storage_dtype,
)


def _quantize_tokens_np(tokens: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-token symmetric int8: (n, T, d) f32 -> ((n, T, d) int8, (n, T) f32)."""
    tokens = np.asarray(tokens, np.float32)
    amax = np.abs(tokens).max(axis=-1)
    scales = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(tokens / scales[..., None]), -127, 127).astype(np.int8)
    return q, scales


class TokenShardWriter:
    """Streaming writer of fixed-``tokens_per_doc`` token blocks."""

    def __init__(
        self,
        out_dir: PathLike,
        token_dim: int,
        tokens_per_doc: int,
        dtype: str = "int8",
        *,
        lang: Optional[str] = None,
        encoder: Optional[str] = None,
        rows_per_file: int = 65_536,
    ) -> None:
        self.token_dim = token_dim
        self.tokens_per_doc = tokens_per_doc
        self.dtype_name = dtype
        self._inner = ShardWriter(
            out_dir,
            tokens_per_doc * token_dim,
            dtype,
            lang=lang,
            encoder=encoder,
            normalized=True,  # per-token L2 (models.token_embeddings contract)
            rows_per_file=rows_per_file,
        )
        self.dir = self._inner.dir

    @classmethod
    def resume_partial(
        cls,
        out_dir: PathLike,
        token_dim: int,
        tokens_per_doc: int,
        dtype: str = "int8",
        **kw,
    ) -> Tuple["TokenShardWriter", Set[str]]:
        w = cls(out_dir, token_dim, tokens_per_doc, dtype, **kw)
        inner, existing = ShardWriter.resume_partial(
            out_dir, tokens_per_doc * token_dim, dtype,
            lang=w._inner.lang, encoder=w._inner.encoder,
            rows_per_file=w._inner.rows_per_file,
        )
        inner.normalized = True
        w._inner = inner
        total = inner.count
        # sidecars are appended before the vector flush (same durability
        # order as the inner writer's docids) — truncate any run-ahead rows
        for name, itemsize, per_row in (
            ("lengths.bin", 4, 1),
            ("token_scales.bin", 4, tokens_per_doc),
        ):
            path = w.dir / name
            if not path.exists():
                if total and (name != "token_scales.bin" or dtype == "int8"):
                    raise ValueError(f"{name} missing from partial token shard {w.dir}")
                continue
            want = total * per_row * itemsize
            if path.stat().st_size > want:
                with open(path, "r+b") as fh:
                    fh.truncate(want)
            elif path.stat().st_size < want:
                raise ValueError(
                    f"{name} has fewer rows than the vectors in {w.dir} "
                    "(corrupt partial token shard)"
                )
        return w, existing

    @property
    def count(self) -> int:
        return self._inner.count

    def append(
        self,
        token_embs: np.ndarray,  # (n, T, token_dim) f32/bf16 — T may vary per batch
        lengths: Sequence[int],  # valid tokens per doc (<= T semantics enforced)
        docids: Sequence[str],
        derived_ids: Optional[Sequence[str]] = None,
    ) -> None:
        token_embs = np.asarray(token_embs)
        n, t, d = token_embs.shape
        if d != self.token_dim:
            raise ValueError(f"token dim {d} != store token_dim {self.token_dim}")
        td = self.tokens_per_doc
        # clamp to BOTH the store's Td and the batch's actual token axis t:
        # a length > t would mark zero-padded slots valid, and a valid
        # all-zero token floors every query token's max-sim at 0 (advisor r2)
        lengths = np.minimum(np.asarray(lengths, np.int32), min(t, td))
        # pad/truncate every block to the store's fixed Td; tokens past a
        # doc's valid length are zeroed so int8 scales stay exactly 1.0
        block = np.zeros((n, td, d), np.float32)
        keep = min(t, td)
        block[:, :keep] = token_embs[:, :keep].astype(np.float32)
        mask = np.arange(td)[None, :] < lengths[:, None]
        block *= mask[..., None]
        with open(self.dir / "lengths.bin", "ab") as fh:
            fh.write(np.ascontiguousarray(lengths, np.int32).tobytes())
        if self.dtype_name == "int8":
            q, scales = _quantize_tokens_np(block)
            with open(self.dir / "token_scales.bin", "ab") as fh:
                fh.write(np.ascontiguousarray(scales, np.float32).tobytes())
            flat = q.reshape(n, td * d)  # already int8: inner append stores as-is
        else:
            flat = block.reshape(n, td * d)
        self._inner.append(flat, docids, derived_ids)

    def finalize(self, extra=None) -> None:
        meta = dict(extra or {})
        meta.update(
            kind="token_store",
            tokens_per_doc=self.tokens_per_doc,
            token_dim=self.token_dim,
        )
        self._inner.finalize(extra=meta)


class TokenShardStore:
    """Reader: memory-mapped token blocks with host gather for rerank."""

    def __init__(
        self,
        inner: ShardStore,
        tokens_per_doc: int,
        token_dim: int,
        lengths: np.ndarray,
        token_scales: Optional[np.ndarray],
        parts: Optional[List[np.ndarray]] = None,
    ) -> None:
        self._inner = inner
        self.tokens_per_doc = tokens_per_doc
        self.token_dim = token_dim
        self.lengths = lengths
        self.token_scales = token_scales  # (count, Td) f32 for int8 stores
        # per-file memmap views + cumulative row offsets: a corpus-scale
        # token store spans many bin files (16 KB/row at (128,128) int8),
        # and ShardStore.open CONCATENATES multi-file stores into RAM —
        # gathering through the per-part maps keeps the store on disk
        self._parts = parts
        self._part_offsets = None
        if parts is not None:
            self._part_offsets = np.cumsum([0] + [p.shape[0] for p in parts])

    @property
    def count(self) -> int:
        return self._inner.count

    @property
    def docids(self) -> List[str]:
        return self._inner.docids

    @property
    def dtype(self) -> str:
        return self._inner.manifest.dtype

    @classmethod
    def exists(cls, directory: PathLike) -> bool:
        if not ShardStore.exists(directory):
            return False
        import json

        m = json.loads((pathlib.Path(directory) / "manifest.json").read_text())
        return m.get("extra", {}).get("kind") == "token_store"

    @classmethod
    def open(cls, directory: PathLike, *, mmap: bool = True) -> "TokenShardStore":
        # concat_parts=False: a multi-file token store must NOT be
        # materialized into RAM at open (inner.vectors stays None; every
        # gather goes through the per-part memmaps below)
        inner = ShardStore.open(directory, mmap=mmap, concat_parts=not mmap)
        parts = None
        if mmap and len(inner.manifest.files) > 1:
            dtype = storage_dtype(inner.manifest.dtype)
            d = pathlib.Path(directory)
            parts = [
                np.memmap(d / f["name"], dtype=dtype, mode="r",
                          shape=(f["rows"], inner.dim))
                for f in inner.manifest.files
            ]
        extra = inner.manifest.extra
        if extra.get("kind") != "token_store":
            raise ValueError(f"{directory} is not a token shard store")
        td = int(extra["tokens_per_doc"])
        d = int(extra["token_dim"])
        if td * d != inner.dim:
            raise ValueError(
                f"manifest dim {inner.dim} != tokens_per_doc*token_dim {td * d}"
            )
        directory = pathlib.Path(directory)
        lengths = np.fromfile(directory / "lengths.bin", dtype=np.int32)
        if lengths.shape[0] != inner.count:
            raise ValueError(
                f"lengths count {lengths.shape[0]} != manifest count {inner.count}"
            )
        scales = None
        if inner.manifest.dtype == "int8":
            scales = np.memmap(
                directory / "token_scales.bin", dtype=np.float32, mode="r",
            )
            if scales.shape[0] != inner.count * td:
                raise ValueError(
                    f"token_scales count {scales.shape[0]} != count*Td "
                    f"{inner.count * td}"
                )
            scales = scales.reshape(inner.count, td)
        return cls(inner, td, d, lengths, scales, parts=parts)

    # ---------------- gather ----------------

    def gather_quantized(
        self, rows: np.ndarray
    ) -> Tuple[np.ndarray, Optional[np.ndarray], np.ndarray]:
        """Raw stored blocks for the given row ids: (tokens (n, Td, d) in the
        storage dtype, per-token scales (n, Td) or None, mask (n, Td) int32).
        The fancy index touches only the candidates' pages of the memmap —
        the rerank stage never loads the full token matrix."""
        rows = np.asarray(rows, np.int64)
        if self._parts is not None:
            flat = np.empty((len(rows), self._inner.dim),
                            dtype=self._parts[0].dtype)
            part_of = np.searchsorted(self._part_offsets, rows, side="right") - 1
            for p in np.unique(part_of):
                sel = part_of == p
                flat[sel] = self._parts[p][rows[sel] - self._part_offsets[p]]
        else:
            flat = np.asarray(self._inner.vectors[rows])
        toks = flat.reshape(len(rows), self.tokens_per_doc, self.token_dim)
        scales = None if self.token_scales is None else np.asarray(self.token_scales[rows])
        mask = (
            np.arange(self.tokens_per_doc)[None, :] < self.lengths[rows][:, None]
        ).astype(np.int32)
        return toks, scales, mask

    def gather(self, rows: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Dequantized f32 token blocks: (tokens (n, Td, d) f32, mask)."""
        toks, scales, mask = self.gather_quantized(rows)
        toks = np.asarray(toks, np.float32)
        if scales is not None:
            toks = toks * scales[..., None]
        return toks, mask
