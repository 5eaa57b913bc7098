"""Embedding shard store — the on-disk index format.

Replaces FAISS ``write_index``/``read_index``/``reconstruct`` (reference
`encode_multilingual_corpus.py:469-471`, merge-by-reconstruct at
`onepass_bilingual_mix_hub_custom_lang.py:296-332`) with a memory-mappable
raw layout; "merging" per-language indexes into a bilingual one becomes
manifest concatenation — no vector reconstruction.

Directory layout (per language, mirroring the reference's
``<index_root>/<lang>/`` contract, `encode_multilingual_corpus.py:467-500`):

    <dir>/manifest.json   {"dim", "dtype", "count", "files": [{"name","rows"}...],
                           "lang", "encoder", "normalized", ...}
    <dir>/emb.00000.bin   raw row-major embeddings (bf16 by default)
    <dir>/docids.txt      base docid per row (row order == vector order)
    <dir>/docid_map.tsv   int_id \t derived_id \t base_id \t lang  (reference parity)

Vectors are stored row-aligned with no header: ``np.memmap`` views them
zero-copy; device upload slices straight out of the map.
"""

from __future__ import annotations

import dataclasses
import json
import os
import pathlib
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import ml_dtypes
import numpy as np

PathLike = os.PathLike | str

_DTYPES = {
    "bfloat16": np.dtype(ml_dtypes.bfloat16),
    "float32": np.dtype(np.float32),
    "float16": np.dtype(np.float16),
    "int8": np.dtype(np.int8),
}


def storage_dtype(name: str) -> np.dtype:
    if name not in _DTYPES:
        raise ValueError(f"unsupported storage dtype {name!r} (use {sorted(_DTYPES)})")
    return _DTYPES[name]


@dataclass
class ShardManifest:
    dim: int
    dtype: str
    count: int
    files: List[Dict]
    lang: Optional[str] = None
    encoder: Optional[str] = None
    normalized: bool = True
    extra: Dict = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "ShardManifest":
        d = json.loads(text)
        return cls(**{k: d[k] for k in ("dim", "dtype", "count", "files")},
                   lang=d.get("lang"), encoder=d.get("encoder"),
                   normalized=d.get("normalized", True), extra=d.get("extra", {}))


class ShardWriter:
    """Streaming writer with per-append durability.

    ``append`` buffers to the current bin file immediately (flushed), so a
    crash loses only unfinalized state — ``finalize`` writes the manifest
    last, making completion atomic-by-artifact (the resume semantics the
    reference gets from per-language FAISS checkpoints,
    `encode_multilingual_corpus.py:130-161`).
    """

    def __init__(
        self,
        out_dir: PathLike,
        dim: int,
        dtype: str = "bfloat16",
        *,
        lang: Optional[str] = None,
        encoder: Optional[str] = None,
        normalized: bool = True,
        rows_per_file: int = 1_000_000,
    ) -> None:
        self.dir = pathlib.Path(out_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.dim = dim
        self.dtype_name = dtype
        self.np_dtype = storage_dtype(dtype)
        self.lang = lang
        self.encoder = encoder
        self.normalized = normalized
        self.rows_per_file = rows_per_file
        self.count = 0
        self.files: List[Dict] = []
        self._docids: List[str] = []
        self._derived: List[str] = []
        self._fh = None
        self._rows_in_file = 0

    @classmethod
    def resume_partial(cls, out_dir: PathLike, dim: int, dtype: str = "bfloat16", **kw):
        """Reopen an UNFINALIZED shard directory, positioned after the rows
        already written (mid-language crash recovery — finer checkpoint
        granularity than the reference's per-language FAISS writes,
        `encode_multilingual_corpus.py:467-471`).

        Returns (writer, already_written_docids). Rows whose docids are in
        the partial sidecar must not be appended again.
        """
        w = cls(out_dir, dim, dtype, **kw)
        partial = w.dir / "docids.partial.txt"
        existing: List[str] = []
        if partial.exists():
            existing = [l for l in partial.read_text(encoding="utf-8").splitlines() if l]
        row_bytes = w.np_dtype.itemsize * dim
        total_rows = 0
        idx = 0
        while True:
            path = w.dir / f"emb.{idx:05d}.bin"
            if not path.exists():
                break
            rows = path.stat().st_size // row_bytes
            # truncate a torn trailing row from a mid-write crash
            if path.stat().st_size % row_bytes:
                with open(path, "r+b") as fh:
                    fh.truncate(rows * row_bytes)
            w.files.append({"name": path.name, "rows": rows})
            total_rows += rows
            idx += 1
        # reconcile: the sidecars are appended before the vector flush, so
        # they may run ahead by one batch after a crash; trust the vector
        # count and truncate both the docid sidecar and (for int8) the
        # per-row scale sidecar to match, or the finalized shard fails
        # ShardStore.open's scales/count alignment check
        existing = existing[:total_rows]
        scales_path = w.dir / "scales.bin"
        if w.dtype_name == "int8" and scales_path.exists():
            want = total_rows * np.dtype(np.float32).itemsize
            if scales_path.stat().st_size > want:
                with open(scales_path, "r+b") as fh:
                    fh.truncate(want)
            elif scales_path.stat().st_size < want:
                raise ValueError(
                    f"scales.bin has fewer rows than the vectors in {w.dir} "
                    "(corrupt partial shard)"
                )
        if total_rows and w.files:
            last = w.files[-1]
            w._fh = open(w.dir / last["name"], "ab")
            w._rows_in_file = last["rows"]
            w.files = w.files
        w.count = total_rows
        w._docids = list(existing)
        w._derived = [f"{d}#{w.lang}" if w.lang else d for d in existing]
        return w, set(existing)

    def _open_new_file(self):
        name = f"emb.{len(self.files):05d}.bin"
        self.files.append({"name": name, "rows": 0})
        self._fh = open(self.dir / name, "wb")
        self._rows_in_file = 0

    def append(
        self,
        vecs: np.ndarray,
        docids: Sequence[str],
        derived_ids: Optional[Sequence[str]] = None,
    ) -> None:
        assert vecs.ndim == 2 and vecs.shape[1] == self.dim, vecs.shape
        assert len(docids) == len(vecs)
        # durable docid sidecar first, then vectors (resume_partial trusts
        # the vector count and truncates the sidecar to match)
        with open(self.dir / "docids.partial.txt", "a", encoding="utf-8") as fh:
            fh.write("".join(f"{d}\n" for d in docids))
        if self.dtype_name == "int8" and vecs.dtype != np.int8:
            # symmetric per-row quantization; scales go to a f32 sidecar
            from codemix_dense_retrieval_tpu.ops.quant import quantize_rows_np

            vecs, scales = quantize_rows_np(vecs)
            with open(self.dir / "scales.bin", "ab") as fh:
                fh.write(np.ascontiguousarray(scales, np.float32).tobytes())
        vecs = np.ascontiguousarray(vecs).astype(self.np_dtype, copy=False)
        pos = 0
        while pos < len(vecs):
            if self._fh is None or self._rows_in_file >= self.rows_per_file:
                if self._fh is not None:
                    self._fh.close()
                self._open_new_file()
            take = min(len(vecs) - pos, self.rows_per_file - self._rows_in_file)
            self._fh.write(vecs[pos : pos + take].tobytes())
            self._rows_in_file += take
            self.files[-1]["rows"] = self._rows_in_file
            pos += take
        self._fh.flush()
        self._docids.extend(str(d) for d in docids)
        if derived_ids is not None:
            self._derived.extend(str(d) for d in derived_ids)
        else:
            self._derived.extend(str(d) for d in docids)
        self.count += len(vecs)

    def finalize(self, extra: Optional[Dict] = None) -> ShardManifest:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
        (self.dir / "docids.txt").write_text("\n".join(self._docids), encoding="utf-8")
        with open(self.dir / "docid_map.tsv", "w", encoding="utf-8") as fh:
            print("int_id\tderived_id\tbase_id\tlang", file=fh)
            for i, (derived, base) in enumerate(zip(self._derived, self._docids)):
                print(f"{i}\t{derived}\t{base}\t{self.lang or ''}", file=fh)
        manifest = ShardManifest(
            dim=self.dim,
            dtype=self.dtype_name,
            count=self.count,
            files=self.files,
            lang=self.lang,
            encoder=self.encoder,
            normalized=self.normalized,
            extra=extra or {},
        )
        tmp = self.dir / "manifest.json.tmp"
        tmp.write_text(manifest.to_json(), encoding="utf-8")
        tmp.replace(self.dir / "manifest.json")
        partial = self.dir / "docids.partial.txt"
        if partial.exists():
            partial.unlink()
        return manifest


class ShardStore:
    """Reader over a finalized shard directory (or an in-memory build)."""

    def __init__(
        self,
        manifest: ShardManifest,
        vectors: np.ndarray,
        docids: List[str],
        derived_ids: Optional[List[str]] = None,
        directory: Optional[pathlib.Path] = None,
        scales: Optional[np.ndarray] = None,
    ) -> None:
        self.manifest = manifest
        self.vectors = vectors  # (count, dim), possibly a memmap-backed view
        self.docids = docids
        self.derived_ids = derived_ids if derived_ids is not None else docids
        self.dir = directory
        self.scales = scales  # per-row f32 scales (int8 storage only)

    @property
    def count(self) -> int:
        return self.manifest.count

    @property
    def dim(self) -> int:
        return self.manifest.dim

    @classmethod
    def exists(cls, directory: PathLike) -> bool:
        return (pathlib.Path(directory) / "manifest.json").exists()

    @classmethod
    def open(
        cls, directory: PathLike, *, mmap: bool = True, concat_parts: bool = True
    ) -> "ShardStore":
        """``concat_parts=False`` skips materializing a multi-file store
        into one in-RAM array (np.concatenate reads every page):
        ``vectors`` is then None and the caller must gather through its
        own per-file views (TokenShardStore does — a corpus-scale token
        store is ~16 KB/row and must stay on disk)."""
        d = pathlib.Path(directory)
        manifest = ShardManifest.from_json((d / "manifest.json").read_text())
        dtype = storage_dtype(manifest.dtype)
        parts = []
        for f in manifest.files:
            rows = f["rows"]
            if mmap:
                arr = np.memmap(d / f["name"], dtype=dtype, mode="r", shape=(rows, manifest.dim))
            else:
                arr = np.fromfile(d / f["name"], dtype=dtype).reshape(rows, manifest.dim)
            parts.append(arr)
        if len(parts) == 1:
            vectors = parts[0]
        elif concat_parts:
            vectors = np.concatenate([np.asarray(p) for p in parts], axis=0)
        else:
            vectors = None
        n_stored = sum(p.shape[0] for p in parts)
        if n_stored != manifest.count:
            raise ValueError(
                f"manifest count {manifest.count} != stored rows {n_stored} in {d}"
            )
        docids = (d / "docids.txt").read_text(encoding="utf-8").splitlines()
        derived: Optional[List[str]] = None
        map_path = d / "docid_map.tsv"
        if map_path.exists():
            derived = []
            with open(map_path, encoding="utf-8") as fh:
                next(fh)  # header
                for line in fh:
                    parts_ = line.rstrip("\n").split("\t")
                    if len(parts_) >= 2:
                        derived.append(parts_[1])
        scales = None
        if manifest.dtype == "int8" and (d / "scales.bin").exists():
            scales = np.fromfile(d / "scales.bin", dtype=np.float32)
            if scales.shape[0] != manifest.count:
                raise ValueError(
                    f"scales count {scales.shape[0]} != manifest count {manifest.count} in {d}"
                )
        return cls(manifest, vectors, docids, derived, directory=d, scales=scales)

    @classmethod
    def build(
        cls,
        vectors: np.ndarray,
        docids: Sequence[str],
        *,
        dtype: str = "bfloat16",
        lang: Optional[str] = None,
        encoder: Optional[str] = None,
        normalized: bool = True,
        derived_ids: Optional[Sequence[str]] = None,
    ) -> "ShardStore":
        """In-memory store (no directory)."""
        scales = None
        if dtype == "int8" and np.asarray(vectors).dtype != np.int8:
            from codemix_dense_retrieval_tpu.ops.quant import quantize_rows_np

            vectors, scales = quantize_rows_np(np.asarray(vectors))
        vectors = np.ascontiguousarray(vectors).astype(storage_dtype(dtype), copy=False)
        manifest = ShardManifest(
            dim=vectors.shape[1], dtype=dtype, count=vectors.shape[0], files=[],
            lang=lang, encoder=encoder, normalized=normalized,
        )
        return cls(manifest, vectors, list(map(str, docids)),
                   list(map(str, derived_ids)) if derived_ids is not None else None,
                   scales=scales)

    def save(self, directory: PathLike, rows_per_file: int = 1_000_000) -> "ShardStore":
        w = ShardWriter(
            directory, self.dim, self.manifest.dtype, lang=self.manifest.lang,
            encoder=self.manifest.encoder, normalized=self.manifest.normalized,
            rows_per_file=rows_per_file,
        )
        step = max(1, min(rows_per_file, 262_144))
        for start in range(0, self.count, step):
            stop = min(start + step, self.count)
            w.append(
                np.asarray(self.vectors[start:stop]),
                self.docids[start:stop],
                self.derived_ids[start:stop],
            )
        if self.manifest.dtype == "int8" and self.scales is not None:
            # vectors were already int8, so append() skipped the scale
            # sidecar — write it wholesale
            np.ascontiguousarray(self.scales, np.float32).tofile(
                pathlib.Path(directory) / "scales.bin"
            )
        w.finalize(extra=self.manifest.extra)
        return ShardStore.open(directory)


def concat_stores(
    stores: Sequence[ShardStore],
    lang_tags: Optional[Sequence[str]] = None,
) -> ShardStore:
    """Bilingual/combined 'merge': concatenation of shard stores with
    derived ids ``base#lang`` (replaces the reference's batched
    ``reconstruct`` merge, `onepass_bilingual_hub.py:292-383`)."""
    assert stores
    dim = stores[0].dim
    dtype = stores[0].manifest.dtype
    for s in stores[1:]:
        if s.dim != dim:
            raise ValueError(f"dim mismatch {s.dim} != {dim}")
    if lang_tags is None:
        lang_tags = [s.manifest.lang or str(i) for i, s in enumerate(stores)]
    vectors = np.concatenate([np.asarray(s.vectors) for s in stores], axis=0)
    docids: List[str] = []
    derived: List[str] = []
    for s, tag in zip(stores, lang_tags):
        docids.extend(s.docids)
        derived.extend(f"{d}#{tag}" for d in s.docids)
    manifest = ShardManifest(
        dim=dim, dtype=dtype, count=len(docids), files=[],
        lang="+".join(lang_tags),
        encoder=stores[0].manifest.encoder,
        normalized=all(s.manifest.normalized for s in stores),
    )
    scales = None
    if dtype == "int8" and all(s.scales is not None for s in stores):
        scales = np.concatenate([s.scales for s in stores])
    return ShardStore(manifest, vectors, docids, derived, scales=scales)
