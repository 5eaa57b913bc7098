"""Dense exact inner-product index — the FAISS ``IndexIDMap(IndexFlatIP)``
replacement (reference `encode_multilingual_corpus.py:367`,
`onepass_dense_run.py:305`).

Composition:

- **storage**: :class:`~codemix_dense_retrieval_tpu.io.shards.ShardStore`
  (bf16 rows + docid sidecars, memory-mappable) instead of ``index.faiss``;
- **device residency**: rows padded & sharded over the mesh's ``shard``
  axis (replaces ``faiss.index_cpu_to_gpu``);
- **search**: the fused bin-max-cover kernel + all-gather merge
  (:mod:`~codemix_dense_retrieval_tpu.parallel.sharded_search`).

The int-id -> docid remap that FAISS's ``IndexIDMap`` provides is a host
numpy docid table lookup over the returned global row ids.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from codemix_dense_retrieval_tpu.io.shards import ShardStore, concat_stores
from codemix_dense_retrieval_tpu.parallel.mesh import make_mesh
from codemix_dense_retrieval_tpu.parallel.sharded_search import (
    _ceil_to,
    shard_rows,
    sharded_topk_ip,
)
from codemix_dense_retrieval_tpu.utils import next_pow2

# module-level jits so repeated online mutations hit the trace cache
# (a fresh jax.jit(lambda) per call would retrace+recompile every time —
# minutes per mutation on remote-compile TPU setups)
_scatter_update = jax.jit(lambda a, p, v: a.at[p].set(v), donate_argnums=0)

# approx="guaranteed" routes straight to exact search when calibration
# measured a certificate rate below this floor at the requested depth: a
# sketch pass that certifies (almost) nothing still pays the full exact
# escalation on top (measured 0.33-0.35x exact live) — worse than exact
# with no compensating benefit.
GUARANTEED_CERT_FLOOR = 0.05
# guaranteed mode routes through the (always-exact) adaptive probed
# cover when calibrate_adaptive measured at least this speedup vs exact
ADAPTIVE_ROUTE_MARGIN = 1.05


def _bucket_scatter(positions: np.ndarray, rows: np.ndarray):
    """Pad a scatter batch to the next power of two so mutation batches of
    varying size reuse compiled programs. Padding repeats entry 0 —
    duplicate indices with IDENTICAL updates are deterministic."""
    m = len(positions)
    bucket = next_pow2(m)
    if bucket == m:
        return positions, rows
    pad = bucket - m
    return (
        np.concatenate([positions, np.repeat(positions[:1], pad)]),
        np.concatenate([rows, np.repeat(rows[:1], pad, axis=0)]),
    )


class DenseFlatIndex:
    """Exact IP index over one or more shard stores.

    Typical lifecycle::

        idx = DenseFlatIndex.from_store(ShardStore.open(path))   # or .build(...)
        idx.to_device(mesh)                  # HBM-resident, row-sharded
        vals, docids = idx.search(qvecs, k=100)
    """

    def __init__(self, store: ShardStore) -> None:
        self.store = store
        self._docids = np.asarray(store.derived_ids, dtype=object)
        self.mesh: Optional[Mesh] = None
        self._docs_dev = None
        self._counts_dev = None
        self._rows_per_shard = 0
        self.search_kwargs = {}
        self._sketch = None  # (sketch_sharded, tails_sharded, proj, kwargs)
        self.last_certified: Optional[np.ndarray] = None
        self.last_adaptive_stats: Optional[dict] = None
        # calibrate_adaptive's remembered operating points (per clamped
        # k): probe depth, measured speedup vs exact, certificate rate.
        # guaranteed mode routes through the adaptive tier when the
        # remembered speedup clears ADAPTIVE_ROUTE_MARGIN (it is exact by
        # construction, so speed is the only criterion).
        self._adaptive_cal = {
            "probe_by_k": {}, "speedup_by_k": {}, "cert_by_k": {},
        }
        self.last_guaranteed_route: Optional[str] = None
        self._mutable = None  # host mirror for online add/remove
        # bumped by every add/remove; consumers that cache row-aligned
        # sidecars (TwoStageSearcher's token store) check it to detect
        # that their row mapping went stale
        self.mutation_epoch = 0
        # ordered (src, dst) row moves of the most recent remove() batch
        self.last_swaps: list = []

    # ---------------- constructors ----------------

    @classmethod
    def from_store(cls, store: ShardStore) -> "DenseFlatIndex":
        return cls(store)

    @classmethod
    def build(
        cls,
        vectors: np.ndarray,
        docids: Sequence[str],
        *,
        dtype: str = "bfloat16",
        lang: Optional[str] = None,
        encoder: Optional[str] = None,
    ) -> "DenseFlatIndex":
        return cls(ShardStore.build(vectors, docids, dtype=dtype, lang=lang, encoder=encoder))

    @classmethod
    def load(cls, directory) -> "DenseFlatIndex":
        return cls(ShardStore.open(directory))

    @classmethod
    def merged(
        cls, indexes: Sequence["DenseFlatIndex"], lang_tags: Optional[Sequence[str]] = None
    ) -> "DenseFlatIndex":
        """Bilingual hub index: concat stores with ``base#lang`` derived ids
        (replaces the reconstruct-merge, `onepass_bilingual_hub.py:292-383`)."""
        return cls(concat_stores([ix.store for ix in indexes], lang_tags))

    # ---------------- properties ----------------

    @property
    def count(self) -> int:
        """Live row count (reflects online add/remove)."""
        if self._mutable is not None:
            return int(self._mutable["counts"].sum())
        return self.store.count

    @property
    def dim(self) -> int:
        return self.store.dim

    @property
    def docids(self) -> np.ndarray:
        """Derived docid per row (``base#lang`` for merged indexes)."""
        return self._docids

    def save(self, directory) -> None:
        self.to_store().save(directory)

    # ---------------- device residency ----------------

    def to_device(
        self,
        mesh: Optional[Mesh] = None,
        *,
        pad_multiple: int = 1024,
        **search_kwargs,
    ) -> "DenseFlatIndex":
        """Upload rows to HBM, sharded over ``mesh``'s ``shard`` axis.

        int8 stores upload int8 rows + the per-row scale sidecar and search
        through the int8 MXU path (half the HBM of bf16)."""
        self.mesh = mesh if mesh is not None else make_mesh()
        vectors = self.store.vectors
        self._docs_dev, self._counts_dev, self._rows_per_shard = shard_rows(
            np.asarray(vectors), self.mesh, pad_multiple=pad_multiple
        )
        self.search_kwargs = search_kwargs
        if self.store.manifest.dtype == "int8" and self.store.scales is not None:
            from codemix_dense_retrieval_tpu.parallel.sharded_search import shard_row_sidecar

            self.search_kwargs = dict(search_kwargs)
            self.search_kwargs["doc_scales"] = shard_row_sidecar(
                self.store.scales, self.mesh, self._rows_per_shard
            )
        return self

    # ---------------- online mutation ----------------
    #
    # FAISS's IndexIDMap supports add_with_ids/remove_ids on a live index;
    # the TPU-native equivalent must mutate STATIC-shaped device arrays.
    # Design: shards are capacity-padded (shard_rows pads to rows_per_shard)
    # and masked by per-shard valid-row COUNTS (already a traced argument,
    # so mutations never retrace the search program). Adds write into pad
    # space; removes SWAP the shard's last valid row into the hole and
    # decrement the count (no tombstones — the count mask stays exact).
    # When pad space runs out the index regrows with amortized headroom.

    def _ensure_mutable(self) -> None:
        if self._docs_dev is None:
            self.to_device()
        if self._mutable is not None:
            return
        s = self.mesh.shape["shard"]
        rps = self._rows_per_shard
        n, d = self.store.count, self.dim
        rows = np.zeros((s * rps, d), np.float32)
        rows[:n] = np.asarray(self.store.vectors, np.float32)
        if self._is_int8():
            # the host mirror holds the DEQUANTIZED f32 values; the device
            # boundary (_scatter_rows / _grow / rebalance) re-quantizes
            # and keeps the per-row scale sidecar in lockstep
            rows[:n] *= np.asarray(self.store.scales, np.float32)[:, None]
        counts = np.clip(n - rps * np.arange(s), 0, rps).astype(np.int64)
        docids = np.empty(s * rps, dtype=object)
        docids[:n] = self._docids[:n]
        self._mutable = {
            "rows": rows,
            "counts": counts,
            "docids": docids,
            "row_of": {str(docids[i]): i for i in range(n)},
        }
        self._docids = docids

    def _refresh_counts(self) -> None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        self._counts_dev = jax.device_put(
            self._mutable["counts"].astype(np.int32),
            NamedSharding(self.mesh, P("shard")),
        )

    def _is_int8(self) -> bool:
        return self.store.manifest.dtype == "int8"

    def _scatter_rows(self, positions: np.ndarray, rows: np.ndarray) -> None:
        """Write ``rows`` at global padded ``positions`` on device (one
        jit scatter; GSPMD routes each row to its shard), updating the
        sketch sidecars in lockstep. int8 indexes re-quantize at this
        boundary and scatter the per-row scale sidecar too (FAISS
        ``add_with_ids`` works regardless of storage). Counts are the
        caller's job (:meth:`_refresh_counts`)."""
        if len(positions) == 0:
            return
        positions, rows = _bucket_scatter(
            np.asarray(positions, np.int64), np.asarray(rows, np.float32)
        )
        pos_dev = jnp.asarray(positions, jnp.int32)
        if self._is_int8():
            from codemix_dense_retrieval_tpu.ops.quant import quantize_rows_np

            q_vals, q_scales = quantize_rows_np(rows)
            vals = jnp.asarray(q_vals)
            self._docs_dev = _scatter_update(self._docs_dev, pos_dev, vals)
            self.search_kwargs["doc_scales"] = _scatter_update(
                self.search_kwargs["doc_scales"], pos_dev,
                jnp.asarray(q_scales),
            )
        else:
            vals = jnp.asarray(rows, self._docs_dev.dtype)
            self._docs_dev = _scatter_update(self._docs_dev, pos_dev, vals)
        if self._sketch is not None:
            from codemix_dense_retrieval_tpu.ops.sketch import sketch_rows_jit

            # the sketch tier bounds the EFFECTIVE rows the kernels rank:
            # dequantized for int8, storage-dtype-rounded for floats
            if self._is_int8():
                eff = jnp.asarray(q_vals.astype(np.float32) * q_scales[:, None])
            else:
                eff = vals.astype(jnp.float32)
            sk, tails, proj, skw = self._sketch
            new_sk, new_tails = sketch_rows_jit(eff, proj)
            sk = _scatter_update(sk, pos_dev, new_sk.astype(sk.dtype))
            tails = _scatter_update(tails, pos_dev, new_tails)
            self._sketch = (sk, tails, proj, skw)

    def _project_sketch(self, proj) -> tuple:
        """(sketch, tails) over the device-resident rows — dequantized
        first for int8 (the sketch bounds the EFFECTIVE corpus the int8
        kernels rank, not the raw codes)."""
        from codemix_dense_retrieval_tpu.ops.sketch import (
            sketch_rows_int8_jit,
            sketch_rows_jit,
        )

        if self._is_int8():
            return sketch_rows_int8_jit(
                self._docs_dev, self.search_kwargs["doc_scales"], proj
            )
        return sketch_rows_jit(self._docs_dev, proj)

    def _upload_mirror(self, rows: np.ndarray, rps: int) -> None:
        """Wholesale device re-upload of the per-shard-laid-out f32 mirror
        (grow/rebalance): int8 indexes re-quantize and rebuild the scale
        sidecar; float indexes cast to the storage dtype."""
        from codemix_dense_retrieval_tpu.parallel.sharded_search import (
            shard_row_sidecar,
        )

        if self._is_int8():
            from codemix_dense_retrieval_tpu.ops.quant import quantize_rows_np

            q_vals, q_scales = quantize_rows_np(rows)
            self._docs_dev, _, _ = shard_rows(
                q_vals, self.mesh, pad_multiple=rps
            )
            self.search_kwargs["doc_scales"] = shard_row_sidecar(
                q_scales, self.mesh, rps
            )
        else:
            self._docs_dev, _, _ = shard_rows(
                rows.astype(self._docs_dev.dtype), self.mesh, pad_multiple=rps
            )

    def _grow(self, extra: int) -> None:
        """Re-shard with amortized headroom (>= 1.5x valid rows + extra)."""
        m = self._mutable
        s = self.mesh.shape["shard"]
        n_valid = self.count
        target = int(1.5 * n_valid) + extra
        new_rps = _ceil_to(max(1, -(-target // s)), 1024)
        rps = self._rows_per_shard
        rows = np.zeros((s * new_rps, self.dim), np.float32)
        docids = np.empty(s * new_rps, dtype=object)
        counts = np.zeros(s, np.int64)
        for sh in range(s):
            c = int(m["counts"][sh])
            rows[sh * new_rps : sh * new_rps + c] = m["rows"][sh * rps : sh * rps + c]
            docids[sh * new_rps : sh * new_rps + c] = m["docids"][
                sh * rps : sh * rps + c
            ]
            counts[sh] = c
        m.update(
            rows=rows, counts=counts, docids=docids,
            row_of={str(docids[i]): i for i in np.flatnonzero(docids != None)},  # noqa: E711
        )
        self._docids = docids
        self._rows_per_shard = new_rps
        sketch_cfg = self._sketch
        # the mirror is already laid out per-shard, so shard_rows slices it
        # 1:1 onto devices; its derived counts are wrong for a padded
        # layout (they assume one contiguous valid prefix) — refresh from
        # the real per-shard counts
        self._upload_mirror(rows, new_rps)
        self._refresh_counts()
        if sketch_cfg is not None:
            # re-project the regrown layout in one shard-local matmul
            _, _, proj, skw = sketch_cfg
            sk, tails = self._project_sketch(proj)
            self._sketch = (sk, tails, proj, skw)

    def add(self, vectors: np.ndarray, docids: Sequence[str]) -> np.ndarray:
        """Add rows to the live index (FAISS ``add_with_ids`` analog).

        New rows fill shard pad space (emptiest shard first, keeping the
        row balance); the index regrows automatically when full.
        Duplicate docids are rejected. Returns the global padded row
        positions assigned (row-aligned sidecar owners — the resident
        token store — mirror their writes there).
        """
        self._ensure_mutable()
        m = self._mutable
        vectors = np.asarray(vectors, np.float32)
        if vectors.ndim == 1:
            vectors = vectors[None]
        docids = [str(x) for x in docids]
        if len(docids) != len(vectors):
            raise ValueError(f"{len(vectors)} rows vs {len(docids)} docids")
        # an in-batch duplicate would overwrite row_of and strand the
        # first copy as an unremovable ghost row
        seen: set = set()
        dup = [x for x in docids if x in seen or seen.add(x)]
        if dup:
            raise ValueError(f"duplicate docids within the batch: {dup[:5]}")
        dup = [x for x in docids if x in m["row_of"]]
        if dup:
            raise ValueError(f"docids already present: {dup[:5]}")
        if vectors.shape[1] != self.dim:
            raise ValueError(f"row dim {vectors.shape[1]} != index dim {self.dim}")
        s = self.mesh.shape["shard"]
        spare = s * self._rows_per_shard - self.count
        if len(vectors) > spare:
            self._grow(len(vectors))
        rps = self._rows_per_shard
        positions = np.empty(len(vectors), np.int64)
        for i in range(len(vectors)):
            sh = min(range(s), key=lambda j: m["counts"][j])  # keep balance
            pos = sh * rps + int(m["counts"][sh])
            positions[i] = pos
            m["counts"][sh] += 1
            m["docids"][pos] = docids[i]
            m["row_of"][docids[i]] = pos
        m["rows"][positions] = vectors
        self.mutation_epoch += 1
        self.last_swaps = []
        # data first, THEN visibility: a search dispatched between the two
        # device writes (callers bypassing SearchService's single-consumer
        # serialization) must never score an unwritten row as valid
        self._scatter_rows(positions, vectors)
        self._refresh_counts()
        return positions

    def remove(self, docids: Sequence[str]) -> int:
        """Remove rows by docid (FAISS ``remove_ids`` analog); returns the
        number actually removed. Unknown docids are ignored (FAISS
        semantics). Each hole is filled by swapping in its shard's last
        valid row, so the count mask stays exact."""
        self._ensure_mutable()
        m = self._mutable
        rps = self._rows_per_shard
        touched = {}
        removed = 0
        # ordered (src, dst) journal of this batch's row moves so
        # row-aligned sidecar owners (the resident token store) can
        # replay the SAME swaps on their arrays
        self.last_swaps = []
        for did in map(str, docids):
            pos = m["row_of"].pop(did, None)
            if pos is None:
                continue
            removed += 1
            sh = pos // rps
            last = sh * rps + int(m["counts"][sh]) - 1
            if pos != last:
                moved = m["docids"][last]
                m["rows"][pos] = m["rows"][last]
                m["docids"][pos] = moved
                m["row_of"][str(moved)] = pos
                touched[pos] = None
                self.last_swaps.append((int(last), int(pos)))
            m["docids"][last] = None
            m["counts"][sh] -= 1
            touched.pop(last, None)  # beyond the count mask now
        if removed:
            self.mutation_epoch += 1
            # mirror of add(): write the swapped-in rows BEFORE shrinking
            # the counts, so an interleaved search can at worst see a
            # still-counted duplicate of a live row — never removed data
            if touched:
                positions = np.fromiter(touched, np.int64)
                self._scatter_rows(positions, m["rows"][positions])
            self._refresh_counts()
        return removed

    def rebalance(self) -> "DenseFlatIndex":
        """Re-spread the live rows evenly across shards. Adds keep the
        balance (emptiest shard first), but a skewed removal pattern can
        concentrate load on some shards; search wall-time follows the
        FULLEST shard, so heavy mutators should rebalance occasionally.
        Row ids change (mutation_epoch bumps)."""
        self._ensure_mutable()
        m = self._mutable
        s = self.mesh.shape["shard"]
        rps = self._rows_per_shard
        valid = np.concatenate([
            np.arange(sh * rps, sh * rps + int(m["counts"][sh]))
            for sh in range(s)
        ])
        n = len(valid)
        per = -(-n // s) if n else 0
        rows = np.zeros_like(m["rows"])
        docids = np.empty(len(m["docids"]), dtype=object)
        counts = np.zeros(s, np.int64)
        for sh in range(s):
            chunk = valid[sh * per : (sh + 1) * per]
            rows[sh * rps : sh * rps + len(chunk)] = m["rows"][chunk]
            docids[sh * rps : sh * rps + len(chunk)] = m["docids"][chunk]
            counts[sh] = len(chunk)
        m.update(
            rows=rows, counts=counts, docids=docids,
            row_of={
                str(docids[i]): i
                for i in np.flatnonzero(docids != None)  # noqa: E711
            },
        )
        self._docids = docids
        self.mutation_epoch += 1
        self._refresh_counts()
        # wholesale re-upload (the layout changed everywhere)
        self._upload_mirror(rows, rps)
        if self._sketch is not None:
            _, _, proj, skw = self._sketch
            sk, tails = self._project_sketch(proj)
            self._sketch = (sk, tails, proj, skw)
        return self

    def reorder_rows(
        self, *, sketch_dim: int = 64, sample: int = 131072
    ) -> np.ndarray:
        """Cluster-pack rows so sketch-space neighbors share bins
        (:func:`~codemix_dense_retrieval_tpu.ops.sketch.cluster_bisect_order`)
        — the TPU-native FAISS-IVF analog where the clustering IS the row
        order. Search results are unchanged (exactness never depends on
        row order), but the probed/sketch tiers concentrate each query's
        top-k into fewer bins, so ``approx="adaptive"`` certificates fire
        and approx recall at a given probe jumps. Row ids change
        (``mutation_epoch`` bumps — row-aligned sidecar consumers must
        re-derive). Returns the applied permutation ``perm``
        (``new_rows == old_rows[perm]``).
        """
        from codemix_dense_retrieval_tpu.ops.sketch import (
            cluster_bisect_order,
            fit_sketch,
        )

        store = self.to_store()
        vecs = np.asarray(store.vectors)
        if store.manifest.dtype == "int8":
            eff = vecs.astype(np.float32) * np.asarray(store.scales, np.float32)[:, None]
        else:
            eff = vecs.astype(np.float32, copy=False)
        if self._sketch is not None:
            proj = np.asarray(self._sketch[2], np.float32)
        else:
            proj = fit_sketch(eff, min(sketch_dim, self.dim), sample=sample)
        n = len(eff)
        sk = np.empty((n, proj.shape[1]), np.float32)
        for lo in range(0, n, 1_000_000):  # bound peak host memory
            sk[lo : lo + 1_000_000] = eff[lo : lo + 1_000_000] @ proj
        perm = cluster_bisect_order(sk)
        del sk
        # int8: rebuild from the dequantized rows — quantize∘dequantize is
        # an exact round-trip (the mutation mirror relies on the same)
        new_vecs = eff[perm] if store.manifest.dtype == "int8" else vecs[perm]
        self.store = ShardStore.build(
            new_vecs,
            [str(store.docids[i]) for i in perm],
            dtype=store.manifest.dtype,
            lang=store.manifest.lang,
            encoder=store.manifest.encoder,
            normalized=store.manifest.normalized,
            derived_ids=(
                [str(store.derived_ids[i]) for i in perm]
                if store.derived_ids is not store.docids
                else None
            ),
        )
        self._docids = np.asarray(self.store.derived_ids, dtype=object)
        self._mutable = None
        self.last_swaps = []
        self.mutation_epoch += 1
        if self._docs_dev is not None:
            kwargs = {
                kk: vv for kk, vv in self.search_kwargs.items()
                if kk != "doc_scales"  # to_device re-derives it
            }
            sketch_cfg = self._sketch
            self.to_device(self.mesh, **kwargs)
            if sketch_cfg is not None:
                _, _, sproj, skw = sketch_cfg
                sk2, tails = self._project_sketch(sproj)
                self._sketch = (sk2, tails, sproj, skw)
        return perm

    def to_store(self) -> ShardStore:
        """Materialize the live (possibly mutated) rows as a ShardStore —
        the persistence path for mutated indexes (``save()`` uses it)."""
        if self._mutable is None:
            return self.store
        m = self._mutable
        rps = self._rows_per_shard
        s = self.mesh.shape["shard"]
        parts, ids = [], []
        for sh in range(s):
            c = int(m["counts"][sh])
            parts.append(m["rows"][sh * rps : sh * rps + c])
            ids.extend(m["docids"][sh * rps : sh * rps + c])
        return ShardStore.build(
            np.concatenate(parts) if parts else np.empty((0, self.dim), np.float32),
            [str(x) for x in ids],
            dtype=self.store.manifest.dtype,
            lang=self.store.manifest.lang,
            encoder=self.store.manifest.encoder,
        )

    def enable_sketch(
        self,
        sketch_dim: int = 128,
        *,
        sample: int = 131072,
        expand: float = 4.0,
        probe_bins: Optional[int] = None,
        cache: bool = True,
    ) -> "DenseFlatIndex":
        """Build the approximate tier: fit a PCA sketch on a row sample
        (host), project rows + tail bounds on-device (shard-local matmul),
        and arm ``search(..., approx=True)``. See
        :mod:`~codemix_dense_retrieval_tpu.ops.sketch`.

        ``cache=True`` persists the fitted projection (and any later
        :meth:`calibrate_sketch` operating points) as ``sketch.npz`` in
        the index directory, so serving restarts skip the refit and keep
        their calibration. The cache is ignored when the stored
        dim/count no longer match."""
        from codemix_dense_retrieval_tpu.ops.sketch import fit_sketch

        if self._docs_dev is None:
            self.to_device()
        # int8 indexes sketch their EFFECTIVE corpus — the dequantized
        # rows the int8 kernels rank — so certificates prove parity with
        # the int8 exact path (ops.sketch.topk_ip_sketch_int8)
        is_int8 = self._is_int8()
        sketch_dim = min(sketch_dim, self.dim)
        proj_np, probe_by_k, cert_by_k = None, {}, {}
        cache_path = (self.store.dir / "sketch.npz") if (cache and self.store.dir) else None
        if cache_path is not None and cache_path.exists():
            # adaptive operating points load independently of the proj
            # check (they do not depend on sketch_dim)
            self.load_adaptive_calibration()
            try:
                z = np.load(cache_path, allow_pickle=False)
                if (
                    z["proj"].shape == (self.dim, sketch_dim)
                    and int(z["count"]) == self.store.count
                ):
                    proj_np = np.asarray(z["proj"], np.float32)
                    probe_by_k = {
                        int(pk): int(pv)
                        for pk, pv in zip(z["probe_ks"], z["probe_vals"])
                    }
                    if "cert_ks" in z.files:
                        cert_by_k = {
                            int(ck): float(cv)
                            for ck, cv in zip(z["cert_ks"], z["cert_vals"])
                        }
            except Exception:  # corrupt/truncated cache: refit, don't brick
                from codemix_dense_retrieval_tpu.utils.logging import get_logger

                get_logger("index").warning(
                    "ignoring unreadable sketch cache %s (refitting)", cache_path
                )
        if proj_np is None:
            # strided row sample so merged (per-language-grouped) stores
            # contribute uniformly, not just the first language's block
            vecs = self.store.vectors
            stride = max(1, len(vecs) // max(sample, 1))
            sample_rows = np.asarray(vecs[::stride][:sample], np.float32)
            if is_int8:
                sample_rows = sample_rows * np.asarray(
                    self.store.scales[::stride][:sample], np.float32
                )[:, None]
            proj_np = fit_sketch(sample_rows, sketch_dim, sample=sample)
        proj = jnp.asarray(proj_np)
        sk, tails = self._project_sketch(proj)
        self._sketch = (
            sk, tails, proj,
            {
                "expand": expand, "probe_bins": probe_bins,
                "probe_by_k": probe_by_k, "cert_by_k": cert_by_k,
                "cache_path": cache_path,
            },
        )
        if cache_path is not None:
            self._save_sketch_cache()
        return self

    def _save_sketch_cache(self) -> None:
        import os

        _, _, proj, skw = self._sketch
        if skw.get("cache_path") is None:
            return
        probe_by_k = skw["probe_by_k"]
        cert_by_k = skw.get("cert_by_k", {})
        # temp + atomic replace: a torn sketch.npz would brick restarts
        # (.npz-suffixed temp name so np.savez doesn't append another)
        acal = self._adaptive_cal
        a_ks = sorted(acal["probe_by_k"])
        tmp = skw["cache_path"].with_name(skw["cache_path"].stem + ".tmp.npz")
        np.savez(
            tmp,
            proj=np.asarray(proj, np.float32),
            count=np.int64(self.store.count),
            probe_ks=np.asarray(sorted(probe_by_k), np.int64),
            probe_vals=np.asarray(
                [probe_by_k[pk] for pk in sorted(probe_by_k)], np.int64
            ),
            cert_ks=np.asarray(sorted(cert_by_k), np.int64),
            cert_vals=np.asarray(
                [cert_by_k[ck] for ck in sorted(cert_by_k)], np.float32
            ),
            # adaptive-tier operating points (calibrate_adaptive)
            a_ks=np.asarray(a_ks, np.int64),
            a_probe_vals=np.asarray(
                [acal["probe_by_k"][ak] for ak in a_ks], np.int64
            ),
            a_speedup_vals=np.asarray(
                [acal["speedup_by_k"].get(ak, 0.0) for ak in a_ks], np.float32
            ),
            a_cert_vals=np.asarray(
                [acal["cert_by_k"].get(ak, 0.0) for ak in a_ks], np.float32
            ),
        )
        os.replace(tmp, skw["cache_path"])

    def load_adaptive_calibration(self) -> bool:
        """Load :meth:`calibrate_adaptive` operating points persisted in
        this index dir's ``sketch.npz`` WITHOUT building a sketch sidecar
        (the adaptive tier needs none — ``serve --approx adaptive``).
        Returns True when points were loaded."""
        if not self.store.dir:
            return False
        p = self.store.dir / "sketch.npz"
        if not p.exists():
            return False
        try:
            z = np.load(p, allow_pickle=False)
            if int(z["count"]) != self.store.count or "a_ks" not in z.files:
                return False
            for ak, pv, sv, cv in zip(
                z["a_ks"], z["a_probe_vals"],
                z["a_speedup_vals"], z["a_cert_vals"],
            ):
                self._adaptive_cal["probe_by_k"][int(ak)] = int(pv)
                self._adaptive_cal["speedup_by_k"][int(ak)] = float(sv)
                self._adaptive_cal["cert_by_k"][int(ak)] = float(cv)
            return True
        except Exception:
            return False

    def _save_adaptive_cal(self) -> None:
        """Persist the adaptive operating points. With a sketch armed
        they ride the full sketch cache; otherwise an adaptive-only
        ``sketch.npz`` (count + a_* keys) is written — enable_sketch
        treats it as a proj miss and refits, re-merging these points."""
        if self._sketch is not None and self._sketch[3].get("cache_path"):
            self._save_sketch_cache()
            return
        if not self.store.dir:
            return
        import os

        path = self.store.dir / "sketch.npz"
        extra = {}
        if path.exists():  # preserve any existing keys (proj, probe_ks…)
            try:
                z = np.load(path, allow_pickle=False)
                extra = {
                    kk: np.asarray(z[kk]) for kk in z.files
                    if not kk.startswith("a_") and kk != "count"
                }
            except Exception:
                extra = {}
        acal = self._adaptive_cal
        a_ks = sorted(acal["probe_by_k"])
        tmp = path.with_name(path.stem + ".tmp.npz")
        np.savez(
            tmp,
            count=np.int64(self.store.count),
            a_ks=np.asarray(a_ks, np.int64),
            a_probe_vals=np.asarray(
                [acal["probe_by_k"][ak] for ak in a_ks], np.int64
            ),
            a_speedup_vals=np.asarray(
                [acal["speedup_by_k"].get(ak, 0.0) for ak in a_ks], np.float32
            ),
            a_cert_vals=np.asarray(
                [acal["cert_by_k"].get(ak, 0.0) for ak in a_ks], np.float32
            ),
            **extra,
        )
        os.replace(tmp, path)

    def _sketch_kernel_kwargs(self) -> dict:
        """Subset of ``to_device(**search_kwargs)`` that the sketch path
        understands — keeps tuned kernel constants consistent between the
        exact and approx branches."""
        from codemix_dense_retrieval_tpu.ops.sketch import SKETCH_KERNEL_KWARGS

        return {
            kk: vv
            for kk, vv in self.search_kwargs.items()
            if kk in SKETCH_KERNEL_KWARGS
        }

    def calibrate_sketch(
        self,
        queries: Union[np.ndarray, jnp.ndarray],
        k: int,
        *,
        recall_target: float = 0.99,
        max_probe_factor: int = 64,
        refine_steps: int = 3,
    ) -> dict:
        """Pick the minimal ``probe_bins`` hitting ``recall_target`` at
        depth ``k``, measured against this index's own exact search on the
        given sample queries — the FAISS ``ParameterSpace`` operating-
        point analog, run on the REAL data rather than a model. The
        calibrated value is remembered per ``k`` and used by subsequent
        ``search(..., approx=True)`` calls.

        The doubling sweep overshoots by up to 2x (a live run landed at
        probe=416 with recall 1.0 where the target was 0.99); up to
        ``refine_steps`` binary-search trials between the last failing
        and first passing probe tighten the production operating point —
        each trial costs one compile, each probe bin saved speeds up
        every subsequent approx search.

        Returns ``{"probe_bins", "recall", "certified_frac"}``.
        """
        if self._sketch is None:
            self.enable_sketch()
        skw = self._sketch[3]
        # search() clamps k and keys probe_by_k by the CLAMPED value —
        # calibrate with the same depth or the swept probe is never applied
        k = min(k, self.count, self._rows_per_shard)
        bin_size = self._sketch_kernel_kwargs().get("bin_size")
        if bin_size is None:
            from codemix_dense_retrieval_tpu.ops.sketch import DEFAULT_BIN_SIZE

            bin_size = DEFAULT_BIN_SIZE
        _, exact_ids = self.search(queries, k, return_docids=False)
        min_bins = -(-k // bin_size)
        max_bins = self._rows_per_shard // bin_size

        def recall_at(probe: int) -> float:
            skw["probe_by_k"][k] = probe
            _, ids = self.search(queries, k, return_docids=False, approx=True)
            hits = [
                len(set(ids[q]) & set(exact_ids[q])) / ids.shape[1]
                for q in range(len(ids))
            ]
            return float(np.mean(hits))

        probe = None
        recall = 0.0
        factor = 2
        while factor <= max_probe_factor:
            probe = min(min_bins * factor, max_bins)
            recall = recall_at(probe)
            if recall >= recall_target or probe >= max_bins:
                break
            factor *= 2
        if recall >= recall_target and factor > 2:
            # binary refine inside (last failing probe, first passing]
            lo = min(min_bins * (factor // 2), max_bins)
            hi = probe
            for _ in range(max(0, refine_steps)):
                mid = (lo + hi) // 2
                if mid <= lo or mid >= hi:
                    break
                r = recall_at(mid)
                if r >= recall_target:
                    hi, probe, recall = mid, mid, r
                else:
                    lo = mid
        # final pass at the chosen probe: restores last_certified for the
        # certified_frac report and warms the production compile
        if skw["probe_by_k"][k] != probe:
            recall = recall_at(probe)
        skw["probe_by_k"][k] = probe
        cert_frac = float(np.mean(self.last_certified))
        # remembered so approx="guaranteed" can skip a provably useless
        # sketch pass on this workload (see search)
        skw.setdefault("cert_by_k", {})[k] = cert_frac
        self._save_sketch_cache()
        return {
            "probe_bins": probe,
            "recall": recall,
            "certified_frac": cert_frac,
        }

    def calibrate_adaptive(
        self,
        queries: Union[np.ndarray, jnp.ndarray],
        k: int,
        *,
        max_probe_factor: int = 64,
        iters: int = 2,
    ) -> Optional[dict]:
        """Pick the FASTEST measured probe depth for
        ``search(approx="adaptive")`` at depth ``k`` on sample queries.

        Unlike :meth:`calibrate_sketch` there is no recall target: the
        adaptive tier is exact by construction (uncertified queries
        escalate on the retained scores), so probe depth only trades
        probe cost against escalation cost and wall time IS the
        objective. Doubling sweep over probe depths, keeping the global
        best; stops once everything certifies (deeper probes can only
        cost more). Remembers ``probe_by_k`` (used by subsequent adaptive
        searches), the measured ``speedup`` vs this index's exact path,
        and the certificate rate; ``search(approx="guaranteed")`` routes
        through the adaptive tier when the remembered speedup clears
        ``ADAPTIVE_ROUTE_MARGIN``. Persisted with the sketch cache when
        one is armed. Returns ``None`` on int8 stores (adaptive falls
        back to exact there)."""
        if self._docs_dev is None:
            self.to_device()
        if self._is_int8():
            return None
        k = min(k, self.count, self._rows_per_shard)
        from codemix_dense_retrieval_tpu.ops.sketch import DEFAULT_BIN_SIZE

        bin_size = self._sketch_kernel_kwargs().get("bin_size", DEFAULT_BIN_SIZE)
        min_bins = -(-k // bin_size)
        max_bins = self._rows_per_shard // bin_size

        def timed(fn):
            fn()  # compile/warm
            ts = []
            for _ in range(max(1, iters)):
                t0 = time.perf_counter()
                fn()
                ts.append(time.perf_counter() - t0)
            ts.sort()
            return ts[len(ts) // 2]

        t_exact = timed(
            lambda: self.search(queries, k, return_docids=False)
        )
        best = None  # (t, probe, cert)
        factor = 1
        while factor <= max_probe_factor:
            probe = min(min_bins * factor, max_bins)
            t = timed(lambda: self.search(
                queries, k, return_docids=False, approx="adaptive",
                probe_bins=probe,
            ))
            cert = float(self.last_adaptive_stats["certified_frac"])
            if best is None or t < best[0]:
                best = (t, probe, cert)
            if cert >= 0.999 or probe >= max_bins or t > 2.0 * best[0]:
                break
            factor *= 2
        t_best, probe, cert = best
        speedup = t_exact / t_best
        self._adaptive_cal["probe_by_k"][k] = probe
        self._adaptive_cal["speedup_by_k"][k] = speedup
        self._adaptive_cal["cert_by_k"][k] = cert
        self._save_adaptive_cal()
        return {
            "probe_bins": probe,
            "speedup": speedup,
            "certified_frac": cert,
            "exact_s": t_exact,
            "adaptive_s": t_best,
        }

    # ---------------- search ----------------

    def search(
        self,
        queries: Union[np.ndarray, jnp.ndarray],
        k: int,
        *,
        return_docids: bool = True,
        query_block: int = 0,
        approx: Union[bool, str] = False,
        probe_bins: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k. Returns (scores (B,k) f32, docids (B,k) object) —
        or raw global row ids with ``return_docids=False``.

        ``query_block``: process queries in fixed-size jit-friendly blocks
        (0 = one dispatch). Matches the reference's ``--qblock`` batching
        (`onepass_dense_mix_run_custom_lang.py:875-886`).

        ``approx=True`` searches through the sketch tier (call
        :meth:`enable_sketch` first, or defaults are used): faster,
        approximate, with per-query exactness certificates left in
        ``self.last_certified`` (bool (B,): True rows are provably
        identical to exact search). ``approx="guaranteed"`` additionally
        re-runs the UNCERTIFIED queries through exact search, so results
        are always exact — faster than plain exact search whenever the
        certificate rate is high. If :meth:`calibrate_sketch` measured a
        certificate rate below ``GUARANTEED_CERT_FLOOR`` at this depth,
        guaranteed mode skips the sketch pass and runs exact directly
        (``last_guaranteed_direct`` reports which route ran).
        ``approx="adaptive"`` runs the probed-exact cover with true
        bin-max certificates + escalation tail — ALWAYS exact, priced at
        the probe when certificates fire (a row-order property: see
        :meth:`reorder_rows`); per-call stats in
        ``self.last_adaptive_stats``.

        ``probe_bins`` overrides the probe depth of the ``"adaptive"``
        and sketch tiers for this call (the FAISS ``nprobe`` analog; for
        clustered data size it to cover a topical cluster,
        ``~rows_per_cluster / bin_size``). ``None`` keeps the calibrated/
        default resolution.
        """
        if self._docs_dev is None:
            self.to_device()
        q = np.asarray(queries, dtype=np.float32)
        if q.ndim == 1:
            q = q[None]
        if q.shape[1] != self.dim:
            # dim-mismatch rejection (reference `onepass_dense_run.py:46-53`)
            raise ValueError(
                f"query dim {q.shape[1]} != index dim {self.dim} "
                f"(encoder/index mismatch)"
            )
        # FAISS clamps k to ntotal implicitly (returns -1 ids past it);
        # here k is clamped to what the sharded kernel can return — warn so
        # small/heavily-sharded indexes don't silently shrink a k=500 run
        k_eff = min(k, self.count, self._rows_per_shard)
        if k_eff < k:
            from codemix_dense_retrieval_tpu.utils.logging import get_logger

            get_logger("index").warning(
                "search k=%d clamped to %d (count=%d, rows_per_shard=%d)",
                k, k_eff, self.count, self._rows_per_shard,
            )
        k = k_eff
        # the ragged tail block is zero-PADDED to the block size (results
        # sliced back below): a distinct tail shape would retrace and
        # recompile the whole sharded program per remainder size
        n_q = len(q)
        tail_pad = 0
        if query_block and n_q % query_block and n_q > query_block:
            tail_pad = query_block - (n_q % query_block)
            q = np.concatenate([q, np.zeros((tail_pad, q.shape[1]), q.dtype)])
        blocks = [q] if not query_block else [
            q[i : i + query_block] for i in range(0, len(q), query_block)
        ]
        dtype = self._docs_dev.dtype
        if dtype == jnp.int8:
            dtype = jnp.float32  # int8 path quantizes queries on-device
        # dispatch every block before materializing any result: JAX's async
        # dispatch then overlaps host work (upload of block i+1, TREC
        # formatting upstream) with device search of block i
        guaranteed_direct = False
        adaptive_fallback = False
        if approx == "adaptive":
            # probed-exact cover with TRUE bin-max certificates +
            # escalation tail — ALWAYS exact, adaptively priced
            # (parallel.sharded_topk_ip_adaptive). Certificate rate is a
            # row-order property: call reorder_rows() first. int8 stores
            # fall back to the exact fixed cover (same results).
            if self._docs_dev.dtype == jnp.int8:
                # the exact results ARE trivially certified: keep the
                # adaptive caller contract (all-True last_certified, so
                # e.g. adaptive serving emits the same {hits, certified}
                # response schema as on a float index)
                approx = False
                adaptive_fallback = True
                self.last_adaptive_stats = None
            else:
                from codemix_dense_retrieval_tpu.parallel.sharded_search import (
                    sharded_topk_ip_adaptive,
                )

                if probe_bins is None:  # calibrated operating point
                    probe_bins = self._adaptive_cal["probe_by_k"].get(k)
                outs = [
                    sharded_topk_ip_adaptive(
                        jnp.asarray(blk, dtype),
                        self._docs_dev,
                        self._counts_dev,
                        k,
                        mesh=self.mesh,
                        probe_bins=probe_bins,
                        **{
                            kk: vv
                            for kk, vv in self.search_kwargs.items()
                            if kk in ("bin_size", "super_size", "tile_n", "tile_b")
                        },
                    )
                    for blk in blocks
                ]
                vals = np.concatenate([o[0] for o in outs], axis=0)[:n_q]
                gids = np.concatenate([o[1] for o in outs], axis=0)[:n_q]
                # adaptive results are exact by construction
                self.last_certified = np.ones(n_q, bool)
                self.last_adaptive_stats = {
                    "certified_frac": float(
                        np.mean([o[2]["certified_frac"] for o in outs])
                    ),
                    "escalated": int(
                        sum(o[2].get("escalated", 0) for o in outs)
                    ),
                    "probe_bins": outs[0][2]["probe_bins"],
                }
                self.last_guaranteed_direct = False
                self.last_guaranteed_route = None
                if not return_docids:
                    return vals, gids
                return vals, self._docids[gids]
        if approx:
            if approx not in (True, "guaranteed"):
                raise ValueError(
                    f"approx must be True/False/'adaptive'/'guaranteed', got {approx!r}"
                )
            if approx == "guaranteed":
                # the adaptive probed cover is exact BY CONSTRUCTION, so
                # when calibrate_adaptive measured it faster than the
                # exact fixed cover on this workload, it IS the best
                # guaranteed route — no sketch pass, no escalation risk
                sp = self._adaptive_cal["speedup_by_k"].get(k)
                if (
                    sp is not None
                    and sp >= ADAPTIVE_ROUTE_MARGIN
                    and self._docs_dev.dtype != jnp.int8
                ):
                    from codemix_dense_retrieval_tpu.utils.logging import get_logger

                    get_logger("index").info(
                        "guaranteed search k=%d: routing through the "
                        "adaptive tier (calibrated speedup %.2fx)", k, sp,
                    )
                    out = self.search(
                        queries, k, return_docids=return_docids,
                        query_block=query_block, approx="adaptive",
                        probe_bins=probe_bins,
                    )
                    self.last_guaranteed_route = "adaptive"
                    self.last_guaranteed_direct = False
                    return out
            if self._sketch is None:
                self.enable_sketch()
            if approx == "guaranteed":
                # calibration measured (and persisted) the certificate
                # rate at this depth: when essentially nothing certifies,
                # guaranteed mode would pay the sketch pass AND a full
                # exact escalation (~0.35x exact, measured live) — route
                # straight to exact instead; the guarantee holds trivially
                cr = self._sketch[3].get("cert_by_k", {}).get(k)
                if cr is not None and cr < GUARANTEED_CERT_FLOOR:
                    from codemix_dense_retrieval_tpu.utils.logging import get_logger

                    get_logger("index").info(
                        "guaranteed search k=%d: calibrated certificate "
                        "rate %.3f < %.2f — using exact path directly",
                        k, cr, GUARANTEED_CERT_FLOOR,
                    )
                    approx = False
                    guaranteed_direct = True
        if approx:
            sk, tails, proj, skw = self._sketch
            from codemix_dense_retrieval_tpu.parallel.sharded_search import (
                sharded_topk_ip_sketch,
            )

            probe = (
                probe_bins
                if probe_bins is not None
                else skw["probe_by_k"].get(k, skw["probe_bins"])
            )
            pending = [
                sharded_topk_ip_sketch(
                    jnp.asarray(blk, dtype),
                    self._docs_dev,
                    self._counts_dev,
                    sk,
                    tails,
                    proj,
                    k,
                    mesh=self.mesh,
                    probe_bins=probe,
                    expand=skw["expand"],
                    doc_scales=self.search_kwargs.get("doc_scales"),
                    **self._sketch_kernel_kwargs(),
                )
                for blk in blocks
            ]
            self.last_certified = np.concatenate(
                [np.asarray(c) for _, _, c in pending]
            )[:n_q]
        else:
            pending = [
                sharded_topk_ip(
                    jnp.asarray(blk, dtype),
                    self._docs_dev,
                    self._counts_dev,
                    k,
                    mesh=self.mesh,
                    **self.search_kwargs,
                )
                for blk in blocks
            ]
            self.last_certified = None
        vals = np.concatenate([np.asarray(p[0]) for p in pending], axis=0)[:n_q]
        gids = np.concatenate([np.asarray(p[1]) for p in pending], axis=0)[:n_q]
        self.last_guaranteed_direct = guaranteed_direct
        self.last_guaranteed_route = (
            "exact" if guaranteed_direct
            else ("sketch" if approx == "guaranteed" else None)
        )
        if guaranteed_direct or adaptive_fallback:
            # exact results ARE the guarantee; keep the caller contract
            # that guaranteed/adaptive modes leave an all-True
            # certificate vector
            self.last_certified = np.ones(n_q, bool)
        if approx == "guaranteed" and not self.last_certified.all():
            # escalate ONLY the uncertified queries through exact search,
            # bucketed to a power of two (each distinct batch shape is a
            # fresh compile) — results become provably exact
            bad = np.flatnonzero(~self.last_certified)
            from codemix_dense_retrieval_tpu.utils import next_pow2 as _np2

            bucket = _np2(len(bad))
            sub = np.zeros((bucket, q.shape[1]), np.float32)
            sub[: len(bad)] = q[bad]
            ev, eg = sharded_topk_ip(
                jnp.asarray(sub, dtype),
                self._docs_dev,
                self._counts_dev,
                k,
                mesh=self.mesh,
                **self.search_kwargs,
            )
            vals[bad] = np.asarray(ev)[: len(bad)]
            gids[bad] = np.asarray(eg)[: len(bad)]
            self.last_certified = np.ones(n_q, bool)
        if not return_docids:
            return vals, gids
        return vals, self._docids[gids]
