"""Two-stage multi-vector serving: dense recall -> MaxSim rerank.

The corpus-scale late-interaction path the reference does not have (it
serves BGE-M3's dense CLS head only, `onepass_dense_run.py:94-143`);
BGE-M3's colbert head makes this the natural beyond-parity extension:

    1. dense stage — exact top-``k_dense`` over the flat index
       (`index/flat.py`, bin-max-cover kernel, sharded + batched);
    2. gather — the candidates' token blocks are fancy-indexed out of the
       memory-mapped :class:`TokenShardStore` (touches only candidate
       pages, never the full token matrix: 1.1M docs x 16 KB stays on
       disk, a 100-candidate gather moves ~1.6 MB/query);
    3. rerank — int8 blocks + per-token scales ship to the device, are
       dequantized to bf16 in-graph, and scored by the chunked MaxSim
       Pallas kernel (`ops/maxsim.py`); ties break to the lower global
       row id (FAISS convention, same as the dense stage).

Stage 1 dispatches all query blocks before stage 2 materializes any of
them, so the host gather of block i overlaps the device search of block
i+1 (the same async-dispatch overlap the dense path uses,
`index/flat.py:167-186`).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from codemix_dense_retrieval_tpu.index.flat import DenseFlatIndex
from codemix_dense_retrieval_tpu.io.token_shards import TokenShardStore
from codemix_dense_retrieval_tpu.ops.maxsim import maxsim_rerank

# module-level jit (one trace cache across mutations): replay a batch of
# row moves, chains already resolved host-side to pre-batch sources
_move_rows = jax.jit(lambda a, s, d: a.at[d].set(a[s]), donate_argnums=0)


@functools.partial(jax.jit, static_argnames=("k", "use_pallas", "interpret"))
def _rerank_block_unique(
    q_tokens: jnp.ndarray,  # (B, Tq, d) f32
    q_mask: jnp.ndarray,  # (B, Tq)
    u_tokens: jnp.ndarray,  # (Upad, Td, d) unique candidate blocks
    u_scales: Optional[jnp.ndarray],  # (Upad, Td) or None
    u_mask: jnp.ndarray,  # (Upad, Td)
    inv: jnp.ndarray,  # (B, K) int32 -> row in the unique set
    cand_ids: jnp.ndarray,  # (B, K) global row ids
    *,
    k: int,
    use_pallas: bool,
    interpret: Optional[bool],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rerank with HOST-DEDUPED candidates: queries in a block share hot
    documents, so only the unique token blocks cross host->device (the
    dominant serving cost on remote-attached TPUs: a 100 MB candidate
    transfer costs ~2.6 s through the relay while the equivalent device
    row-gather costs 31 ms — BENCH_NOTES round 2). Dequantize the unique
    rows once, then expand on-device."""
    if u_scales is not None:
        u = (u_tokens.astype(jnp.float32) * u_scales[..., None]).astype(jnp.bfloat16)
    else:
        u = u_tokens
    b, kb = inv.shape
    d_tokens = jnp.take(u, inv.reshape(-1), axis=0).reshape(b, kb, *u.shape[1:])
    d_mask = jnp.take(u_mask, inv.reshape(-1), axis=0).reshape(b, kb, -1)
    scores, ids = maxsim_rerank(
        q_tokens, q_mask, d_tokens, d_mask, cand_ids, use_pallas=use_pallas,
        interpret=interpret,
    )
    return scores[:, :k], ids[:, :k]


@functools.partial(jax.jit, static_argnames=("k", "use_pallas", "interpret"))
def _rerank_block_resident(
    q_tokens: jnp.ndarray,  # (B, Tq, d) f32
    q_mask: jnp.ndarray,  # (B, Tq)
    tok_dev: jnp.ndarray,  # (count, Td, d) HBM-resident token blocks
    scales_dev: Optional[jnp.ndarray],  # (count, Td) f32 or None
    lengths_dev: jnp.ndarray,  # (count,) int32
    cand_ids: jnp.ndarray,  # (B, K) global row ids
    *,
    k: int,
    use_pallas: bool,
    interpret: Optional[bool],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rerank against a DEVICE-RESIDENT token store: the candidate gather
    is a row gather in HBM (contiguous Td*d-byte slices at device
    bandwidth) instead of a host memmap gather + PCIe/relay transfer —
    the dominant serving cost of the host path (VERDICT r2 item 3).
    ``tok_dev`` must be passed as an ARGUMENT (a captured array would be
    baked into the HLO as a multi-GB constant)."""
    b, kb = cand_ids.shape
    flat = cand_ids.reshape(-1)
    d_tok = jnp.take(tok_dev, flat, axis=0)
    if scales_dev is not None:
        sc = jnp.take(scales_dev, flat, axis=0)
        d_tok = (d_tok.astype(jnp.float32) * sc[..., None]).astype(jnp.bfloat16)
    td = tok_dev.shape[1]
    lens = jnp.take(lengths_dev, flat)
    mask = (
        lax.broadcasted_iota(jnp.int32, (flat.shape[0], td), 1)
        < lens[:, None]
    ).astype(jnp.int32)
    scores, ids = maxsim_rerank(
        q_tokens, q_mask,
        d_tok.reshape(b, kb, td, -1), mask.reshape(b, kb, td), cand_ids,
        use_pallas=use_pallas, interpret=interpret,
    )
    return scores[:, :k], ids[:, :k]


@functools.partial(jax.jit, static_argnames=("k", "use_pallas", "interpret"))
def _rerank_block(
    q_tokens: jnp.ndarray,  # (B, Tq, d) f32
    q_mask: jnp.ndarray,  # (B, Tq)
    d_tokens: jnp.ndarray,  # (B, K, Td, d) int8 | bf16 | f32
    d_scales: Optional[jnp.ndarray],  # (B, K, Td) f32 per-token, or None
    d_mask: jnp.ndarray,  # (B, K, Td)
    cand_ids: jnp.ndarray,  # (B, K) global row ids
    *,
    k: int,
    use_pallas: bool,
    interpret: Optional[bool],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if d_scales is not None:
        # in-graph dequant: int8 rides the PCIe/DMA at 1 byte/elem, bf16
        # keeps the kernel's HBM reads at half of f32
        d_tokens = (d_tokens.astype(jnp.float32) * d_scales[..., None]).astype(
            jnp.bfloat16
        )
    scores, ids = maxsim_rerank(
        q_tokens, q_mask, d_tokens, d_mask, cand_ids, use_pallas=use_pallas,
        interpret=interpret,
    )
    return scores[:, :k], ids[:, :k]


def _check_row_alignment(index: DenseFlatIndex, token_store: TokenShardStore) -> None:
    """Fail fast when the token store's rows are not the index's rows:
    the rerank gathers token blocks BY ROW ID, so any docid/row-order
    drift between the two artifacts silently scores the wrong blocks
    (advisor r2). Full check up to 64k rows, deterministic 1k-row sample
    beyond that (the corpus pipeline writes both in one pass, so drift
    means a rebuilt/foreign artifact — a sample catches reorderings)."""
    idx_ids = getattr(index.store, "docids", None)
    tok_ids = token_store.docids
    if idx_ids is None or tok_ids is None:
        return
    n = len(tok_ids)
    if n <= 65536:
        rows = range(n)
    else:
        step = max(1, n // 1024)
        rows = sorted({0, n - 1, *range(0, n, step)})
    for r in rows:
        if idx_ids[r] != tok_ids[r]:
            raise ValueError(
                f"token store row {r} is docid {tok_ids[r]!r} but the index "
                f"has {idx_ids[r]!r} — row orders desynced (rebuild the "
                f"token store from the same encode pass as the index)"
            )


class TwoStageSearcher:
    """Dense recall + MaxSim rerank over a (index, token store) pair.

    The store and index must describe the same corpus in the same row
    order (both are written by the encode pipeline in corpus order).
    """

    def __init__(
        self,
        index: DenseFlatIndex,
        token_store: TokenShardStore,
        *,
        use_pallas: bool = True,
        interpret: Optional[bool] = None,
        dedupe: bool = True,
        device_resident: Optional[bool] = None,
        device_budget_bytes: int = 6 << 30,
        approx=False,
    ) -> None:
        if index.count != token_store.count:
            raise ValueError(
                f"index count {index.count} != token store count "
                f"{token_store.count} (not the same corpus?)"
            )
        # a mutated index's row ids no longer map to token-store rows;
        # mutations must flow through THIS searcher's add/remove (which
        # mirror them onto the resident token arrays)
        self._index_epoch = getattr(index, "mutation_epoch", 0)
        if self._index_epoch:
            raise ValueError(
                "dense index was mutated (add/remove) before this "
                "TwoStageSearcher was built — its row ids no longer align "
                "with the token store; rebuild both from the same corpus"
            )
        _check_row_alignment(index, token_store)
        self.index = index
        self.tokens = token_store
        self.use_pallas = use_pallas
        self.interpret = interpret
        # ship only UNIQUE candidate blocks per query block (queries share
        # hot documents); identical results, much less host->device volume
        self.dedupe = dedupe
        # sketch-tier dense stage (True / "guaranteed"): MaxSim reorders
        # the candidate pool anyway, so 'fast' approximation in stage 1
        # only perturbs the pool's tail — and 'guaranteed' doesn't even that
        self.approx = approx
        # effective depths of the most recent search() (k_dense may clamp)
        self.last_depths: dict = {}
        # serving contract: anything behind SearchService exposes count
        self.count = index.count
        # HBM-resident token store (VERDICT r2 item 3): when the int8
        # blocks (+ scales + lengths) fit the budget, upload ONCE and
        # gather candidates on-device by row id — the per-query host
        # gather + host->device transfer disappears. None = auto by size;
        # the memmap path remains for stores beyond the budget.
        if device_resident is None:
            device_resident = self._store_bytes() <= device_budget_bytes
        elif device_resident and self._store_bytes() > device_budget_bytes:
            raise ValueError(
                f"token store needs {self._store_bytes() / 2**30:.1f} GiB "
                f"on device but the budget is "
                f"{device_budget_bytes / 2**30:.1f} GiB"
            )
        self.device_resident = bool(device_resident)
        self._tok_dev = None
        self._scales_dev = None
        self._lengths_dev = None
        if self.device_resident:
            self._upload_store()

    def _store_bytes(self) -> int:
        ts = self.tokens
        n, td = ts.count, ts.tokens_per_doc
        from codemix_dense_retrieval_tpu.io.shards import storage_dtype

        itemsize = storage_dtype(ts.dtype).itemsize
        total = n * td * ts.token_dim * itemsize + n * 4  # blocks + lengths
        if ts.token_scales is not None:
            total += n * td * 4  # per-token scales
        return total

    def _upload_store(self) -> None:
        ts = self.tokens
        # chunked host read keeps peak host RSS at one chunk above the
        # final array; one device_put ships the assembled store
        from codemix_dense_retrieval_tpu.io.shards import storage_dtype

        n = ts.count
        toks = np.empty(
            (n, ts.tokens_per_doc, ts.token_dim), storage_dtype(ts.dtype)
        )
        scales = (
            None if ts.token_scales is None
            else np.empty((n, ts.tokens_per_doc), np.float32)
        )
        chunk = 65536
        for start in range(0, n, chunk):
            rows = np.arange(start, min(start + chunk, n))
            t, s, _ = ts.gather_quantized(rows)
            toks[start : start + len(rows)] = t
            if scales is not None:
                scales[start : start + len(rows)] = s
        self._tok_dev = jnp.asarray(toks)
        self._scales_dev = None if scales is None else jnp.asarray(scales)
        self._lengths_dev = jnp.asarray(
            np.asarray(ts.lengths, np.int32)
        )

    def save(self, directory) -> None:
        """Persist the live two-stage corpus: the dense index under
        ``directory`` and the token store under ``directory/tokens``
        (the encode-corpus layout). Mutated device-resident token
        arrays are gathered back to host in the dense side's live row
        order; int8 blocks round-trip losslessly (dequantize ->
        re-quantize reproduces the same codes and scales)."""
        import pathlib

        from codemix_dense_retrieval_tpu.io.token_shards import TokenShardWriter

        directory = pathlib.Path(directory)
        self.index.save(directory)
        ts = self.tokens
        if self._index_epoch == 0 or not self.device_resident:
            # unmutated: stream the original store through a writer
            w = TokenShardWriter(
                directory / "tokens", token_dim=ts.token_dim,
                tokens_per_doc=ts.tokens_per_doc, dtype=ts.dtype,
            )
            chunk = 65536
            ids = list(self.index.docids[: ts.count])
            all_lens = np.asarray(ts.lengths, np.int32)
            for start in range(0, ts.count, chunk):
                rows = np.arange(start, min(start + chunk, ts.count))
                blocks, _ = ts.gather(rows)
                w.append(
                    blocks, all_lens[rows],
                    [str(x) for x in ids[start : start + len(rows)]],
                )
            w.finalize()
            return
        # mutated: the dense mirror defines the live row order
        m = self.index._mutable
        rps = self.index._rows_per_shard
        shards = self.index.mesh.shape["shard"]
        w = TokenShardWriter(
            directory / "tokens", token_dim=ts.token_dim,
            tokens_per_doc=ts.tokens_per_doc, dtype=ts.dtype,
        )
        tok_host = np.asarray(self._tok_dev)
        scales_host = (
            None if self._scales_dev is None else np.asarray(self._scales_dev)
        )
        lens_host = np.asarray(self._lengths_dev)
        for sh in range(shards):
            c = int(m["counts"][sh])
            if not c:
                continue
            rows = slice(sh * rps, sh * rps + c)
            blocks = tok_host[rows].astype(np.float32)
            if scales_host is not None:  # dequantize for the writer
                blocks = blocks * scales_host[rows][..., None]
            w.append(
                blocks, lens_host[rows],
                [str(x) for x in m["docids"][rows]],
            )
        w.finalize()

    # ---------------- online mutation (device-resident store) ----------
    #
    # The memmap token store is read-only, so two-stage mutation is
    # DEVICE-RESIDENT only: token blocks live in HBM padded to the dense
    # index's capacity layout, adds scatter new blocks at the positions
    # the dense add assigned, and removes replay the dense side's
    # swap-delete journal (index.last_swaps) so both stay row-aligned.

    def _mutation_capacity(self) -> int:
        if not self.device_resident:
            raise ValueError(
                "two-stage mutation requires the device-resident token "
                "store (the memmap store is read-only); construct with "
                "device_resident=True"
            )
        idx = self.index
        if idx._docs_dev is None:
            idx.to_device()
        cap = idx.mesh.shape["shard"] * idx._rows_per_shard
        if self._tok_dev.shape[0] < cap:
            pad = cap - self._tok_dev.shape[0]
            self._tok_dev = jnp.pad(
                self._tok_dev, ((0, pad), (0, 0), (0, 0))
            )
            if self._scales_dev is not None:
                self._scales_dev = jnp.pad(
                    self._scales_dev, ((0, pad), (0, 0)), constant_values=1.0
                )
            self._lengths_dev = jnp.pad(self._lengths_dev, (0, pad))
        return cap

    def add(
        self,
        vectors: np.ndarray,
        docids,
        token_embs: np.ndarray,  # (n, T, token_dim)
        lengths,
    ) -> np.ndarray:
        """Two-stage ``add_with_ids``: dense rows + token blocks land at
        the same padded positions. Raises (before mutating anything) if
        the add would regrow the dense index — the resident token layout
        cannot follow a re-shard; build with capacity headroom."""
        from codemix_dense_retrieval_tpu.index.flat import (
            _bucket_scatter,
            _scatter_update,
        )
        from codemix_dense_retrieval_tpu.io.token_shards import (
            _quantize_tokens_np,
        )

        cap = self._mutation_capacity()
        vectors = np.asarray(vectors, np.float32)
        if len(vectors) > cap - self.index.count:
            raise ValueError(
                f"add of {len(vectors)} rows would regrow the dense index "
                f"(spare capacity {cap - self.index.count}); rebuild the "
                "searcher over a roomier index instead"
            )
        token_embs = np.asarray(token_embs)
        n, t, d = token_embs.shape
        if d != self.tokens.token_dim:
            raise ValueError(
                f"token dim {d} != store token_dim {self.tokens.token_dim}"
            )
        td = self.tokens.tokens_per_doc
        lengths = np.minimum(np.asarray(lengths, np.int32), min(t, td))
        block = np.zeros((n, td, d), np.float32)
        keep = min(t, td)
        block[:, :keep] = token_embs[:, :keep].astype(np.float32)
        block *= (np.arange(td)[None, :] < lengths[:, None])[..., None]
        positions = self.index.add(vectors, docids)
        if self._scales_dev is not None:
            q, scales = _quantize_tokens_np(block)
            pos_b, q = _bucket_scatter(positions, q)
            _, scales = _bucket_scatter(positions, scales)
            self._scales_dev = _scatter_update(
                self._scales_dev, jnp.asarray(pos_b, jnp.int32),
                jnp.asarray(scales),
            )
            blocks_dev = jnp.asarray(q)
        else:
            pos_b, block = _bucket_scatter(positions, block)
            blocks_dev = jnp.asarray(block, self._tok_dev.dtype)
        pos_dev = jnp.asarray(pos_b, jnp.int32)
        self._tok_dev = _scatter_update(self._tok_dev, pos_dev, blocks_dev)
        _, lens_b = _bucket_scatter(positions, lengths)
        self._lengths_dev = _scatter_update(
            self._lengths_dev, pos_dev, jnp.asarray(lens_b, jnp.int32)
        )
        self.count = self.index.count
        self._index_epoch = self.index.mutation_epoch
        return positions

    def remove(self, docids) -> int:
        """Two-stage ``remove_ids``: the dense side swap-deletes; its
        (src, dst) journal replays on the resident token arrays, with
        swap CHAINS resolved to pre-batch sources so one gather+scatter
        reproduces the sequential semantics."""
        from codemix_dense_retrieval_tpu.index.flat import _bucket_scatter

        self._mutation_capacity()
        removed = self.index.remove(docids)
        if removed and self.index.last_swaps:
            origin: dict = {}
            for src, dst in self.index.last_swaps:
                origin[dst] = origin.get(src, src)
            dsts = np.fromiter(origin.keys(), np.int64)
            srcs = np.asarray([origin[int(dv)] for dv in dsts], np.int64)
            srcs, dsts = _bucket_scatter(srcs, dsts)  # pow2-bucket the count
            s_dev = jnp.asarray(srcs, jnp.int32)
            d_dev = jnp.asarray(dsts, jnp.int32)
            self._tok_dev = _move_rows(self._tok_dev, s_dev, d_dev)
            if self._scales_dev is not None:
                self._scales_dev = _move_rows(self._scales_dev, s_dev, d_dev)
            self._lengths_dev = _move_rows(self._lengths_dev, s_dev, d_dev)
        if removed:
            self.count = self.index.count
            self._index_epoch = self.index.mutation_epoch
        return removed

    def search(
        self,
        q_vecs: np.ndarray,  # (B, dim) dense query embeddings
        q_tokens: np.ndarray,  # (B, Tq, token_dim) query token embeddings
        q_lengths: np.ndarray,  # (B,) valid query tokens
        k: int,
        *,
        k_dense: Optional[int] = None,
        query_block: int = 0,
        return_docids: bool = True,
        probe_bins: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-``k`` by MaxSim among the dense stage's top-``k_dense``
        (default ``max(4*k, 100)`` — ColBERTv2's rerank-depth convention).
        Returns (scores (B, k) f32, docids object / global row ids)."""
        if getattr(self.index, "mutation_epoch", 0) != self._index_epoch:
            raise ValueError(
                "dense index mutated since this TwoStageSearcher was "
                "built — dense row ids would score the WRONG token "
                "blocks; rebuild the searcher (token-store mutation is "
                "not supported)"
            )
        if k_dense is None:
            k_dense = max(4 * k, 100)
        k_dense = max(k_dense, k)
        q_tokens = np.asarray(q_tokens, np.float32)
        b, tq, _ = q_tokens.shape
        q_mask = (np.arange(tq)[None, :] < np.asarray(q_lengths)[:, None]).astype(
            np.int32
        )
        _, gids = self.index.search(
            q_vecs, k_dense, return_docids=False, query_block=query_block,
            approx=self.approx, probe_bins=probe_bins,
        )
        k_got = gids.shape[1]  # index may clamp k_dense on tiny corpora
        if k_got < k_dense:
            import logging

            logging.getLogger(__name__).warning(
                "rerank k_dense=%d clamped to %d by the dense index "
                "(count=%d); final k=%d -> %d",
                k_dense, k_got, self.index.count, k, min(k, k_got),
            )
        # surfaced in run meta by the runners (mirrors flat.py's clamp warn)
        self.last_depths = {
            "k_requested": int(k), "k_effective": int(min(k, k_got)),
            "k_dense_requested": int(k_dense), "k_dense_effective": int(k_got),
        }
        k = min(k, k_got)
        blocks = [np.arange(b)] if not query_block else [
            np.arange(i, min(i + query_block, b)) for i in range(0, b, query_block)
        ]

        if self.device_resident:
            # no host gather at all: candidates are row-gathered in HBM
            pending = [
                _rerank_block_resident(
                    jnp.asarray(q_tokens[rows]),
                    jnp.asarray(q_mask[rows]),
                    self._tok_dev,
                    self._scales_dev,
                    self._lengths_dev,
                    jnp.asarray(gids[rows], dtype=jnp.int32),
                    k=k, use_pallas=self.use_pallas, interpret=self.interpret,
                )
                for rows in blocks
            ]
            scores = np.concatenate([np.asarray(s) for s, _ in pending], axis=0)
            ids = np.concatenate([np.asarray(i) for _, i in pending], axis=0)
            if not return_docids:
                return scores, ids
            return scores, self.index.docids[ids]

        # the memmap gather of block i+1 runs on a prefetch thread while
        # the main thread dispatches the rerank of block i (dispatch
        # blocks on the axon relay, so async dispatch alone cannot hide
        # the host gather — same pattern as TextEncoder._batch_inputs)
        def gather(rows):
            sub = gids[rows]
            kb = sub.shape[1]
            if self.dedupe:
                uniq, inv = np.unique(sub, return_inverse=True)
                # pad the unique axis to a bucket so jit shapes are stable
                # (4096-row buckets: <=16% worst-case slop, vs up to ~2x
                # for power-of-two buckets)
                upad = -(-len(uniq) // 4096) * 4096
            # low duplication makes dedupe pure overhead — the comparison
            # must use the PADDED size: for small/remainder blocks the
            # 4096-row bucket can ship more bytes than the direct layout
            # (advisor r2)
            if self.dedupe and upad <= 0.9 * sub.size:
                toks, scales, mask = self.tokens.gather_quantized(uniq)
                pad = upad - len(uniq)
                if pad:
                    toks = np.concatenate(
                        [toks, np.zeros((pad, *toks.shape[1:]), toks.dtype)]
                    )
                    mask = np.concatenate([mask, np.zeros((pad, mask.shape[1]), mask.dtype)])
                    if scales is not None:
                        scales = np.concatenate(
                            [scales, np.ones((pad, scales.shape[1]), scales.dtype)]
                        )
                return (
                    rows, sub, toks, scales, mask,
                    inv.reshape(sub.shape).astype(np.int32),
                )
            toks, scales, mask = self.tokens.gather_quantized(sub.ravel())
            return (
                rows, sub,
                toks.reshape(len(rows), kb, *toks.shape[1:]),
                None if scales is None else scales.reshape(len(rows), kb, -1),
                mask.reshape(len(rows), kb, -1),
                None,
            )

        import itertools
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        pending = []
        block_it = iter(blocks)
        with ThreadPoolExecutor(max_workers=1) as ex:
            futs = deque(ex.submit(gather, r) for r in itertools.islice(block_it, 2))
            while futs:
                rows, sub, toks, scales, mask, inv = futs.popleft().result()
                nxt = next(block_it, None)
                if nxt is not None:
                    futs.append(ex.submit(gather, nxt))
                common = dict(
                    k=k, use_pallas=self.use_pallas, interpret=self.interpret
                )
                if inv is not None:
                    pending.append(
                        _rerank_block_unique(
                            jnp.asarray(q_tokens[rows]),
                            jnp.asarray(q_mask[rows]),
                            jnp.asarray(toks),
                            None if scales is None else jnp.asarray(scales),
                            jnp.asarray(mask),
                            jnp.asarray(inv),
                            jnp.asarray(sub, dtype=jnp.int32),
                            **common,
                        )
                    )
                else:
                    pending.append(
                        _rerank_block(
                            jnp.asarray(q_tokens[rows]),
                            jnp.asarray(q_mask[rows]),
                            jnp.asarray(toks),
                            None if scales is None else jnp.asarray(scales),
                            jnp.asarray(mask),
                            jnp.asarray(sub, dtype=jnp.int32),
                            **common,
                        )
                    )
        scores = np.concatenate([np.asarray(s) for s, _ in pending], axis=0)
        ids = np.concatenate([np.asarray(i) for _, i in pending], axis=0)
        if not return_docids:
            return scores, ids
        return scores, self.index.docids[ids]


def _write_run_meta(path, tag, n_queries, depths) -> None:
    """Per-run meta with the EFFECTIVE search depths (the dense index may
    clamp ``k_dense`` on small corpora) — mirrors the reference's per-set
    ``meta.json`` (`onepass_bilingual_hub.py:613-640`)."""
    import json

    with open(path, "w", encoding="utf-8") as f:
        json.dump({"tag": tag, "n_queries": int(n_queries), **(depths or {})},
                  f, indent=2)


def _encode_or_load_queries(encoder, set_name, qids, texts, batch_size,
                            cache_root, log):
    """Query (dense, token) encode with an optional on-disk token cache —
    the two-stage analog of the reference's ``.npz`` query cache
    (`onepass_dense_mix_run_custom_lang.py:196-235`)."""
    import pathlib

    cache_path = (
        pathlib.Path(cache_root) / f"{set_name}.npz" if cache_root else None
    )
    if cache_path is not None and cache_path.exists():
        from codemix_dense_retrieval_tpu.pipeline.query_cache import (
            QueryCacheMismatch,
            load_query_token_cache,
        )

        try:
            _, qvecs, qtoks, qlens = load_query_token_cache(
                cache_path, expected_qids=qids
            )
            return qvecs, qtoks, qlens
        except QueryCacheMismatch:
            log.warning("stale query token cache %s; re-encoding", cache_path)
    qvecs = encoder.encode_queries(texts, batch_size=batch_size)
    qtoks, qlens = encoder.encode_queries_tokens(texts, batch_size=batch_size)
    if cache_path is not None:
        from codemix_dense_retrieval_tpu.pipeline.query_cache import (
            save_query_token_cache,
        )

        save_query_token_cache(cache_path, qids, qvecs, qtoks, qlens)
    return qvecs, qtoks, qlens


def run_two_stage_bilingual(
    indexes,  # per-language DenseFlatIndex (device-resident)
    token_stores,  # matching per-language TokenShardStore
    encoder,
    query_sets,
    outdir,
    *,
    k: int = 500,
    k_dense: Optional[int] = None,
    batch_size: int = 64,
    query_block: int = 256,
    tag: str = "bilingual-twostage",
    max_queries: int = 0,
    cache_root=None,
):
    """Two-stage search over a bilingual hub, compositionally: each
    language's (index, token store) pair is searched two-stage at depth
    ``k``, the per-language results merge by (score desc, lang order, row
    id) — the same tie order a concatenated hub index would give (lower
    global row id = language order then row). Dense recall runs per
    language at full ``k_dense`` depth, a superset of what a concat-hub
    recall would allot each language, so merged results are never worse
    than the concat formulation. Then ``docid#lang`` collapses to base
    docids by max score
    (`io/trec.py collapse_run_max`, reference
    `onepass_bilingual_hub.py:123-138`). Writes ``<set>_raw.trec`` and
    ``<set>_base.trec`` per set like the dense hub runner."""
    import pathlib

    from codemix_dense_retrieval_tpu.io.trec import collapse_run_max, write_run
    from codemix_dense_retrieval_tpu.utils.logging import get_logger

    log = get_logger("rerank")
    outdir = pathlib.Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    searchers = [
        TwoStageSearcher(ix, ts) for ix, ts in zip(indexes, token_stores)
    ]
    out = {}
    for set_name, rows in query_sets.items():
        if max_queries:
            rows = rows[:max_queries]
        qids = [q for q, _ in rows]
        texts = [t for _, t in rows]
        # queries are shared across the hub's languages, so ONE token
        # cache serves both sides (advisor r2: --query_cache was silently
        # ignored on the bilingual path)
        qvecs, qtoks, qlens = _encode_or_load_queries(
            encoder, set_name, qids, texts, batch_size, cache_root, log
        )
        per_lang = []
        for li, s in enumerate(searchers):
            sc, ids = s.search(
                qvecs, qtoks, qlens, k, k_dense=k_dense,
                query_block=query_block, return_docids=False,
            )
            per_lang.append((sc, ids, li))
        b = len(qids)
        # merge: concat along candidates, sort by (-score, lang, row)
        sc = np.concatenate([p[0] for p in per_lang], axis=1)
        ids = np.concatenate([p[1] for p in per_lang], axis=1)
        lang = np.concatenate(
            [np.full_like(p[1], p[2]) for p in per_lang], axis=1
        )
        order = np.lexsort((ids, lang, -sc), axis=1)[:, :k]
        top_sc = np.take_along_axis(sc, order, axis=1)
        top_docids = np.empty((b, order.shape[1]), dtype=object)
        lang_sel = np.take_along_axis(lang, order, axis=1)
        rows_sel = np.take_along_axis(ids, order, axis=1)
        for li, s in enumerate(searchers):
            sel = lang_sel == li
            for qi in range(b):
                m = sel[qi]
                top_docids[qi, m] = s.index.docids[rows_sel[qi, m]]
        raw = outdir / f"{set_name}_raw.trec"
        write_run(raw, qids, top_docids, top_sc, tag=tag)
        base = outdir / f"{set_name}_base.trec"
        collapse_run_max(raw, base, tag=tag)
        # depth clamps can differ per language (e.g. one tiny index):
        # record each language's effective depths, not just language 0's
        _write_run_meta(
            outdir / f"{set_name}_meta.json", tag, len(qids),
            searchers[0].last_depths
            if all(s.last_depths == searchers[0].last_depths for s in searchers)
            else {"per_language": [s.last_depths for s in searchers]},
        )
        out[set_name] = base
        log.info("bilingual two-stage run saved: %s", base)
    return out


def run_two_stage_search(
    index: DenseFlatIndex,
    token_store: TokenShardStore,
    encoder,
    query_sets,
    outdir,
    *,
    k: int = 100,
    k_dense: Optional[int] = None,
    batch_size: int = 64,
    query_block: int = 256,
    tag: str = "twostage",
    max_queries: int = 0,
    cache_root=None,
):
    """Encode + two-stage search each query set; one ``<set>.trec`` per
    set (same run-file contract as the dense runners,
    `pipeline/runs.py:33-61` / reference `onepass_dense_run.py:382-466`)."""
    import pathlib

    from codemix_dense_retrieval_tpu.io.trec import write_run
    from codemix_dense_retrieval_tpu.utils.logging import get_logger

    log = get_logger("rerank")
    outdir = pathlib.Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    searcher = TwoStageSearcher(index, token_store)
    out = {}
    for set_name, rows in query_sets.items():
        if max_queries:
            rows = rows[:max_queries]
        qids = [q for q, _ in rows]
        texts = [t for _, t in rows]
        qvecs, qtoks, qlens = _encode_or_load_queries(
            encoder, set_name, qids, texts, batch_size, cache_root, log
        )
        scores, docids = searcher.search(
            qvecs, qtoks, qlens, k, k_dense=k_dense, query_block=query_block
        )
        run_path = outdir / f"{set_name}.trec"
        write_run(run_path, qids, docids, scores, tag=tag)
        _write_run_meta(
            outdir / f"{set_name}_meta.json", tag, len(qids), searcher.last_depths
        )
        out[set_name] = run_path
        log.info("two-stage run saved: %s (%d queries)", run_path, len(qids))
    return out
