"""TextEncoder — the user-facing encoding runtime.

Replaces sentence-transformers' ``model.encode`` (reference L2 layer,
`onepass_dense_mix_run_custom_lang.py:94-143`): tokenize on host (length
-bucketed static shapes), run the jitted Flax forward (pool + L2-norm
in-graph), return numpy float32. Family dialects apply the same prompt
prefixes the reference's ``encode_queries``/``encode_documents`` do.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from codemix_dense_retrieval_tpu.models import dialects
from codemix_dense_retrieval_tpu.models.tokenizer import bucket_length, load_tokenizer
from codemix_dense_retrieval_tpu.models.xlmr import XLMRConfig, XLMREncoder


class TextEncoder:
    """Encoder facade: tokenizer + jitted forward + dialect handling."""

    def __init__(
        self,
        name: str,
        cfg,
        params: Optional[Dict] = None,
        tokenizer=None,
        *,
        model=None,
        seed: int = 0,
        length_buckets: Sequence[int] = (16, 32, 64, 128, 256, 512),
        mesh=None,
        mesh_axis: str = "shard",
        weight_quant: Optional[str] = None,
    ) -> None:
        self.name = name
        self.cfg = cfg
        # default model family is XLM-R; pass model=Qwen3Encoder(cfg) etc.
        # for decoder embedders (same (ids, mask, task_id) call contract)
        self.model = model if model is not None else XLMREncoder(cfg)
        if tokenizer is None:
            from codemix_dense_retrieval_tpu.models.tokenizer import HashTokenizer

            # the fallback tokenizer must respect the model's vocab —
            # out-of-range ids silently produce garbage embeddings
            tokenizer = HashTokenizer(
                vocab_size=cfg.vocab_size, max_length=cfg.max_position_embeddings - 2
            )
        self.tokenizer = tokenizer
        self.length_buckets = tuple(
            b for b in length_buckets if b <= cfg.max_position_embeddings - 2
        ) or (cfg.max_position_embeddings - 2,)
        if params is None:
            ids = jnp.zeros((1, 8), jnp.int32)
            mask = jnp.ones((1, 8), jnp.int32)
            params = self.model.init(jax.random.key(seed), ids, mask)
        # bitsandbytes load_in_8bit/4bit analog (`onepass_dense_run.py:
        # 177-187`): large Linear kernels stay int8/nf4-resident in HBM,
        # dequant fuses into the matmuls inside the jitted forward.
        # Pre-quantized checkpoints (convert --weight_quant) arm the
        # dequant wrapper automatically.
        from codemix_dense_retrieval_tpu.ops.weight_quant import (
            dequantize_tree,
            has_quantized,
            quantize_tree,
        )

        self.weight_quant = weight_quant
        pre_quantized = has_quantized(params)
        if weight_quant and pre_quantized:
            # quantize_tree passes stored leaves through, so a different
            # requested mode would silently measure the stored one —
            # refuse rather than mis-attribute (e.g. an int8 A/B over an
            # nf4 checkpoint)
            from jax.tree_util import tree_leaves

            from codemix_dense_retrieval_tpu.ops.weight_quant import QuantizedTensor

            kinds = {
                x.kind for x in tree_leaves(
                    params, is_leaf=lambda x: isinstance(x, QuantizedTensor))
                if isinstance(x, QuantizedTensor)
            }
            if kinds != {weight_quant}:
                raise ValueError(
                    f"checkpoint is already quantized as {sorted(kinds)}; "
                    f"requested weight_quant={weight_quant!r} cannot be "
                    "applied on top (re-convert from the full-precision "
                    "checkpoint)"
                )
        elif weight_quant:
            params = quantize_tree(params, weight_quant)
        if weight_quant or pre_quantized:
            self.weight_quant = self.weight_quant or "pre-quantized"
            _deq = lambda p: dequantize_tree(p, cfg.dtype)  # noqa: E731
        else:
            _deq = lambda p: p  # noqa: E731
        self.params = params
        # Params must live ON DEVICE once: numpy leaves (checkpoint loads
        # via load_params_npz, quantize_tree's codes/scales) passed as jit
        # arguments are re-uploaded on EVERY forward call — through the
        # relay tunnel that turned the int8-quantized encode into 11.5 p/s
        # vs 721 p/s f32 (bench_logs r4s3 encode_e2e_q8: 735 s of
        # "dispatch" was param re-upload). The mesh path below re-puts
        # with an explicit replicated sharding; this covers single-device.
        self.params = jax.device_put(self.params)
        # data-parallel corpus encode over the mesh (SURVEY §2.3: "shard
        # the passage stream across devices" — the 4-way process
        # parallelism of run_encode_index_groups.sh:35-58 becomes GSPMD
        # batch splitting): inputs sharded on the batch axis, params
        # replicated, outputs batch-sharded.
        self.mesh = mesh
        # phase walls of the most recent encode call (tokenize/dispatch/
        # readback seconds — see _new_phase_stats); None until one runs
        self.last_phase_stats: Optional[dict] = None
        self._dp = 1
        if mesh is not None and mesh_axis in mesh.axis_names:
            self._dp = mesh.shape[mesh_axis]
        def _packed_apply(p, ids, seg, pos, starts, lens, task, max_segments):
            return self.model.apply(
                _deq(p), ids, seg, pos, starts, lens, task,
                max_segments=max_segments, method="packed_embeddings",
            )

        def _packed_both_apply(p, ids, seg, pos, starts, lens, task, max_segments):
            return self.model.apply(
                _deq(p), ids, seg, pos, starts, lens, task,
                max_segments=max_segments, method="packed_embed_with_tokens",
            )

        if self._dp > 1:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            data_sh = NamedSharding(mesh, P(mesh_axis, None))
            data_sh3 = NamedSharding(mesh, P(mesh_axis, None, None))
            rep = NamedSharding(mesh, P())
            self.params = jax.device_put(self.params, rep)
            self._fwd = jax.jit(
                lambda p, ids, mask, task: self.model.apply(_deq(p), ids, mask, task),
                in_shardings=(rep, data_sh, data_sh, rep),
                out_shardings=data_sh,
            )
            self._fwd_packed = jax.jit(
                _packed_apply,
                in_shardings=(rep,) + (data_sh,) * 5 + (rep,),
                out_shardings=data_sh3,
                static_argnums=(7,),
            )
            self._fwd_packed_both = jax.jit(
                _packed_both_apply,
                in_shardings=(rep,) + (data_sh,) * 5 + (rep,),
                out_shardings=(data_sh3, data_sh3),
                static_argnums=(7,),
            )
            tok_sh = NamedSharding(mesh, P(mesh_axis, None, None))
            self._fwd_tokens = jax.jit(
                lambda p, ids, mask, task: self.model.apply(
                    _deq(p), ids, mask, task, method="token_embeddings"
                ),
                in_shardings=(rep, data_sh, data_sh, rep),
                out_shardings=tok_sh,
            )
            self._fwd_both = jax.jit(
                lambda p, ids, mask, task: self.model.apply(
                    _deq(p), ids, mask, task, method="embed_with_tokens"
                ),
                in_shardings=(rep, data_sh, data_sh, rep),
                out_shardings=(data_sh, tok_sh),
            )
        else:
            self._fwd = jax.jit(
                lambda p, ids, mask, task: self.model.apply(_deq(p), ids, mask, task)
            )
            self._fwd_packed = jax.jit(_packed_apply, static_argnums=(7,))
            self._fwd_packed_both = jax.jit(_packed_both_apply, static_argnums=(7,))
            self._fwd_tokens = jax.jit(
                lambda p, ids, mask, task: self.model.apply(
                    _deq(p), ids, mask, task, method="token_embeddings"
                )
            )
            self._fwd_both = jax.jit(
                lambda p, ids, mask, task: self.model.apply(
                    _deq(p), ids, mask, task, method="embed_with_tokens"
                )
            )

    @classmethod
    def from_checkpoint(cls, name: str, checkpoint_dir, **kw) -> "TextEncoder":
        """Load either a pre-converted framework checkpoint (params.npz +
        encoder_config.json, written by the ``convert`` CLI) or a raw HF
        checkpoint dir (config.json + torch/safetensors weights)."""
        import pathlib

        d = pathlib.Path(checkpoint_dir)
        if (d / "params.npz").exists() and (d / "encoder_config.json").exists():
            import json

            from codemix_dense_retrieval_tpu.models.convert import load_params_npz

            cfg_dict = json.loads((d / "encoder_config.json").read_text())
            cfg_dict.pop("dtype", None)
            cfg = XLMRConfig(**cfg_dict)
            params = load_params_npz(d / "params.npz")
        else:
            from codemix_dense_retrieval_tpu.models.convert import load_hf_checkpoint

            cfg, params = load_hf_checkpoint(
                checkpoint_dir, pooling=dialects.default_pooling(name)
            )
        tok = load_tokenizer(
            checkpoint_dir, cfg.max_position_embeddings - 2, vocab_size=cfg.vocab_size
        )
        return cls(name, cfg, params, tok, **kw)

    # ------------------------------------------------------------------

    _PREFETCH_DEPTH = 3
    # dense-output readbacks coalesced per transfer (see _encode): the
    # relay charges a fixed RPC latency per device->host read, so small
    # per-batch reads are latency-bound, not bandwidth-bound
    _READ_COALESCE = 4

    @staticmethod
    def _length_order(texts: Sequence[str]) -> np.ndarray:
        """Batch-homogenizing permutation: longest texts first (char length
        as the token-count proxy, the sentence-transformers convention).
        Sorted batches land in the smallest possible length bucket instead
        of every mixed batch paying the longest member's bucket — measured
        ~40% of the e2e encode wall on mMARCO-like length spreads
        (BENCH_NOTES round 2). Stable, so equal-length texts keep stream
        order. Callers restore output order with the inverse permutation."""
        return np.argsort([-len(t) for t in texts], kind="stable")

    @staticmethod
    def _inverse(order: np.ndarray) -> np.ndarray:
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        return inv

    @staticmethod
    def _new_phase_stats() -> dict:
        """Per-call pipeline phase accumulators (seconds; see
        ``last_phase_stats``). Single-writer per key: ``tokenize_work``
        is written only by the prefetch worker, ``readback_work`` only
        by the reader worker, the rest by the main thread."""
        return {
            "tokenize_work": 0.0,  # prefetch thread: encode_batch + pad
            "tokenize_wait": 0.0,  # main thread blocked on the prefetch
            "job_iter": 0.0,       # main thread: tokenize_wait + dispatch
            "readback_work": 0.0,  # reader thread: device->host + cast
            "readback_wait": 0.0,  # main thread draining the reader
            "wall": 0.0,
            "batches": 0,
        }

    def _batch_inputs(
        self,
        texts: Sequence[str],
        batch_size: int,
        prefix: str,
        max_length: Optional[int],
        stats: Optional[dict] = None,
    ):
        """Yield padded (ids, mask, n_valid) batches with tokenization
        running on a prefetch thread.

        JAX async dispatch alone does NOT hide the host tokenization wall
        here: on the axon relay each dispatch blocks until the device
        accepts the program (measured overlap efficiency 0.56,
        BENCH_NOTES round 2), so batch i+1 is tokenized on a worker
        thread while the main thread dispatches batch i. HF fast
        tokenizers release the GIL in ``encode_batch``; the pure-Python
        HashTokenizer simply gains nothing.
        """
        import itertools
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        ml = max_length or (self.cfg.max_position_embeddings - 2)
        # the global batch must split evenly over the data-parallel axis
        batch_size = ((batch_size + self._dp - 1) // self._dp) * self._dp

        def prep(start: int):
            t0 = time.perf_counter()
            chunk = [prefix + t for t in texts[start : start + batch_size]]
            ids, mask = self.tokenizer.encode_batch(chunk, ml)
            # pad to (bucketed length, full batch) for stable jit shapes
            s = bucket_length(ids.shape[1], self.length_buckets)
            b = batch_size
            ids_p = np.full((b, s), getattr(self.tokenizer, "pad_id", 1), np.int32)
            mask_p = np.zeros((b, s), np.int32)
            ids_p[: len(chunk), : ids.shape[1]] = ids[:, :s]
            mask_p[: len(chunk), : mask.shape[1]] = mask[:, :s]
            if stats is not None:
                stats["tokenize_work"] += time.perf_counter() - t0
            return ids_p, mask_p, len(chunk)

        starts = iter(range(0, len(texts), batch_size))
        with ThreadPoolExecutor(max_workers=1) as ex:
            futs = deque(
                ex.submit(prep, s)
                for s in itertools.islice(starts, self._PREFETCH_DEPTH)
            )
            while futs:
                t0 = time.perf_counter()
                out = futs.popleft().result()
                if stats is not None:
                    stats["tokenize_wait"] += time.perf_counter() - t0
                    stats["batches"] += 1
                nxt = next(starts, None)
                if nxt is not None:
                    futs.append(ex.submit(prep, nxt))
                yield out

    def _overlap_read(self, jobs, stats: Optional[dict] = None) -> List:
        """Drain ``(fn, args)`` jobs with ``fn`` running on a reader thread.

        The jobs generator is driven on the MAIN thread (so device
        dispatch order is preserved and never interleaves with another
        thread's dispatch); each yielded job's device->host readback
        runs on the single worker, overlapping the next batch's
        dispatch. The in-flight window is bounded by _PREFETCH_DEPTH so
        at most that many batch outputs are resident on device.
        Returns the results in job order.

        With ``stats``, phase walls accumulate (``job_iter`` = generator
        steps on the main thread, i.e. tokenize_wait + device dispatch;
        ``readback_work`` on the reader; ``readback_wait`` = main thread
        blocked draining it; ``wall`` = everything) so the e2e-vs-forward
        overlap gap is attributable per phase (VERDICT r3 item 7).
        """
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        t_wall = time.perf_counter()
        it = iter(jobs)

        def step():
            t0 = time.perf_counter()
            item = next(it, None)
            if stats is not None:
                stats["job_iter"] += time.perf_counter() - t0
            return item

        def timed_fn(fn, args):
            t0 = time.perf_counter()
            r = fn(*args)
            if stats is not None:
                stats["readback_work"] += time.perf_counter() - t0
            return r

        def drain(futs):
            t0 = time.perf_counter()
            r = futs.popleft().result()
            if stats is not None:
                stats["readback_wait"] += time.perf_counter() - t0
            return r

        out: List = []
        with ThreadPoolExecutor(max_workers=1) as ex:
            futs = deque()
            while (item := step()) is not None:
                fn, args = item
                futs.append(ex.submit(timed_fn, fn, args))
                while len(futs) > self._PREFETCH_DEPTH:
                    out.append(drain(futs))
            while futs:
                out.append(drain(futs))
        if stats is not None:
            stats["wall"] += time.perf_counter() - t_wall
        return out

    def _encode(
        self,
        texts: Sequence[str],
        batch_size: int,
        prefix: str,
        max_length: Optional[int],
        task_id: int = 0,
        readback_dtype=None,
    ) -> np.ndarray:
        # device->host materialization is deferred until all batches are
        # enqueued; tokenization rides the prefetch thread (_batch_inputs);
        # batches are length-sorted (bucket-homogeneous) and the output
        # restored to input order
        order = self._length_order(texts)
        texts = [texts[i] for i in order]
        task = jnp.asarray(task_id, jnp.int32)
        # result readback rides a READER thread: batch i's device->host
        # transfer overlaps batch i+1's dispatch, and the in-flight
        # window bounds how many batch outputs stay device-resident.
        # Dense outputs are COALESCED device-side (_READ_COALESCE batches
        # concatenated into one transfer): each relay readback pays a
        # ~65 ms RPC round-trip regardless of size (r4s3 phase stats:
        # 6.2 s of the 25.3 s e2e wall was per-batch readback overhead at
        # 80 batches), so fewer+larger transfers close most of the
        # e2e-vs-forward-only gap. Token outputs (~100 MB/batch) are NOT
        # coalesced — see _encode_tokens.
        def read(dev, ns):
            host = np.asarray(dev)
            b = dev.shape[0] // len(ns)
            return np.concatenate(
                [
                    host[i * b : i * b + n].astype(np.float32)
                    for i, n in enumerate(ns)
                ],
                axis=0,
            )

        stats = self.last_phase_stats = self._new_phase_stats()

        def jobs():
            group, ns = [], []

            def flush():
                cat = jnp.concatenate(group, axis=0)
                if readback_dtype is not None:
                    # transfer-dtype downcast (device-side): the tunnel is
                    # ~10-20 MB/s, and the corpus pipeline stores bf16
                    # anyway — reading back f32 moves 2x the bytes for
                    # mantissa the store immediately discards
                    cat = cat.astype(readback_dtype)
                return read, (cat, tuple(ns))

            for ids_p, mask_p, n in self._batch_inputs(
                texts, batch_size, prefix, max_length, stats=stats
            ):
                group.append(self._fwd(self.params, ids_p, mask_p, task))
                ns.append(n)
                if len(group) == self._READ_COALESCE:
                    # concat dispatched on the MAIN thread (dispatch order
                    # stays single-threaded; the reader only transfers)
                    yield flush()
                    group, ns = [], []
            if group:
                yield flush()

        out = self._overlap_read(jobs(), stats=stats)
        if not out:
            dim = self.cfg.hidden_size
            return np.zeros((0, dim), np.float32)
        return np.concatenate(out, axis=0)[self._inverse(order)]

    def _require_packing(self, method: str = "packed_embeddings") -> None:
        """Fail fast (not mid-pipeline) when the model family lacks the
        packed forward (e.g. GTE — no segment support yet)."""
        if not callable(getattr(type(self.model), method, None)):
            raise ValueError(
                f"sequence packing (pack=True) is not supported by "
                f"{type(self.model).__name__}: it defines no {method}()"
            )

    #: default packed row length. The packed forward's cost per token
    #: scales with S (attention is O(S)/token and the row count drops as
    #: 1/S only until rows fill), so the winner balances pad-free rows
    #: against attention cost: measured on-chip (bench_logs/r5/
    #: pack_seqlen.log, 24L d=1024, mMARCO-like lengths): S=512 0.76x
    #: the bucketed path, S=384 1.37x, S=256 **1.48x**, S=192 1.28x.
    _PACK_SEQ_DEFAULT = 256

    def _packed_setup(self, batch_size: int, max_length: Optional[int]):
        """Shared sizing/convention resolution for the packed pipelines.

        ``seq_len`` here is the TOKENIZER cap (same as the bucketed
        path); the packed ROW length is chosen per chunk in
        `_packed_chunks` — at least `_PACK_SEQ_DEFAULT`, growing to the
        chunk's longest bucketed sequence so nothing is truncated beyond
        the cap."""
        seq_len = max_length or self.length_buckets[-1]
        # ~batch_size texts per dispatch at typical 4-8 seqs/row
        rows_per_batch = max(self._dp, batch_size // 8)
        rows_per_batch = ((rows_per_batch + self._dp - 1) // self._dp) * self._dp
        pad_id = getattr(self.tokenizer, "pad_id", 1)
        # decoder embedders (Qwen3) restart RoPE positions at 0 per
        # segment; XLM-R uses the RoBERTa pad_id+1 convention (default)
        pos_kw = (
            dict(pos_offset=0, pos_pad=0)
            if getattr(self.model, "PACKED_POS", "roberta") == "zero" else {}
        )
        return seq_len, rows_per_batch, pad_id, pos_kw

    def _packed_chunks(
        self, texts, prefix, seq_len, rows_per_batch, max_segments,
        pad_id, pos_kw, stats,
    ):
        """Yield (start, count, PackedRows) per chunk, with tokenize+pack
        running on a prefetch thread (row count padded to a
        rows_per_batch multiple for stable jit shapes)."""
        import itertools
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        from codemix_dense_retrieval_tpu.models.packing import (
            pack_sequences,
            pad_rows_to,
        )

        chunk_texts = rows_per_batch * 16  # >= ~2 batches of packed rows

        from codemix_dense_retrieval_tpu.models.tokenizer import bucket_length

        def prep(start: int):
            t0 = time.perf_counter()
            chunk = [prefix + t for t in texts[start : start + chunk_texts]]
            ids, mask = self.tokenizer.encode_batch(chunk, seq_len)
            lens = mask.sum(axis=1).astype(np.int32)
            rows = [ids[i, : lens[i]] for i in range(len(chunk))]
            # packed ROW length: the measured sweet spot (bench_logs/r5/
            # pack_seqlen.log: S=256 is 1.48x, S=512 is 0.76x), grown to
            # the chunk's longest bucketed sequence so long passages are
            # never truncated below the cap. Chunks are length-sorted,
            # so only the leading chunks pay longer rows.
            row_s = max(
                min(self._PACK_SEQ_DEFAULT, seq_len),
                bucket_length(int(lens.max()) if len(lens) else 1,
                              self.length_buckets),
            )
            packed = pack_sequences(rows, row_s, pad_id, max_segments, **pos_kw)
            packed = pad_rows_to(
                packed,
                -(-packed.n_rows // rows_per_batch) * rows_per_batch,
                pad_id=pad_id,
            )
            if stats is not None:
                stats["tokenize_work"] += time.perf_counter() - t0
            return start, len(chunk), packed

        starts = iter(range(0, len(texts), chunk_texts))
        with ThreadPoolExecutor(max_workers=1) as ex:
            futs = deque(
                ex.submit(prep, s)
                for s in itertools.islice(starts, self._PREFETCH_DEPTH)
            )
            while futs:
                t0 = time.perf_counter()
                out = futs.popleft().result()
                if stats is not None:
                    stats["tokenize_wait"] += time.perf_counter() - t0
                    stats["batches"] += 1
                nxt = next(starts, None)
                if nxt is not None:
                    futs.append(ex.submit(prep, nxt))
                yield out

    def _encode_packed(
        self,
        texts: Sequence[str],
        batch_size: int,
        prefix: str,
        max_length: Optional[int],
        task_id: int = 0,
        readback_dtype=None,
        rows_per_batch: Optional[int] = None,
        max_segments: int = 16,
    ) -> np.ndarray:
        """Sequence-packed corpus encode (SURVEY §7 "prefetch + pack"):
        short passages share device rows of the LARGEST bucket length
        under a block-diagonal attention mask, so the forward computes
        ~zero pad tokens (vs length-bucketing's intra-bucket waste).

        Pipeline: texts length-sorted (packing quality), tokenized +
        packed per CHUNK on the prefetch thread (`_packed_chunks`),
        dispatched as fixed (rows_per_batch, S) batches, per-segment
        pooled outputs placed back via the chunk's (row, slot) map.
        """
        self._require_packing()
        seq_len, rpb, pad_id, pos_kw = self._packed_setup(batch_size, max_length)
        if rows_per_batch is not None:
            rpb = ((rows_per_batch + self._dp - 1) // self._dp) * self._dp
        order = self._length_order(texts)
        texts = [texts[i] for i in order]
        task = jnp.asarray(task_id, jnp.int32)
        stats = self.last_phase_stats = self._new_phase_stats()

        n_out = len(texts)
        dim = self.cfg.hidden_size
        out_sorted = np.zeros((n_out, dim), np.float32)

        def read(dev, start, count):
            out_sorted[start : start + count] = (
                np.asarray(dev).astype(np.float32)
            )
            return count

        def jobs():
            for start, count, packed in self._packed_chunks(
                texts, prefix, seq_len, rpb, max_segments, pad_id, pos_kw, stats
            ):
                outs = []
                for r0 in range(0, packed.n_rows, rpb):
                    sl = slice(r0, r0 + rpb)
                    outs.append(self._fwd_packed(
                        self.params,
                        packed.ids[sl], packed.segment_ids[sl],
                        packed.position_ids[sl], packed.seg_starts[sl],
                        packed.seg_lengths[sl], task, max_segments,
                    ))
                cat = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
                # compact to USED slots on device: shipping the (R, M, d)
                # slot tensor moved ~M/avg_segments x the needed bytes
                # through the tunnel and made readback the packed path's
                # wall (bench_logs/r5/encode_pack.log: 36 s of a 38 s
                # pass). One device gather -> (count, d) in input order.
                flat = jnp.asarray(
                    (packed.placement[:, 0] * max_segments
                     + packed.placement[:, 1]).astype(np.int32))
                sel = cat.reshape(-1, cat.shape[-1])[flat]
                if readback_dtype is not None:
                    sel = sel.astype(readback_dtype)
                yield read, (sel, start, count)

        self._overlap_read(jobs(), stats=stats)
        return out_sorted[self._inverse(order)]

    def _encode_packed_with_tokens(
        self,
        texts: Sequence[str],
        batch_size: int,
        prefix: str,
        max_length: Optional[int],
        task_id: int = 0,
        rows_per_batch: Optional[int] = None,
        max_segments: int = 16,
    ):
        """Packed analog of the embed_with_tokens path: one packed
        backbone pass -> (dense (n, d), tokens (n, T, d), lengths (n,)),
        token blocks sliced out of the packed rows on host. Shares the
        tokenize/pack/prefetch scaffolding with `_encode_packed` via
        `_packed_chunks`."""
        self._require_packing("packed_embed_with_tokens")
        seq_len, rpb, pad_id, pos_kw = self._packed_setup(batch_size, max_length)
        if rows_per_batch is not None:
            rpb = ((rows_per_batch + self._dp - 1) // self._dp) * self._dp
        order = self._length_order(texts)
        texts = [texts[i] for i in order]
        task = jnp.asarray(task_id, jnp.int32)
        stats = self.last_phase_stats = self._new_phase_stats()

        chunks = []  # (start, count, packed, pooled_host, tok_host)

        def read(pooled_dev, tok_dev, start, count, packed):
            chunks.append((
                start, count, packed,
                np.asarray(pooled_dev).astype(np.float32),
                np.asarray(tok_dev).astype(np.float32),
            ))
            return count

        def jobs():
            for start, count, packed in self._packed_chunks(
                texts, prefix, seq_len, rpb, max_segments, pad_id, pos_kw, stats
            ):
                pool_outs, tok_outs = [], []
                for r0 in range(0, packed.n_rows, rpb):
                    sl = slice(r0, r0 + rpb)
                    p_o, t_o = self._fwd_packed_both(
                        self.params,
                        packed.ids[sl], packed.segment_ids[sl],
                        packed.position_ids[sl], packed.seg_starts[sl],
                        packed.seg_lengths[sl], task, max_segments,
                    )
                    pool_outs.append(p_o)
                    tok_outs.append(t_o)
                pooled = (jnp.concatenate(pool_outs, axis=0)
                          if len(pool_outs) > 1 else pool_outs[0])
                toks = (jnp.concatenate(tok_outs, axis=0)
                        if len(tok_outs) > 1 else tok_outs[0])
                yield read, (pooled, toks, start, count, packed)

        self._overlap_read(jobs(), stats=stats)
        n_out, dim = len(texts), self.cfg.hidden_size
        if not chunks:
            return (
                np.zeros((0, dim), np.float32),
                np.zeros((0, 0, dim), np.float32),
                np.zeros(0, np.int32),
            )
        t_max = max(
            int(p.seg_lengths.max()) if p.seg_lengths.size else 0
            for _, _, p, _, _ in chunks
        )
        dense = np.zeros((n_out, dim), np.float32)
        toks = np.zeros((n_out, t_max, dim), np.float32)
        lengths = np.zeros(n_out, np.int32)
        for start, count, packed, pooled_h, tok_h in chunks:
            pl = packed.placement
            dense[start : start + count] = pooled_h[pl[:, 0], pl[:, 1]]
            for j in range(count):
                r, slot = pl[j]
                s0 = int(packed.seg_starts[r, slot])
                ln = int(packed.seg_lengths[r, slot])
                toks[start + j, :ln] = tok_h[r, s0 : s0 + ln]
                lengths[start + j] = ln
        inv = self._inverse(order)
        return dense[inv], toks[inv], lengths[inv]

    def _encode_tokens(
        self,
        texts: Sequence[str],
        batch_size: int,
        prefix: str,
        max_length: Optional[int],
        task_id: int = 0,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Per-token embeddings for multi-vector serving: (tokens
        (n, T, d) f32 — T = the longest bucketed batch length, shorter
        batches zero-padded — and valid-token lengths (n,))."""
        order = self._length_order(texts)
        texts = [texts[i] for i in order]
        lengths: List[np.ndarray] = []
        task = jnp.asarray(task_id, jnp.int32)

        # token outputs are big (batch x T x d f32, ~100 MB at
        # production shapes): the bounded overlap-read keeps at most
        # _PREFETCH_DEPTH+1 of them device-resident while readback
        # overlaps the next dispatch
        def read(dev, n):
            return np.asarray(dev)[:n].astype(np.float32)

        stats = self.last_phase_stats = self._new_phase_stats()

        def jobs():
            for ids_p, mask_p, n in self._batch_inputs(
                texts, batch_size, prefix, max_length, stats=stats
            ):
                lengths.append(mask_p[:n].sum(axis=1).astype(np.int32))
                yield read, (self._fwd_tokens(self.params, ids_p, mask_p, task), n)

        arrs = self._overlap_read(jobs(), stats=stats)
        if not arrs:
            return np.zeros((0, 0, self.cfg.hidden_size), np.float32), np.zeros(0, np.int32)
        # batches are length-sorted longest-first, so the first batch
        # carries the maximal bucketed T
        t_max = max(int(a.shape[1]) for a in arrs)
        total = sum(a.shape[0] for a in arrs)
        out = np.zeros((total, t_max, self.cfg.hidden_size), np.float32)
        pos = 0
        for arr in arrs:
            out[pos : pos + arr.shape[0], : arr.shape[1]] = arr
            pos += arr.shape[0]
        inv = self._inverse(order)
        return out[inv], np.concatenate(lengths)[inv]

    def encode_documents_with_tokens(
        self,
        texts: Sequence[str],
        batch_size: int = 64,
        max_length: Optional[int] = None,
        pack: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """One forward pass -> (dense (n, d) f32, tokens (n, T, d) f32,
        lengths (n,)) — the encode+index path for two-stage serving builds
        the flat index and the token store together. ``pack=True`` routes
        through sequence packing (token blocks sliced out of packed rows)."""
        prefix = dialects.doc_prefix(self.name)
        if pack:
            return self._encode_packed_with_tokens(
                texts, batch_size, prefix, max_length,
                task_id=self._task_id("passage"),
            )
        task = jnp.asarray(self._task_id("passage"), jnp.int32)
        order = self._length_order(texts)
        texts = [texts[i] for i in order]
        lengths: List[np.ndarray] = []

        def read(pair, n):
            dv, tv = pair
            return (
                np.asarray(dv)[:n].astype(np.float32),
                np.asarray(tv)[:n].astype(np.float32),
            )

        stats = self.last_phase_stats = self._new_phase_stats()

        def jobs():
            for ids_p, mask_p, n in self._batch_inputs(
                texts, batch_size, prefix, max_length, stats=stats
            ):
                lengths.append(mask_p[:n].sum(axis=1).astype(np.int32))
                yield read, (self._fwd_both(self.params, ids_p, mask_p, task), n)

        pairs = self._overlap_read(jobs(), stats=stats)
        if not pairs:
            d = self.cfg.hidden_size
            return (
                np.zeros((0, d), np.float32),
                np.zeros((0, 0, d), np.float32),
                np.zeros(0, np.int32),
            )
        t_max = max(int(t.shape[1]) for _, t in pairs)
        total = sum(d.shape[0] for d, _ in pairs)
        dense = np.zeros((total, self.cfg.hidden_size), np.float32)
        toks = np.zeros((total, t_max, self.cfg.hidden_size), np.float32)
        pos = 0
        for dv, tv in pairs:
            n = dv.shape[0]
            dense[pos : pos + n] = dv
            toks[pos : pos + n, : tv.shape[1]] = tv
            pos += n
        inv = self._inverse(order)
        return dense[inv], toks[inv], np.concatenate(lengths)[inv]

    def encode_queries_tokens(
        self, texts: Sequence[str], batch_size: int = 64,
        max_length: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        return self._encode_tokens(
            texts, batch_size, dialects.query_prefix(self.name), max_length,
            task_id=self._task_id("query"),
        )

    def encode_documents_tokens(
        self, texts: Sequence[str], batch_size: int = 64,
        max_length: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        return self._encode_tokens(
            texts, batch_size, dialects.doc_prefix(self.name), max_length,
            task_id=self._task_id("passage"),
        )

    def _task_id(self, role: str) -> int:
        """LoRA task id for jina-v3 (retrieval.query=0 / retrieval.passage=1,
        the reference's task kwargs); 0 (a no-op adapter slot) otherwise."""
        if getattr(self.cfg, "lora_rank", 0) and dialects.detect_encoder_family(self.name) == "jina-v3":
            from codemix_dense_retrieval_tpu.models.xlmr import JINA_V3_TASKS

            name = "retrieval.query" if role == "query" else "retrieval.passage"
            return JINA_V3_TASKS.index(name)
        return 0

    def encode_queries(
        self,
        texts: Sequence[str],
        batch_size: int = 64,
        max_length: Optional[int] = None,
    ) -> np.ndarray:
        return self._encode(
            texts, batch_size, dialects.query_prefix(self.name), max_length,
            task_id=self._task_id("query"),
        )

    def encode_documents(
        self,
        texts: Sequence[str],
        batch_size: int = 64,
        max_length: Optional[int] = None,
        readback_dtype=None,
        pack: bool = False,
    ) -> np.ndarray:
        """``readback_dtype`` (e.g. ``jnp.bfloat16``): device-side cast
        before the device->host transfer — halves tunnel bytes for
        corpus encodes whose store is bf16 anyway. Returned array is
        always f32. Queries should keep the default (f32 transfer): the
        mixing/search paths consume full-precision queries.

        ``pack=True`` routes through sequence packing (short passages
        share device rows under a block-diagonal attention mask —
        eliminates intra-bucket pad waste; see :meth:`_encode_packed`)."""
        if pack:
            return self._encode_packed(
                texts, batch_size, dialects.doc_prefix(self.name), max_length,
                task_id=self._task_id("passage"), readback_dtype=readback_dtype,
            )
        return self._encode(
            texts, batch_size, dialects.doc_prefix(self.name), max_length,
            task_id=self._task_id("passage"), readback_dtype=readback_dtype,
        )

    @property
    def dim(self) -> int:
        return self.cfg.hidden_size
