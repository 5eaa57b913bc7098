"""Online serving: an HTTP search endpoint with TPU-friendly microbatching.

The reference is a batch research pipeline (`onepass_dense_run.py` reads
query TSVs and writes TREC files); deploying the same index for ONLINE
queries is the natural production surface and needs one thing the batch
scripts don't have: request coalescing. A TPU searches a 1.1M-row shard
for 1 query in nearly the same wall time as for 256 (the matmul is
batch-amortized and every dispatch pays the host round trip), so
serving batch-1 requests directly would waste ~100x throughput.

Design (stdlib only — no server-framework dependency):

- ``SearchService`` owns the encoder + index and a single consumer
  thread: requests enqueue (texts, k); the consumer drains the queue up
  to ``max_batch`` texts (waiting at most ``max_wait_s`` after the first
  arrival), encodes ONCE, searches ONCE at the max requested depth, and
  slices per-request results. One consumer also serializes device
  access (required on single-chip deployments).
- ``http.server.ThreadingHTTPServer`` handles transport: many blocking
  request threads feed the one batching queue.

Endpoints: ``GET /healthz`` (liveness + stats), ``POST /search``
``{"queries": [...], "k": 10}`` -> ``{"results": [[{"docid", "score"},
...], ...]}``, and online corpus mutation — ``POST /add``
``{"docs": [{"docid", "text"}, ...]}`` / ``POST /remove``
``{"docids": [...]}`` (the FAISS add_with_ids/remove_ids analogs,
applied by the consumer thread in arrival order, never merged into a
search batch), ``POST /save`` / ``POST /reload`` ``{"dir": ...}``
(snapshot persistence and hot corpus swap, both restricted to
``snapshot_root``). With ``approx=True`` (the PCA-sketch tier,
:mod:`~codemix_dense_retrieval_tpu.ops.sketch`) each result row becomes
``{"hits": [...], "certified": bool}`` — ``certified`` True means that
query's results are provably identical to exact search.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from concurrent.futures import Future
from concurrent.futures import TimeoutError as FuturesTimeoutError
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Sequence

import numpy as np

from codemix_dense_retrieval_tpu.utils import next_pow2


@dataclass
class ServeStats:
    requests: int = 0
    queries: int = 0
    batches: int = 0
    batched_queries: int = 0
    errors: int = 0
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "requests": self.requests,
                "queries": self.queries,
                "batches": self.batches,
                "batched_queries": self.batched_queries,
                "errors": self.errors,
            }


@dataclass
class _Pending:
    texts: Sequence[str]
    k: int
    future: Future
    op: str = "search"  # search | add | remove
    payload: Optional[Sequence] = None


class SearchService:
    """Microbatching encode+search service over one encoder + index.

    ``index`` is anything with ``search(q, k) -> (scores, docids)`` and a
    ``count`` attribute (``DenseFlatIndex``, ``TwoStageSearcher``).
    """

    def __init__(
        self,
        encoder,
        index,
        *,
        default_k: int = 10,
        max_k: int = 1000,
        max_batch: int = 256,
        max_wait_s: float = 0.005,
        encode_batch: int = 64,
        approx: bool = False,
        snapshot_root: Optional[str] = None,
        index_search_kwargs: Optional[dict] = None,
    ) -> None:
        self.encoder = encoder
        self.index = index
        # /save writes server-side files; restrict it to an explicit root
        # (None = snapshots disabled over HTTP)
        self.snapshot_root = snapshot_root
        # approx tier: False/off, True/"fast" (sketch, per-query
        # exactness certificates in each result row), "guaranteed"
        # (sketch + exact escalation — always-exact results), or
        # "adaptive" (probed-exact cover — always exact, priced at the
        # probe on clustered row orders; see DenseFlatIndex.search)
        if approx is True:
            approx = "fast"
        if approx not in (False, "fast", "guaranteed", "adaptive"):
            raise ValueError(
                f"approx must be False/True/'fast'/'guaranteed'/'adaptive',"
                f" got {approx!r}"
            )
        self.approx = approx
        if approx and not hasattr(index, "enable_sketch"):
            raise ValueError(f"{type(index).__name__} has no sketch tier")
        # two-stage (ColBERT MaxSim) serving: a TwoStageSearcher carries a
        # token store and needs query TOKEN embeddings alongside the dense
        # vectors — detected by its .tokens attribute
        self.two_stage = hasattr(index, "tokens")
        self.index_search_kwargs = dict(index_search_kwargs or {})
        self.default_k = default_k
        self.max_k = max_k
        self.max_batch = max_batch
        self.max_wait_s = max_wait_s
        self.encode_batch = encode_batch
        self.stats = ServeStats()
        self._queue: "queue.Queue[Optional[_Pending]]" = queue.Queue()
        self._thread = threading.Thread(
            target=self._consume, name="search-batcher", daemon=True
        )
        self._thread.start()

    # ---------------------------------------------------------------- API

    def submit(self, texts: Sequence[str], k: Optional[int] = None) -> Future:
        """Enqueue one request; the Future resolves to a list (one entry
        per text) of ``[{"docid": ..., "score": ...}, ...]`` lists."""
        k = self.default_k if k is None else int(k)
        if (
            not isinstance(texts, (list, tuple))
            or not texts
            or not all(isinstance(t, str) and t for t in texts)
        ):
            raise ValueError("queries must be a non-empty list of non-empty strings")
        if not 1 <= k <= self.max_k:
            raise ValueError(f"k must be in [1, {self.max_k}]")
        if len(texts) > self.max_batch:
            raise ValueError(f"at most {self.max_batch} queries per request")
        fut: Future = Future()
        with self.stats._lock:
            self.stats.requests += 1
            self.stats.queries += len(texts)
        self._queue.put(_Pending(list(texts), k, fut))
        return fut

    def search(self, texts: Sequence[str], k: Optional[int] = None) -> List[list]:
        return self.submit(texts, k).result()

    def submit_add(self, docs: Sequence[dict]) -> Future:
        """Enqueue an online corpus addition: ``[{"docid", "text"}, ...]``.
        Encoded and applied by the consumer thread (device access stays
        serialized with search batches). Resolves to ``{"added": n}``."""
        if not hasattr(self.index, "add"):
            raise ValueError(f"{type(self.index).__name__} is not mutable")
        if (
            not isinstance(docs, (list, tuple)) or not docs
            or not all(
                isinstance(d, dict)
                and isinstance(d.get("docid"), str) and d["docid"]
                and isinstance(d.get("text"), str) and d["text"]
                for d in docs
            )
        ):
            raise ValueError(
                "docs must be a non-empty list of {docid, text} objects"
            )
        if len(docs) > self.max_batch:
            raise ValueError(f"at most {self.max_batch} docs per request")
        fut: Future = Future()
        self._queue.put(_Pending([], 0, fut, op="add", payload=list(docs)))
        return fut

    def _resolve_snapshot(self, directory) -> str:
        """Validate a client-supplied snapshot path: must resolve inside
        ``snapshot_root`` — an unrestricted path would let any network
        client read/write anywhere the serving user can."""
        import pathlib

        if self.snapshot_root is None:
            raise ValueError(
                "snapshots disabled: start the service with snapshot_root "
                "(serve --snapshot_root DIR)"
            )
        if not isinstance(directory, str) or not directory:
            raise ValueError("dir must be a non-empty path string")
        root = pathlib.Path(self.snapshot_root).resolve()
        target = (root / directory).resolve()
        if not target.is_relative_to(root):
            raise ValueError(f"dir escapes snapshot_root: {directory!r}")
        return str(target)

    def submit_save(self, directory: str) -> Future:
        """Enqueue an index snapshot (persists online mutations via
        ``to_store``); resolves to ``{"saved": dir}``."""
        if not hasattr(self.index, "save"):
            raise ValueError(f"{type(self.index).__name__} cannot save")
        target = self._resolve_snapshot(directory)
        fut: Future = Future()
        self._queue.put(_Pending([], 0, fut, op="save", payload=[target]))
        return fut

    def submit_reload(self, directory: str) -> Future:
        """Enqueue a hot index swap from a snapshot directory (inside
        ``snapshot_root``): the consumer loads + uploads the new index
        and replaces the live one between batches — corpus replacement
        without a serving restart. Dense services only (a two-stage
        snapshot carries a token store; restart to swap it). Resolves to
        ``{"reloaded": dir, "count": n}``."""
        if self.two_stage:
            raise ValueError(
                "reload is dense-only: restart the server to swap a "
                "two-stage (token store) snapshot"
            )
        target = self._resolve_snapshot(directory)
        fut: Future = Future()
        self._queue.put(_Pending([], 0, fut, op="reload", payload=[target]))
        return fut

    def submit_remove(self, docids: Sequence[str]) -> Future:
        """Enqueue an online removal by docid; resolves to
        ``{"removed": n}`` (unknown docids are ignored, FAISS
        ``remove_ids`` semantics)."""
        if not hasattr(self.index, "remove"):
            raise ValueError(f"{type(self.index).__name__} is not mutable")
        if (
            not isinstance(docids, (list, tuple)) or not docids
            or not all(isinstance(x, str) and x for x in docids)
        ):
            raise ValueError("docids must be a non-empty list of strings")
        fut: Future = Future()
        self._queue.put(_Pending([], 0, fut, op="remove", payload=list(docids)))
        return fut

    def warmup(self, ks=None, batches=None, text: str = "warm query") -> dict:
        """Precompile the serving programs before traffic.

        Every distinct (batch-bucket, k-bucket) shape traces and compiles
        a fresh program — 1-10 minutes per program through the TPU relay —
        so the first real request at a cold bucket otherwise pays it
        (make_server's request timeout is sized for exactly that). Drives
        the REAL path (encode -> search -> format) via submit(), one
        request per combination; with the persistent compile cache the
        cost is once per device kind. Returns {"programs", "seconds"}.

        Default coverage: EVERY pow2 batch bucket up to ``max_batch``
        (request coalescing realizes arbitrary batch sizes) crossed with
        the two depth buckets real traffic hits — ``default_k``'s and
        ``max_k``'s. A non-default ``k`` in between still compiles its
        own program on first use; pass ``ks`` to pre-warm those too.
        """
        k_hi = min(self.max_k, self.index.count)
        kset = sorted({min(k, k_hi) for k in (ks or (self.default_k, k_hi))})
        if batches is None:
            batches = [1 << i for i in range((self.max_batch).bit_length())]
            batches.append(self.max_batch)  # the coalescing cap itself
        buckets = sorted({
            min(next_pow2(max(1, int(b))), self.max_batch) for b in batches
        })
        t0 = time.monotonic()
        n = 0
        for b in buckets:
            for k in kset:
                self.submit([text] * b, k).result()
                n += 1
        return {"programs": n, "seconds": round(time.monotonic() - t0, 1)}

    def close(self) -> None:
        self._queue.put(None)
        self._thread.join(timeout=5)

    # ---------------------------------------------------------- consumer

    def _drain(self, first: _Pending) -> List[_Pending]:
        """Coalesce: after the first request arrives, keep accepting until
        ``max_batch`` texts are queued or ``max_wait_s`` passes. Admin ops
        (add/remove) run alone, in arrival order — never merged into a
        search batch."""
        batch = [first]
        if first.op != "search":
            return batch
        total = len(first.texts)
        deadline = time.monotonic() + self.max_wait_s
        while total < self.max_batch:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                item = self._queue.get(timeout=timeout)
            except queue.Empty:
                break
            if item is None:
                self._queue.put(None)  # re-signal shutdown for the main loop
                break
            if item.op != "search" or total + len(item.texts) > self.max_batch:
                # admin op or would overflow: run it in the NEXT batch
                self._requeue = item
                break
            batch.append(item)
            total += len(item.texts)
        return batch

    def _consume(self) -> None:
        self._requeue: Optional[_Pending] = None
        while True:
            if self._requeue is not None:
                first, self._requeue = self._requeue, None
            else:
                item = self._queue.get()
                if item is None:
                    return
                first = item
            batch = self._drain(first)
            try:
                if batch[0].op != "search":
                    self._apply_admin(batch[0])
                    continue
                texts = [t for p in batch for t in p.texts]
                # bucket k to the next power of two for the same reason
                # as the batch bucket below (per-request k would compile
                # a program per distinct depth); results slice to each
                # request's own k
                k_req = max(p.k for p in batch)
                k_max = min(next_pow2(k_req), self.max_k, self.index.count)
                q = self.encoder.encode_queries(texts, batch_size=self.encode_batch)
                q = np.asarray(q)
                # bucket the device batch to the next power of two: every
                # distinct (batch, k) shape traces and compiles a fresh
                # program (minutes on a fresh TPU process) — coalescing
                # produces arbitrary sizes, so unbucketed serving would
                # recompile continually. Zero query rows are harmless.
                bucket = min(next_pow2(len(texts)), self.max_batch)
                if bucket > len(texts):
                    q = np.concatenate(
                        [q, np.zeros((bucket - len(texts), q.shape[1]), q.dtype)]
                    )
                if self.two_stage:
                    # ColBERT serving: MaxSim rerank needs query token
                    # embeddings; pad rows get zero-length masks (they
                    # score exact zeros — never outrank a real hit)
                    qt, ql = self.encoder.encode_queries_tokens(
                        texts, batch_size=self.encode_batch
                    )
                    qt, ql = np.asarray(qt), np.asarray(ql)
                    if bucket > len(texts):
                        pad = bucket - len(texts)
                        qt = np.concatenate(
                            [qt, np.zeros((pad,) + qt.shape[1:], qt.dtype)]
                        )
                        ql = np.concatenate([ql, np.zeros(pad, ql.dtype)])
                    scores, docids = self.index.search(
                        q, qt, ql, k_max, **self.index_search_kwargs
                    )
                    certified = None
                elif self.approx:
                    # same service-level kwargs (query_block, ...) as the
                    # exact branch — approx only selects the tier
                    scores, docids = self.index.search(
                        q, k_max,
                        approx=True if self.approx == "fast" else self.approx,
                        **self.index_search_kwargs,
                    )
                    certified = self.index.last_certified
                else:
                    scores, docids = self.index.search(
                        q, k_max, **self.index_search_kwargs
                    )
                    certified = None
                with self.stats._lock:
                    self.stats.batches += 1
                    self.stats.batched_queries += len(texts)
                off = 0
                for p in batch:
                    n = len(p.texts)
                    k = min(p.k, scores.shape[1])
                    res = [
                        [
                            {"docid": str(docids[off + i][j]),
                             "score": float(scores[off + i][j])}
                            for j in range(k)
                        ]
                        for i in range(n)
                    ]
                    if certified is not None:
                        res = [
                            {"hits": r, "certified": bool(certified[off + i])}
                            for i, r in enumerate(res)
                        ]
                    off += n
                    p.future.set_result(res)
            except Exception as exc:  # noqa: BLE001 — must not kill the consumer
                with self.stats._lock:
                    self.stats.errors += 1
                for p in batch:
                    if not p.future.done():
                        p.future.set_exception(exc)

    def _apply_admin(self, p: _Pending) -> None:
        if p.op == "add":
            docs = list(p.payload)
            texts = [d["text"] for d in docs]
            ids = [d["docid"] for d in docs]
            if self.two_stage:
                # one forward pass emits the dense row AND the token block
                dense, toks, lens = self.encoder.encode_documents_with_tokens(
                    texts, batch_size=self.encode_batch
                )
                self.index.add(np.asarray(dense), ids, np.asarray(toks), lens)
            else:
                # documents get the DOC-side encoder dialect (prompt
                # prefixes differ per family — reference encode_documents
                # vs encode_queries, `onepass_dense_mix_run_custom_lang.py:34-58`)
                enc = getattr(
                    self.encoder, "encode_documents", self.encoder.encode_queries
                )
                vecs = np.asarray(enc(texts, batch_size=self.encode_batch))
                self.index.add(vecs, ids)
            p.future.set_result({"added": len(docs), "count": self.index.count})
        elif p.op == "remove":
            n = self.index.remove(list(p.payload))
            p.future.set_result({"removed": n, "count": self.index.count})
        elif p.op == "save":
            self.index.save(p.payload[0])
            p.future.set_result(
                {"saved": p.payload[0], "count": self.index.count}
            )
        elif p.op == "reload":
            new = type(self.index).load(p.payload[0])
            if new.dim != self.index.dim:
                raise ValueError(
                    f"snapshot dim {new.dim} != serving dim {self.index.dim}"
                )
            # tuned kernel kwargs carry over; doc_scales is rebuilt by
            # to_device from the snapshot's own sidecar
            kw = {
                k: v for k, v in self.index.search_kwargs.items()
                if k != "doc_scales"
            }
            new.to_device(self.index.mesh, **kw)
            if self.approx in ("fast", "guaranteed"):
                new.enable_sketch()
            elif self.approx == "adaptive":
                # no sidecar, but reload the snapshot's persisted
                # adaptive operating points (tune --adaptive)
                new.load_adaptive_calibration()
            self.index = new  # old device buffers free on GC
            p.future.set_result(
                {"reloaded": p.payload[0], "count": self.index.count}
            )
        else:  # pragma: no cover - enqueue paths set valid ops
            p.future.set_exception(ValueError(f"unknown op {p.op!r}"))


# -------------------------------------------------------------- transport

class _Handler(BaseHTTPRequestHandler):
    service: SearchService = None  # type: ignore[assignment]
    server_info: dict = {}
    # generous default: the FIRST request at a fresh (batch, k) bucket
    # pays device compilation (minutes on remote-compile TPU setups)
    request_timeout_s: float = 600.0

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _reply(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self) -> None:  # noqa: N802 (stdlib API)
        if self.path != "/healthz":
            self._reply(404, {"error": f"unknown path {self.path!r}"})
            return
        info = dict(self.server_info)
        info.update(ok=True, stats=self.service.stats.snapshot())
        self._reply(200, info)

    def do_POST(self) -> None:  # noqa: N802
        if self.path not in ("/search", "/add", "/remove", "/save", "/reload"):
            self._reply(404, {"error": f"unknown path {self.path!r}"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
            if self.path == "/add":
                fut = self.service.submit_add(req.get("docs"))
            elif self.path == "/remove":
                fut = self.service.submit_remove(req.get("docids"))
            elif self.path == "/save":
                fut = self.service.submit_save(req.get("dir"))
            elif self.path == "/reload":
                fut = self.service.submit_reload(req.get("dir"))
            else:
                fut = self.service.submit(req.get("queries"), req.get("k"))
        except (ValueError, TypeError) as exc:
            self._reply(400, {"error": str(exc)})
            return
        try:
            results = fut.result(timeout=self.request_timeout_s)
        except FuturesTimeoutError:
            self._reply(503, {
                "error": f"timed out after {self.request_timeout_s:.0f}s "
                         "waiting for the device batch (first request per "
                         "batch/k bucket pays compilation)"
            })
            return
        except Exception as exc:  # noqa: BLE001
            self._reply(500, {"error": f"{type(exc).__name__}: {exc}"})
            return
        self._reply(200, {"results": results})


def make_server(
    service: SearchService,
    *,
    host: str = "127.0.0.1",
    port: int = 0,
    info: Optional[dict] = None,
    request_timeout_s: float = 600.0,
) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; ``server_address[1]`` holds the
    bound port (use port=0 for an ephemeral one)."""
    handler = type(
        "BoundHandler",
        (_Handler,),
        {
            "service": service,
            "server_info": dict(info or {}),
            "request_timeout_s": request_timeout_s,
        },
    )
    return ThreadingHTTPServer((host, port), handler)
