"""ctypes bindings for the native fast-IO library (native/fastio.cpp).

Build with ``make -C native`` (or ``python -m codemix_dense_retrieval_tpu.io._fastio``
which shells out to make). All entry points degrade gracefully: callers in
``io.trec`` fall back to pure Python when the library is missing.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional, Sequence

import numpy as np

_SO_PATH = pathlib.Path(__file__).with_name("libfastio.so")
_LIB: Optional[ctypes.CDLL] = None
_LOAD_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LOAD_TRIED
    if _LOAD_TRIED:
        return _LIB
    _LOAD_TRIED = True
    if not _SO_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
        lib.fastio_write_run.restype = ctypes.c_long
        lib.fastio_write_run.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_char_p,
            ctypes.c_int,
        ]
        lib.fastio_collapse_run_max.restype = ctypes.c_int
        lib.fastio_collapse_run_max.argtypes = [ctypes.c_char_p] * 3
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _lib() is not None


def build(quiet: bool = True) -> bool:
    """Compile the shared library with make; returns success."""
    native_dir = pathlib.Path(__file__).resolve().parents[2] / "native"
    if not (native_dir / "Makefile").exists():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(native_dir)],
            check=True,
            capture_output=quiet,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    global _LOAD_TRIED, _LIB
    _LOAD_TRIED = False
    _LIB = None
    return available()


def write_run(
    path: str,
    qids: Sequence[str],
    docids: Sequence[Sequence[str]],
    scores: np.ndarray,
    tag: str,
    precision: int,
) -> int:
    lib = _lib()
    if lib is None:
        return -1
    nq = len(qids)
    if nq == 0:
        pathlib.Path(path).write_text("")
        return 0
    k = len(docids[0])
    qid_arr = (ctypes.c_char_p * nq)(*[q.encode() for q in qids])
    flat_docs = [d.encode() for row in docids for d in row]
    if len(flat_docs) != nq * k:
        return -1  # ragged rows: let the Python path handle it
    doc_arr = (ctypes.c_char_p * (nq * k))(*flat_docs)
    sc = np.ascontiguousarray(scores, dtype=np.float32)
    if sc.shape != (nq, k):
        return -1
    return lib.fastio_write_run(
        path.encode(),
        qid_arr,
        nq,
        doc_arr,
        sc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        k,
        tag.encode(),
        precision,
    )


def collapse_run_max(in_path: str, out_path: str, tag: str) -> bool:
    lib = _lib()
    if lib is None:
        return False
    return bool(lib.fastio_collapse_run_max(in_path.encode(), out_path.encode(), tag.encode()))


if __name__ == "__main__":
    ok = build(quiet=False)
    print("fastio built:", ok, "->", _SO_PATH)
