"""Multi-host helper tests (single-process degradations)."""

import os

import pytest

from codemix_dense_retrieval_tpu.parallel.multihost import (
    initialize_multihost,
    process_local_rows,
)


def test_initialize_noop_without_env(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert initialize_multihost() is False


def test_initialize_noop_single_process(monkeypatch):
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
    assert initialize_multihost() is False


def test_process_local_rows_single_process():
    # single process owns all devices -> rows start at 0
    r = process_local_rows(n_total=1000, rows_per_shard=128)
    assert r.start == 0
    assert r.stop <= 1000
    assert len(r) > 0
