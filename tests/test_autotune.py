"""Autotune store + integration: the `tune` sweeps persist winners per
device kind and the auto pickers (`_auto_super_size`, flash dispatch,
two-level tile_b) consult them (utils/autotune.py)."""

import json

import numpy as np
import pytest

from codemix_dense_retrieval_tpu.utils import autotune


@pytest.fixture(autouse=True)
def _isolated_store(tmp_path, monkeypatch):
    path = tmp_path / "tuned.json"
    monkeypatch.setenv("CDR_TUNE_FILE", str(path))
    autotune.invalidate_cache()
    yield path
    autotune.invalidate_cache()


class TestStore:
    def test_missing_file_gives_defaults(self):
        assert autotune.get_tuned("topk.super_size") == 8
        assert autotune.get_tuned("flash.min_seq") == 512
        assert autotune.get_tuned("flash.window") == 2048

    def test_save_merge_and_depth_override(self, _isolated_store):
        autotune.save_tuned({"topk.super_size": 4})
        assert autotune.get_tuned("topk.super_size", k=1000) == 4
        autotune.save_tuned({"topk.super_size.k1000": 16})
        # per-depth key wins; other depths fall back to the bare key
        assert autotune.get_tuned("topk.super_size", k=1000) == 16
        assert autotune.get_tuned("topk.super_size", k=100) == 4
        # the file holds BOTH (merge, not overwrite)
        data = json.loads(_isolated_store.read_text())
        assert data == {"topk.super_size": 4, "topk.super_size.k1000": 16}

    def test_corrupt_file_ignored(self, _isolated_store):
        _isolated_store.write_text("{nope")
        autotune.invalidate_cache()
        assert autotune.get_tuned("topk.super_size") == 8

    def test_explicit_default_wins_over_builtin(self):
        assert autotune.get_tuned("topk.tile_b", default=256) == 256


class TestIntegration:
    def test_auto_super_size_consults_store(self):
        from codemix_dense_retrieval_tpu.ops.topk import _auto_super_size

        assert _auto_super_size(1000) == 8
        autotune.save_tuned({"topk.super_size.k1000": 4})
        assert _auto_super_size(1000) == 4
        assert _auto_super_size(500) == 8

    def test_two_level_exact_with_tuned_params(self):
        # private generator: the session-scoped `rng` fixture's stream
        # position feeds later modules' data — consuming it here would
        # shift their draws
        rng = np.random.default_rng(7)
        import jax.numpy as jnp

        from codemix_dense_retrieval_tpu.ops.topk import (
            topk_ip_bins_two_level,
            topk_ip_oracle,
        )

        autotune.save_tuned({"topk.super_size": 4, "topk.tile_b": 8})
        q = rng.standard_normal((4, 32)).astype(np.float32)
        d = rng.standard_normal((1024, 32)).astype(np.float32)
        vals, ids = topk_ip_bins_two_level(jnp.asarray(q), jnp.asarray(d), 300)
        ref_v, ref_i = topk_ip_oracle(q, d, 300)
        np.testing.assert_array_equal(np.asarray(ids), ref_i)
        np.testing.assert_allclose(np.asarray(vals), ref_v, rtol=1e-4, atol=1e-4)

    def test_flash_dispatch_consults_store(self, monkeypatch):
        rng = np.random.default_rng(11)
        import jax.numpy as jnp

        from codemix_dense_retrieval_tpu.ops import flash_attention as fa

        calls = {}
        real = fa.attention_flash

        def spy(*a, **kw):
            calls["flash"] = True
            return real(*a, **kw)

        monkeypatch.setattr(fa, "attention_flash", spy)
        q = jnp.asarray(rng.standard_normal((1, 64, 32)), jnp.float32)
        mask = jnp.ones((1, 64), jnp.int32)
        # default tuned min_seq=512 -> XLA path at S=64
        fa.multi_head_attention(q, q, q, mask, num_heads=2)
        assert "flash" not in calls
        autotune.save_tuned({"flash.min_seq": 32})
        fa.multi_head_attention(q, q, q, mask, num_heads=2)
        assert calls.get("flash")


class TestSweeps:
    def test_autotune_topk_tiny(self):
        out = autotune.autotune_topk(
            rows=2048, dim=32, batch=8, ks=(32,),
            super_sizes=(4,), tile_bs=(8,), iters=1,
        )
        assert out["topk.super_size.k32"] == 4
        assert out["topk.tile_b.k32"] == 8
        assert out["topk.qps.k32"] > 0

    def test_run_autotune_writes_store(self, _isolated_store):
        update = autotune.run_autotune(
            topk=True, flash=False,
            rows=2048, dim=32, batch=8, ks=(32,), iters=1,
        )
        assert _isolated_store.exists()
        data = json.loads(_isolated_store.read_text())
        for key, val in update.items():
            assert data[key] == val
        assert "_device" in data


class TestTileBVmemGate:
    """Tuned tile_b > 512 only applies on shards that can compile it:
    the remote TPU compiler scoped-vmem-OOMs every tb1024 two-level
    program at <= 524288 rows while compiling 1.1M fine
    (probe_vmem_boundary, bench_logs/r4i)."""

    def test_two_level_clamps_tuned_tile_b_on_small_shards(self, monkeypatch):
        from codemix_dense_retrieval_tpu.ops import topk

        autotune.save_tuned({"topk.tile_b.k300": 1024})
        seen = {}
        real = topk._prep_shard

        def spy(k, n_valid, tile_b, *a, **kw):
            seen["tile_b"] = tile_b
            return real(k, n_valid, tile_b, *a, **kw)

        monkeypatch.setattr(topk, "_prep_shard", spy)
        rng = np.random.default_rng(3)
        import jax.numpy as jnp

        q = jnp.asarray(rng.standard_normal((4, 32)).astype(np.float32))
        d = jnp.asarray(rng.standard_normal((2048, 32)).astype(np.float32))
        topk.topk_ip_bins_two_level(q, d, 300)
        assert seen["tile_b"] == 512  # clamped: 2048 rows < the boundary

        # explicit caller choice is never second-guessed
        topk.topk_ip_bins_two_level(q, d, 300, tile_b=1024)
        assert seen["tile_b"] == 1024

    def test_resolve_tile_b_gates_by_rows(self):
        from codemix_dense_retrieval_tpu.ops.topk import _TILE_B_1024_MIN_ROWS
        from codemix_dense_retrieval_tpu.parallel.sharded_search import (
            _resolve_tile_b,
        )

        autotune.save_tuned({"topk.tile_b.k100": 1024})
        assert _resolve_tile_b(None, 100, 256, _TILE_B_1024_MIN_ROWS) == 1024
        assert _resolve_tile_b(None, 100, 256, _TILE_B_1024_MIN_ROWS - 1) == 512
        # untuned depths keep the path default; explicit passes through
        assert _resolve_tile_b(None, 77, 256, 10**9) == 256
        assert _resolve_tile_b(768, 100, 256, 1) == 768
