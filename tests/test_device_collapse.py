"""On-device collapse-max vs the host collapse oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from codemix_dense_retrieval_tpu.ops.collapse import collapse_topk_parallel_hub


def host_collapse(vals, gids, n_first, k_out):
    out_v, out_i = [], []
    for b in range(vals.shape[0]):
        best = {}
        for v, g in zip(vals[b], gids[b]):
            base = g - n_first if g >= n_first else g
            if base not in best or v > best[base]:
                best[base] = v
        items = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:k_out]
        vs = [v for _, v in items] + [-np.inf] * (k_out - len(items))
        ids = [i for i, _ in items] + [-1] * (k_out - len(items))
        out_v.append(vs)
        out_i.append(ids)
    return np.asarray(out_v), np.asarray(out_i)


def test_collapse_matches_host_oracle(rng):
    b, k, n_first = 6, 40, 1000
    gids = np.zeros((b, k), np.int32)
    vals = np.zeros((b, k), np.float32)
    for i in range(b):
        bases = rng.choice(1000, size=k // 2, replace=False)
        # each base appears under both languages with different scores
        g = np.concatenate([bases, bases + n_first])
        v = rng.standard_normal(k).astype(np.float32)
        order = np.argsort(-v)
        gids[i] = g[order]
        vals[i] = v[order]
    got_v, got_i = collapse_topk_parallel_hub(
        jnp.asarray(vals), jnp.asarray(gids), n_first, k_out=k // 2
    )
    ref_v, ref_i = host_collapse(vals, gids, n_first, k // 2)
    np.testing.assert_array_equal(np.asarray(got_i), ref_i)
    np.testing.assert_allclose(np.asarray(got_v), ref_v, rtol=1e-6)


def test_collapse_pads_when_fewer_bases(rng):
    vals = jnp.asarray([[3.0, 2.0, 1.0, 0.5]])
    gids = jnp.asarray([[5, 1005, 7, 1007]], jnp.int32)  # 2 distinct bases
    got_v, got_i = collapse_topk_parallel_hub(vals, gids, 1000, k_out=4)
    ids = np.asarray(got_i)[0]
    assert ids[0] == 5 and ids[1] == 7
    assert ids[2] == -1 and ids[3] == -1


def test_collapse_tie_breaks_by_base(rng):
    vals = jnp.asarray([[1.0, 1.0]])
    gids = jnp.asarray([[1009, 3]], jnp.int32)  # bases 9 and 3, tied scores
    _, got_i = collapse_topk_parallel_hub(vals, gids, 1000, k_out=2)
    assert list(np.asarray(got_i)[0]) == [3, 9]
