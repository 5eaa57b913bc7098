"""Orbax parameter checkpoint roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from codemix_dense_retrieval_tpu.models.checkpoint import (
    load_params_orbax,
    save_params_orbax,
)
from codemix_dense_retrieval_tpu.models.xlmr import XLMRConfig, XLMREncoder


def test_orbax_roundtrip(tmp_path):
    cfg = XLMRConfig.tiny()
    model = XLMREncoder(cfg)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32)
    )
    save_params_orbax(tmp_path / "ckpt", params)
    loaded = load_params_orbax(tmp_path / "ckpt")
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(loaded)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
