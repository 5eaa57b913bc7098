"""Encoder-stack tests: flash-attention vs XLA oracle, HF torch conversion
parity, pooling modes, dialects, tokenizer, TextEncoder facade."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from codemix_dense_retrieval_tpu.models.dialects import (
    detect_encoder_family,
    default_pooling,
    doc_prefix,
    query_prefix,
)
from codemix_dense_retrieval_tpu.models.tokenizer import HashTokenizer, bucket_length
from codemix_dense_retrieval_tpu.models.xlmr import (
    XLMRConfig,
    XLMREncoder,
    pool_and_normalize,
    position_ids_from_input_ids,
)
from codemix_dense_retrieval_tpu.ops.flash_attention import (
    attention_flash,
    attention_xla,
    multi_head_attention,
)


class TestFlashAttention:
    @pytest.mark.parametrize("s,block", [(32, 16), (48, 16), (128, 64)])
    def test_flash_matches_xla(self, rng, s, block):
        b, h, dh = 3, 4, 32
        q = rng.standard_normal((b, h, s, dh)).astype(np.float32)
        k = rng.standard_normal((b, h, s, dh)).astype(np.float32)
        v = rng.standard_normal((b, h, s, dh)).astype(np.float32)
        lengths = np.array([s, s // 2, 5], np.int32)
        ref = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lengths))
        out = attention_flash(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lengths),
            block_q=block, block_k=block,
        )
        # only the valid query rows matter (pad rows are dropped by pooling)
        for i, L in enumerate(lengths):
            np.testing.assert_allclose(
                np.asarray(out)[i, :, :L], np.asarray(ref)[i, :, :L], rtol=2e-4, atol=2e-4
            )

    def test_multi_head_wrapper_flash_vs_xla(self, rng):
        b, s, d, h = 2, 40, 64, 4
        q = rng.standard_normal((b, s, d)).astype(np.float32)
        k = rng.standard_normal((b, s, d)).astype(np.float32)
        v = rng.standard_normal((b, s, d)).astype(np.float32)
        mask = np.zeros((b, s), np.int32)
        mask[0, :s] = 1
        mask[1, :17] = 1
        o1 = multi_head_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
            num_heads=h, use_flash=True, flash_min_seq=0,  # force the kernel
        )
        o2 = multi_head_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
            num_heads=h, use_flash=False,
        )
        np.testing.assert_allclose(
            np.asarray(o1)[0], np.asarray(o2)[0], rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(o1)[1, :17], np.asarray(o2)[1, :17], rtol=2e-4, atol=2e-4
        )


class TestPositionIds:
    def test_roberta_offsets(self):
        ids = jnp.asarray([[0, 5, 6, 2, 1, 1]])  # bos tok tok eos pad pad
        pos = position_ids_from_input_ids(ids, pad_token_id=1)
        np.testing.assert_array_equal(np.asarray(pos), [[2, 3, 4, 5, 1, 1]])


class TestPooling:
    def test_modes(self, rng):
        hidden = jnp.asarray(rng.standard_normal((2, 4, 8)).astype(np.float32))
        mask = jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]])
        cls = pool_and_normalize(hidden, mask, "cls", False)
        np.testing.assert_allclose(np.asarray(cls), np.asarray(hidden)[:, 0], rtol=1e-6)
        mean = pool_and_normalize(hidden, mask, "mean", False)
        exp0 = np.asarray(hidden)[0, :3].mean(axis=0)
        np.testing.assert_allclose(np.asarray(mean)[0], exp0, rtol=1e-5)
        last = pool_and_normalize(hidden, mask, "last_token", False)
        np.testing.assert_allclose(np.asarray(last)[0], np.asarray(hidden)[0, 2], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(last)[1], np.asarray(hidden)[1, 1], rtol=1e-6)

    def test_normalized(self, rng):
        hidden = jnp.asarray(rng.standard_normal((3, 4, 8)).astype(np.float32))
        mask = jnp.ones((3, 4), jnp.int32)
        out = pool_and_normalize(hidden, mask, "mean", True)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, rtol=1e-5)


class TestHFConversionParity:
    """SURVEY §7 hard part: weight conversion + numerics. A tiny
    XLMRobertaModel built in-process (offline) is the oracle."""

    @pytest.fixture(scope="class")
    def torch_and_flax(self):
        import torch
        from transformers import XLMRobertaConfig, XLMRobertaModel

        from codemix_dense_retrieval_tpu.models.convert import convert_xlmr_state_dict

        torch.manual_seed(0)
        hf_cfg = XLMRobertaConfig(
            vocab_size=120, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=66, type_vocab_size=1, pad_token_id=1,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        )
        tm = XLMRobertaModel(hf_cfg).eval()
        cfg = XLMRConfig.tiny(
            vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64, max_position_embeddings=66, use_flash=False,
        )
        params = convert_xlmr_state_dict(tm.state_dict(), cfg)
        return tm, cfg, params

    def test_hidden_states_match_torch(self, torch_and_flax, rng):
        import torch

        tm, cfg, params = torch_and_flax
        ids = rng.integers(3, 119, size=(2, 10)).astype(np.int64)
        ids[:, 0] = 0
        ids[0, -3:] = 1  # pad tail
        mask = (ids != 1).astype(np.int64)
        with torch.no_grad():
            ref = tm(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).last_hidden_state.numpy()
        model = XLMREncoder(cfg)
        got = np.asarray(
            model.apply(params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
                        method=model.hidden_states)
        )
        valid = mask.astype(bool)
        np.testing.assert_allclose(got[valid], ref[valid], rtol=2e-4, atol=2e-4)

    def test_flash_attention_e2e_matches_torch(self, torch_and_flax, rng):
        """Same conversion but with the flash kernel in the layers."""
        import dataclasses

        import torch

        tm, cfg, params = torch_and_flax
        cfg_flash = dataclasses.replace(cfg, use_flash=True)
        ids = rng.integers(3, 119, size=(2, 12)).astype(np.int64)
        ids[:, 0] = 0
        ids[1, -5:] = 1
        mask = (ids != 1).astype(np.int64)
        with torch.no_grad():
            ref = tm(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).last_hidden_state.numpy()
        model = XLMREncoder(cfg_flash)
        got = np.asarray(
            model.apply(params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
                        method=model.hidden_states)
        )
        valid = mask.astype(bool)
        np.testing.assert_allclose(got[valid], ref[valid], rtol=5e-4, atol=5e-4)

    def test_cls_pooled_normalized(self, torch_and_flax, rng):
        tm, cfg, params = torch_and_flax
        ids = rng.integers(3, 119, size=(3, 8)).astype(np.int64)
        ids[:, 0] = 0
        mask = np.ones_like(ids)
        model = XLMREncoder(cfg)
        out = np.asarray(model.apply(params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)))
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)


class TestNpzRoundtrip:
    def test_params_npz(self, tmp_path, rng):
        from codemix_dense_retrieval_tpu.models.convert import load_params_npz, save_params_npz

        cfg = XLMRConfig.tiny()
        model = XLMREncoder(cfg)
        params = model.init(
            jax.random.key(0), jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32)
        )
        save_params_npz(tmp_path / "p.npz", params)
        loaded = load_params_npz(tmp_path / "p.npz")
        leaves1 = jax.tree_util.tree_leaves(params)
        leaves2 = jax.tree_util.tree_leaves(loaded)
        assert len(leaves1) == len(leaves2)
        flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
        flat2 = dict(
            ("/".join(str(getattr(k, "key", k)) for k in kp), v)
            for kp, v in jax.tree_util.tree_flatten_with_path(loaded)[0]
        )
        for kp, v in flat1:
            name = "/".join(str(getattr(k, "key", k)) for k in kp)
            np.testing.assert_array_equal(np.asarray(v), flat2[name])


class TestDialects:
    def test_families(self):
        assert detect_encoder_family("BAAI/bge-m3") == "default"
        assert detect_encoder_family("intfloat/multilingual-e5-large") == "e5"
        assert detect_encoder_family("intfloat/multilingual-e5-large-instruct") == "e5-instruct"
        assert detect_encoder_family("Qwen/Qwen3-Embedding-0.6B") == "qwen3"
        assert detect_encoder_family("jinaai/jina-embeddings-v3") == "jina-v3"

    def test_prefixes(self):
        assert query_prefix("BAAI/bge-m3") == ""
        assert query_prefix("intfloat/multilingual-e5-large") == "query: "
        assert doc_prefix("intfloat/multilingual-e5-large") == "passage: "
        assert query_prefix("intfloat/multilingual-e5-large-instruct").startswith("Instruct:")
        assert doc_prefix("BAAI/bge-m3") == ""

    def test_default_pooling(self):
        assert default_pooling("BAAI/bge-m3") == "cls"
        assert default_pooling("intfloat/multilingual-e5-large") == "mean"
        assert default_pooling("Qwen/Qwen3-Embedding-4B") == "last_token"


class TestTokenizer:
    def test_hash_tokenizer_deterministic(self):
        tok = HashTokenizer(vocab_size=1000)
        ids1, m1 = tok.encode_batch(["hello world", "hello"])
        ids2, m2 = tok.encode_batch(["hello world", "hello"])
        np.testing.assert_array_equal(ids1, ids2)
        assert ids1[0, 0] == 0  # bos
        assert ids1[0, 3] == 2  # eos after 2 tokens
        assert ids1[1, 3] == 1  # pad
        np.testing.assert_array_equal(m1[1], [1, 1, 1, 0])

    def test_truncation(self):
        tok = HashTokenizer(vocab_size=1000)
        ids, mask = tok.encode_batch(["a " * 100], max_length=16)
        assert ids.shape[1] == 16
        assert ids[0, -1] == 2  # eos kept at truncation point

    def test_bucketing(self):
        assert bucket_length(5) == 16
        assert bucket_length(100) == 128
        assert bucket_length(1000) == 512

    @staticmethod
    def _tiny_hf_tok():
        from tokenizers import Tokenizer
        from tokenizers.models import WordLevel
        from tokenizers.pre_tokenizers import Whitespace
        from tokenizers.processors import TemplateProcessing

        vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3, "a": 4, "b": 5, "c": 6}
        tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
        tok.pre_tokenizer = Whitespace()
        tok.post_processor = TemplateProcessing(
            single="<s> $A </s>", special_tokens=[("<s>", 0), ("</s>", 2)]
        )
        return tok

    def test_hf_truncation_preserves_eos(self):
        """Over-length texts must keep the post-processor EOS (the HF fast
        tokenizer truncates BEFORE post-processing; a bare ids slice after
        the fact drops </s> and diverges — ADVICE r1 #4)."""
        from codemix_dense_retrieval_tpu.models.tokenizer import HFTokenizer

        t = HFTokenizer(self._tiny_hf_tok(), pad_id=1)
        ids, mask = t.encode_batch(["a b c a b c a b"], max_length=5)
        assert ids.shape[1] == 5
        assert ids[0, 0] == 0 and ids[0, -1] == 2
        assert mask[0].sum() == 5
        # truncation state must not leak into later unbounded calls
        ids2, _ = t.encode_batch(["a b c"])
        assert ids2[0].tolist() == [0, 4, 5, 6, 2]


class TestTextEncoder:
    def test_encode_shapes_and_norms(self):
        from codemix_dense_retrieval_tpu.models.encoder import TextEncoder

        cfg = XLMRConfig.tiny(use_flash=False)
        enc = TextEncoder("BAAI/bge-m3", cfg, tokenizer=HashTokenizer(vocab_size=100, max_length=32))
        vecs = enc.encode_queries(["hello world", "你好 世界", "third query"], batch_size=2)
        assert vecs.shape == (3, cfg.hidden_size)
        np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, rtol=1e-4)

    def test_same_text_same_vector_across_batches(self):
        from codemix_dense_retrieval_tpu.models.encoder import TextEncoder

        cfg = XLMRConfig.tiny(use_flash=False)
        enc = TextEncoder("BAAI/bge-m3", cfg, tokenizer=HashTokenizer(vocab_size=100, max_length=32))
        a = enc.encode_queries(["same text", "other"], batch_size=2)
        b = enc.encode_queries(["same text"], batch_size=1)
        np.testing.assert_allclose(a[0], b[0], atol=1e-5)

    def test_phase_stats_attribute_the_pipeline(self):
        """Every encode call leaves per-phase walls in last_phase_stats
        (tokenize/dispatch/readback seams — VERDICT r3 item 7)."""
        from codemix_dense_retrieval_tpu.models.encoder import TextEncoder

        cfg = XLMRConfig.tiny(use_flash=False)
        enc = TextEncoder("BAAI/bge-m3", cfg, tokenizer=HashTokenizer(vocab_size=100, max_length=32))
        assert enc.last_phase_stats is None
        enc.encode_documents([f"text number {i}" for i in range(10)], batch_size=4)
        st = enc.last_phase_stats
        assert st["batches"] == 3
        assert st["wall"] > 0 and st["tokenize_work"] > 0
        # seams the main thread blocks on cannot exceed the total wall
        # (job_iter already includes tokenize_wait: the prefetch drain
        # happens inside the generator step)
        assert st["tokenize_wait"] <= st["job_iter"] + 1e-6
        assert st["job_iter"] + st["readback_wait"] <= st["wall"] + 1e-6
        # stats reset per call
        enc.encode_queries(["one more"], batch_size=4)
        assert enc.last_phase_stats["batches"] == 1


class TestCausalFlash:
    @pytest.mark.parametrize("s,block", [(32, 16), (48, 16)])
    def test_causal_flash_matches_xla(self, rng, s, block):
        from codemix_dense_retrieval_tpu.ops.flash_attention import (
            attention_flash,
            attention_xla,
        )

        b, h, dh = 2, 4, 16
        q = rng.standard_normal((b, h, s, dh)).astype(np.float32)
        k = rng.standard_normal((b, h, s, dh)).astype(np.float32)
        v = rng.standard_normal((b, h, s, dh)).astype(np.float32)
        lengths = np.array([s, s - 7], np.int32)
        ref = attention_xla(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lengths),
            causal=True,
        )
        out = attention_flash(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lengths),
            block_q=block, block_k=block, causal=True,
        )
        for i, L in enumerate(lengths):
            np.testing.assert_allclose(
                np.asarray(out)[i, :, :L], np.asarray(ref)[i, :, :L], rtol=2e-4, atol=2e-4
            )


class TestQwen3Flash:
    def test_qwen3_flash_matches_xla_attention(self, rng):
        import dataclasses

        from codemix_dense_retrieval_tpu.models.qwen3 import Qwen3Config, Qwen3Encoder

        cfg = Qwen3Config.tiny()
        cfg_flash = dataclasses.replace(cfg, use_flash=True)
        ids = jnp.asarray(rng.integers(3, 99, size=(2, 12)), jnp.int32)
        mask = jnp.ones_like(ids)
        import jax

        m1 = Qwen3Encoder(cfg)
        params = m1.init(jax.random.key(0), ids, mask)
        out1 = np.asarray(m1.apply(params, ids, mask))
        m2 = Qwen3Encoder(cfg_flash)
        out2 = np.asarray(m2.apply(params, ids, mask))
        np.testing.assert_allclose(out1, out2, rtol=3e-4, atol=3e-4)


class TestDataParallelEncode:
    """DP corpus encode over the mesh (SURVEY §2.3: batch sharded over
    devices, params replicated — the run_encode_index_groups.sh analog)."""

    def _encoder(self, mesh=None):
        import jax.numpy as jnp

        from codemix_dense_retrieval_tpu.models.encoder import TextEncoder
        from codemix_dense_retrieval_tpu.models.tokenizer import HashTokenizer
        from codemix_dense_retrieval_tpu.models.xlmr import XLMRConfig

        cfg = XLMRConfig.tiny(
            vocab_size=5000, hidden_size=32, num_heads=4, intermediate_size=64,
            use_flash=False, dtype=jnp.float32,
        )
        return TextEncoder(
            "BAAI/bge-m3", cfg, tokenizer=HashTokenizer(5000, 32), mesh=mesh,
        )

    def test_dp_matches_single_device(self, eight_cpu_devices):
        from codemix_dense_retrieval_tpu.parallel import make_mesh

        texts = [f"passage number {i} tok{i % 7}" for i in range(19)]
        single = self._encoder()
        mesh = make_mesh(shard=8, tp=1, devices=eight_cpu_devices)
        dp = self._encoder(mesh=mesh)
        dp.params = single.params  # same weights (device_put re-placement)
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        dp.params = jax.device_put(single.params, NamedSharding(mesh, P()))
        ref = single.encode_documents(texts, batch_size=8)
        got = dp.encode_documents(texts, batch_size=8)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_dp_batch_is_sharded(self, eight_cpu_devices):
        """The jitted forward's inputs really split over the shard axis."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from codemix_dense_retrieval_tpu.parallel import make_mesh

        mesh = make_mesh(shard=8, tp=1, devices=eight_cpu_devices)
        enc = self._encoder(mesh=mesh)
        assert enc._dp == 8
        # batch rounds up to a multiple of dp
        out = enc.encode_documents(["x"] * 3, batch_size=3)  # -> batch 8
        assert out.shape == (3, 32)
        # output sharding of the forward is batch-split
        ids = jnp.zeros((8, 16), jnp.int32)
        mask = jnp.ones((8, 16), jnp.int32)
        res = enc._fwd(enc.params, ids, mask, jnp.asarray(0, jnp.int32))
        assert res.sharding.is_equivalent_to(
            NamedSharding(mesh, P("shard", None)), res.ndim
        )
        # params replicated
        leaf = jax.tree.leaves(enc.params)[0]
        assert leaf.sharding.is_equivalent_to(NamedSharding(mesh, P()), leaf.ndim)


def test_length_sorted_batching_restores_order():
    """Encode with wildly mixed lengths: length-sorted batching must return
    rows in INPUT order, matching a one-text-at-a-time encode."""
    import numpy as np

    from codemix_dense_retrieval_tpu.models.encoder import TextEncoder
    from codemix_dense_retrieval_tpu.models.tokenizer import HashTokenizer
    from codemix_dense_retrieval_tpu.models.xlmr import XLMRConfig

    cfg = XLMRConfig.tiny(vocab_size=2000, hidden_size=32, use_flash=False)
    enc = TextEncoder("BAAI/bge-m3", cfg,
                      tokenizer=HashTokenizer(vocab_size=2000, max_length=64))
    texts = [
        " ".join(f"w{i}{j}" for j in range(1 + (i * 7) % 40)) for i in range(17)
    ]
    batched = enc.encode_documents(texts, batch_size=4)
    singles = np.stack([enc.encode_documents([t])[0] for t in texts])
    np.testing.assert_allclose(batched, singles, rtol=2e-4, atol=2e-4)

    toks, lens = enc.encode_documents_tokens(texts, batch_size=4)
    assert toks.shape[0] == 17
    # per-text token lengths must line up with input order
    ids_i, _ = enc.tokenizer.encode_batch([texts[3]], 64)
    assert lens[3] == ids_i.shape[1]

    dense, toks2, lens2 = enc.encode_documents_with_tokens(texts, batch_size=4)
    np.testing.assert_allclose(dense, batched, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(lens2, lens)


def test_overlap_read_order_window_and_errors():
    """_overlap_read must return results in job order, keep at most
    _PREFETCH_DEPTH+1 jobs in flight (bounds device-resident outputs),
    and propagate reader exceptions."""
    import threading

    from codemix_dense_retrieval_tpu.models.encoder import TextEncoder
    from codemix_dense_retrieval_tpu.models.tokenizer import HashTokenizer
    from codemix_dense_retrieval_tpu.models.xlmr import XLMRConfig

    cfg = XLMRConfig.tiny(vocab_size=100, hidden_size=16, use_flash=False)
    enc = TextEncoder("BAAI/bge-m3", cfg,
                      tokenizer=HashTokenizer(vocab_size=100, max_length=32))

    in_flight = {"now": 0, "max": 0}
    lock = threading.Lock()

    def read(i):
        with lock:
            in_flight["now"] -= 1
        return i * 10

    def jobs():
        for i in range(25):
            with lock:
                in_flight["now"] += 1
                in_flight["max"] = max(in_flight["max"], in_flight["now"])
            yield read, (i,)

    out = enc._overlap_read(jobs())
    assert out == [i * 10 for i in range(25)]
    # "submitted but not yet read" never exceeds the prefetch window + 1
    assert in_flight["max"] <= enc._PREFETCH_DEPTH + 1

    assert enc._overlap_read(iter(())) == []

    def boom(_):
        raise ValueError("reader failed")

    import pytest

    with pytest.raises(ValueError, match="reader failed"):
        enc._overlap_read(iter([(boom, (0,))]))


def test_attention_multi_window_matches_xla(rng):
    """The grid's key axis walks (window)-sized K/V slabs with an inner
    sub-block loop; force several windows x several sub-blocks each and
    check parity against the XLA oracle with ragged lengths + causal."""
    import jax.numpy as jnp

    from codemix_dense_retrieval_tpu.ops.flash_attention import (
        attention_flash,
        attention_xla,
    )

    b, h, s, dh = 2, 2, 128, 16
    q = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    lengths = np.array([s, 71], np.int32)  # 71 ends mid-sub-block, window 2
    for causal in (False, True):
        ref = np.asarray(attention_xla(q, k, v, jnp.asarray(lengths), causal=causal))
        out = np.asarray(attention_flash(
            q, k, v, jnp.asarray(lengths),
            block_q=16, block_k=16, window=32,  # 4 windows x 2 sub-blocks
            causal=causal,
        ))
        for i, L in enumerate(lengths):
            np.testing.assert_allclose(
                out[i, :, :L], ref[i, :, :L], rtol=2e-4, atol=2e-4
            )


def test_attention_gqa_matches_repeated_heads(rng):
    """GQA: the flash kernel maps q heads onto kv heads in its index_map
    instead of materializing repeated K/V — parity vs the repeat oracle."""
    import jax.numpy as jnp

    from codemix_dense_retrieval_tpu.ops.flash_attention import (
        attention_flash,
        attention_xla,
    )

    b, h, kvh, s, dh = 2, 4, 2, 96, 16
    q = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, kvh, s, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, kvh, s, dh)), jnp.float32)
    lengths = np.array([s, 41], np.int32)
    krep = jnp.repeat(k, h // kvh, axis=1)
    vrep = jnp.repeat(v, h // kvh, axis=1)
    for causal in (False, True):
        ref = np.asarray(attention_xla(
            q, krep, vrep, jnp.asarray(lengths), causal=causal))
        # the xla oracle must also accept raw GQA heads
        ref2 = np.asarray(attention_xla(
            q, k, v, jnp.asarray(lengths), causal=causal))
        np.testing.assert_allclose(ref2, ref, rtol=1e-6, atol=1e-6)
        out = np.asarray(attention_flash(
            q, k, v, jnp.asarray(lengths),
            block_q=16, block_k=16, window=32, causal=causal,
        ))
        for i, L in enumerate(lengths):
            np.testing.assert_allclose(
                out[i, :, :L], ref[i, :, :L], rtol=2e-4, atol=2e-4
            )
    with pytest.raises(ValueError, match="not a multiple"):
        attention_flash(q, krep[:, :3], vrep[:, :3], jnp.asarray(lengths))


def test_attention_zero_length_rows_are_zero(rng):
    """A fully-masked sequence (length 0, e.g. an all-pad batch slot)
    must produce ZERO attention output in both paths — the naive online
    softmax would emit mean-of-V garbage."""
    import jax.numpy as jnp

    from codemix_dense_retrieval_tpu.ops.flash_attention import (
        attention_flash,
        attention_xla,
    )

    b, h, s, dh = 3, 2, 64, 16
    q = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.float32)
    lengths = jnp.asarray([s, 0, 5], jnp.int32)
    for causal in (False, True):
        ox = np.asarray(attention_xla(q, k, v, lengths, causal=causal))
        of = np.asarray(attention_flash(
            q, k, v, lengths, block_q=16, block_k=16, causal=causal,
        ))
        assert np.all(ox[1] == 0), "xla zero-length row must be zero"
        assert np.all(of[1] == 0), "flash zero-length row must be zero"
        np.testing.assert_allclose(of[0], ox[0], atol=2e-5, rtol=2e-5)
        np.testing.assert_allclose(
            of[2, :, :5], ox[2, :, :5], atol=2e-5, rtol=2e-5
        )
