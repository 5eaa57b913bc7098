"""Mix counter and band generator tests (offline, injectable generator)."""

import numpy as np
import pytest

from codemix_dense_retrieval_tpu.datagen.bands import (
    BandState,
    DEFAULT_BANDS,
    adaptive_k,
    band_of,
    generate_band_dataset,
    generate_bands_for_pair,
)
from codemix_dense_retrieval_tpu.datagen.mix_count import (
    count_two_langs,
    mix_ratio,
    split_script_runs,
    tokenize,
)


class TestMixCount:
    def test_pure_english(self):
        a, b = count_two_langs("where do black widow spiders live")
        assert a == 6 and b == 0

    def test_pure_chinese_char_weighted(self):
        a, b = count_two_langs("黑寡妇蜘蛛住在哪里")
        assert a == 0 and b == 9

    def test_mixed_reference_style(self):
        # the shipped band file example: "Where do black widow 蜘蛛 live in the US?"
        a, b = count_two_langs("Where do black widow 蜘蛛 live in the US")
        assert b == 2  # two Han chars
        assert a == 8

    def test_script_run_splitting(self):
        assert split_script_runs("widow蜘蛛live") == ["widow", "蜘蛛", "live"]

    def test_urls_and_numbers_filtered(self):
        toks = tokenize("see https://example.com/page 42 100% items")
        assert "42" not in toks and not any("http" in t for t in toks)
        assert "items" in toks and "see" in toks

    def test_mix_ratio(self):
        assert mix_ratio("hello world") == 0.0
        assert mix_ratio("你好") == 100.0
        r = mix_ratio("hello 你好")  # 1 latin word, 2 han chars
        assert r == pytest.approx(100 * 2 / 3)
        assert mix_ratio("42 100%") is None

    def test_arabic_russian_scripts(self):
        a, b = count_two_langs("hello мир", "en", "ru")
        assert a == 1 and b == 1
        a, b = count_two_langs("hello مرحبا", "en", "ar")
        assert a == 1 and b == 1

    def test_classifier_hook_for_same_script(self):
        clf = lambda tok: "es" if tok in {"hola", "mundo"} else "en"
        a, b = count_two_langs("hello hola mundo", "en", "es", classifier=clf)
        assert a == 1 and b == 2


def fake_generator(en_text, zh_text, targets, k):
    """Deterministic mixed candidates: swap a fraction of EN words to ZH chars."""
    en_words = en_text.split()
    out = []
    for t in targets:
        for j in range(k):
            n_total = len(en_words)
            # aim for t% chinese by words: x chinese chars vs remaining en words
            n_zh = max(0, min(n_total, round(n_total * t / 100.0) + (j % 2)))
            mixed = " ".join(["中"] * n_zh + en_words[n_zh:])
            out.append(mixed)
    return out


class TestBands:
    def test_band_of(self):
        assert band_of(0, DEFAULT_BANDS) == (0, 20)
        assert band_of(19.9, DEFAULT_BANDS) == (0, 20)
        assert band_of(20, DEFAULT_BANDS) == (20, 40)
        assert band_of(100, DEFAULT_BANDS) == (80, 100)
        assert band_of(150, DEFAULT_BANDS) is None

    def test_adaptive_k_grows(self):
        assert adaptive_k(0) == 3
        assert adaptive_k(1) == 6
        assert adaptive_k(5) == 10  # capped

    def test_pair_fills_all_bands(self):
        state = BandState(DEFAULT_BANDS)
        en = "where do black widow spiders live in the united states today"
        zh = "黑寡妇蜘蛛如今住在美国哪里"
        filled = generate_bands_for_pair("q1", en, zh, state, fake_generator)
        assert not state.missing_bands("q1")
        assert filled == 5
        # endpoint bands hold the monolingual texts
        assert state.rows[(0, 20)]["q1"] == en
        assert state.rows[(80, 100)]["q1"] == zh

    def test_dataset_resume_and_artifacts(self, tmp_path):
        pairs = [
            (f"q{i}", "ten little words make up this english query sentence here",
             "十个中文词组成这个查询") for i in range(6)
        ]
        state = generate_band_dataset(pairs, tmp_path, fake_generator, checkpoint_every=2)
        for lo, hi in DEFAULT_BANDS:
            f = tmp_path / f"queries-cm{lo}-{hi}.tsv"
            assert f.exists()
            assert len(f.read_text().splitlines()) == 6
        common = (tmp_path / "qids-common.tsv").read_text().split()
        assert len(common) == 6

        # resume: a generator that would blow up must never be called
        def explode(*a):
            raise AssertionError("should not re-generate on resume")

        state2 = generate_band_dataset(pairs, tmp_path, explode)
        assert state2.common_qids() == state.common_qids()

    def test_opportunistic_filing(self):
        state = BandState(DEFAULT_BANDS)
        # a 50% candidate fills 40-60 even if we asked for something else
        assert state.file_candidate("q1", "foo 中", 50.0) == (40, 60)
        # second 50% candidate is NOT refiled
        assert state.file_candidate("q1", "bar 中", 55.0) is None


def test_usage_tracker():
    from types import SimpleNamespace

    from codemix_dense_retrieval_tpu.datagen.bands import UsageTracker

    t = UsageTracker(prompt_usd_per_1m=0.25, completion_usd_per_1m=2.0)
    t.add(SimpleNamespace(prompt_tokens=1000, completion_tokens=500))
    t.add(SimpleNamespace(prompt_tokens=2000, completion_tokens=1500))
    t.add(None)
    s = t.summary()
    assert s["calls"] == 3
    assert s["prompt_tokens"] == 3000 and s["completion_tokens"] == 2000
    assert s["cost_usd"] == round((3000 * 0.25 + 2000 * 2.0) / 1e6, 4)


class TestKAdaptation:
    """Miss-driven K adaptation + one-call JSON protocol
    (`generate_cm_bands.py:146-171,370-487`)."""

    def test_initial_k_midpoint(self):
        from codemix_dense_retrieval_tpu.datagen.bands import initial_k_for_band

        assert initial_k_for_band(40, 60, 10) == 5
        assert initial_k_for_band(0, 20, 10) == 1    # clamped up from 1
        assert initial_k_for_band(80, 100, 10) == 9  # clamped to n-1
        assert initial_k_for_band(40, 60, 1) == 1

    def test_adjust_k_moves_toward_band(self):
        from codemix_dense_retrieval_tpu.datagen.bands import adjust_k

        # undershoot: ratio 10 below band 40-60 -> K grows by >= 1
        assert adjust_k(3, 10.0, 40, 60, 10) == 6  # ceil(30/100*10)=3 -> 3+3
        # overshoot: ratio 90 above band 40-60 -> K shrinks
        assert adjust_k(8, 90.0, 40, 60, 10) == 5  # ceil(30/100*10)=3 -> 8-3
        # tiny miss still moves by at least one word
        assert adjust_k(5, 39.9, 40, 60, 10) == 6
        assert adjust_k(5, 60.1, 40, 60, 10) == 4
        # inside the band: unchanged
        assert adjust_k(5, 50.0, 40, 60, 10) == 5
        # clamps
        assert adjust_k(1, 95.0, 0, 20, 10) == 1 or adjust_k(1, 95.0, 0, 20, 10) >= 1
        assert adjust_k(9, 0.0, 80, 100, 10) == 9  # already n-1

    def test_kadapt_loop_converges(self):
        """Fake backend honoring K: replaces the last K EN words with ZH
        words — the loop must fill every band via K adjustment."""
        from codemix_dense_retrieval_tpu.datagen.bands import (
            BandState, DEFAULT_BANDS, generate_bands_for_pair_kadapt,
        )

        en = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        zh = "一 二 三 四 五 六 七 八 九 十"

        def fake(en_text, zh_text, labels, k_map, attempt):
            en_words = en_text.split()
            zh_words = zh_text.split()
            out = {}
            for lab in labels:
                k = k_map[lab]
                mixed = en_words[: len(en_words) - k] + zh_words[len(zh_words) - k:]
                out[lab] = " ".join(mixed)
            return out

        state = BandState(DEFAULT_BANDS)
        filled = generate_bands_for_pair_kadapt(
            "q1", en, zh, state, fake, max_tries=6,
        )
        assert filled >= 4
        assert state.missing_bands("q1") == [] or len(state.missing_bands("q1")) <= 1

    def test_kadapt_never_files_unmixed(self):
        from codemix_dense_retrieval_tpu.datagen.bands import (
            BandState, DEFAULT_BANDS, generate_bands_for_pair_kadapt,
        )

        def pure(en_text, zh_text, labels, k_map, attempt):
            return {lab: en_text for lab in labels}  # ratio 0: not mixed

        state = BandState(DEFAULT_BANDS)
        filled = generate_bands_for_pair_kadapt("q1", "one two three", "一 二 三", state, pure)
        assert filled == 0
        assert all(not rows for rows in state.rows.values())

    def test_prompt_contract(self):
        from codemix_dense_retrieval_tpu.datagen.bands import build_band_prompt

        p = build_band_prompt([(0, 20), (40, 60)], {"0-20": 1, "40-60": 5}, 10)
        assert '"0-20"' in p and '"40-60"' in p
        assert "exactly 9 English words" in p
        assert "exactly 5 English words" in p
        assert "JSON" in p


class TestOpenAIFallback:
    """Responses -> Chat fallback + JSON-mode downgrade with fake clients
    (`generate_cm_bands.py:316-361`)."""

    class _Usage:
        prompt_tokens, completion_tokens = 11, 7

    def _mk_responses_resp(self, text):
        class R:
            output_text = text
            usage = self._Usage()
        return R()

    def _mk_chat_resp(self, text):
        class Msg:
            content = text
        class Choice:
            message = Msg()
        class R:
            choices = [Choice()]
            usage = self._Usage()
        return R()

    def test_responses_preferred(self):
        from codemix_dense_retrieval_tpu.datagen.bands import (
            UsageTracker, openai_band_generate_fn,
        )

        calls = {"responses": 0, "chat": 0}
        outer = self

        class Client:
            class responses:
                @staticmethod
                def create(**kw):
                    calls["responses"] += 1
                    assert kw.get("response_format") == {"type": "json_object"}
                    return outer._mk_responses_resp('{"0-20": "mixed 一"}')
            class chat:
                class completions:
                    @staticmethod
                    def create(**kw):
                        calls["chat"] += 1
                        return outer._mk_chat_resp("{}")

        usage = UsageTracker(1.0, 2.0)
        fn = openai_band_generate_fn(client=Client(), usage=usage, retry_attempts=2, max_backoff=0.01)
        out = fn("one two", "一 二", ["0-20"], {"0-20": 1}, 1)
        assert out == {"0-20": "mixed 一"}
        assert calls == {"responses": 1, "chat": 0}
        assert usage.prompt_tokens == 11

    def test_json_mode_downgrade_then_chat_fallback(self):
        from codemix_dense_retrieval_tpu.datagen.bands import openai_band_generate_fn

        calls = {"responses": 0, "chat": 0, "chat_plain": 0}
        outer = self

        class Client:
            class responses:
                @staticmethod
                def create(**kw):
                    calls["responses"] += 1
                    raise RuntimeError("server exploded")  # hard failure
            class chat:
                class completions:
                    @staticmethod
                    def create(**kw):
                        calls["chat"] += 1
                        if "response_format" in kw:
                            raise RuntimeError("unsupported_parameter: response_format")
                        calls["chat_plain"] += 1
                        return outer._mk_chat_resp(
                            'noise before {"40-60": "mix 三 words"} after')

        fn = openai_band_generate_fn(client=Client(), retry_attempts=6, max_backoff=0.01)
        out = fn("one two three", "一 二 三", ["40-60"], {"40-60": 2}, 2)
        # best-effort JSON extraction from prose-wrapped output
        assert out == {"40-60": "mix 三 words"}
        assert calls["responses"] >= 6  # retried with backoff, then fell back
        assert calls["chat_plain"] == 1

    def test_fixed_sampling_models_omit_temperature(self):
        """gpt-5*/o1*/o3* reject temperature/top_p — the backend must omit
        them (advisor r2; reference `generate_cm_bands.py:67,304-313`)."""
        from codemix_dense_retrieval_tpu.datagen.bands import (
            _sampling_kwargs, _supports_sampling, openai_band_generate_fn,
        )

        assert not _supports_sampling("gpt-5-mini")
        assert not _supports_sampling("o3-mini")
        assert not _supports_sampling("O1")
        assert _supports_sampling("gpt-4o-mini")
        assert _sampling_kwargs("gpt-5-mini", 0.7) == {}
        assert _sampling_kwargs("gpt-4o", 0.7) == {"temperature": 0.7, "top_p": 0.8}

        seen = {}
        outer = self

        class Client:
            class responses:
                @staticmethod
                def create(**kw):
                    seen.update(kw)
                    return outer._mk_responses_resp('{"0-20": "m"}')
            class chat:
                class completions:
                    @staticmethod
                    def create(**kw):
                        raise AssertionError("chat should not be reached")

        fn = openai_band_generate_fn(
            model="gpt-5-mini", client=Client(), retry_attempts=1, max_backoff=0.01)
        out = fn("one", "一", ["0-20"], {"0-20": 1}, 1)
        assert out == {"0-20": "m"}
        assert "temperature" not in seen and "top_p" not in seen

    def test_nonretryable_errors_raise_immediately(self):
        """Invalid-request API errors must not burn the backoff budget."""
        from codemix_dense_retrieval_tpu.datagen.bands import _retrying

        class BadRequestError(Exception):
            status_code = 400

        calls = {"n": 0}

        def boom():
            calls["n"] += 1
            raise BadRequestError("temperature not supported")

        import pytest
        with pytest.raises(BadRequestError):
            _retrying(boom, attempts=6, max_backoff=0.01)
        assert calls["n"] == 1

        # transient errors still retry
        calls["n"] = 0

        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise ConnectionError("reset")
            return "ok"

        assert _retrying(flaky, attempts=6, max_backoff=0.01) == "ok"
        assert calls["n"] == 3
