"""Bundled pairwise LID for same-script pairs (VERDICT r3 item 5).

Hand-counted mixed sentences: before this model, EVERY Latin token in an
EN-FR/EN-ES sentence silently counted as ``lang_a`` — word-mix band
measurement for same-script pairs was degenerate. The reference runs
pair-constrained langid per token (`/root/reference/mix_count.py:30-37,
111`); these tests pin the bundled replacement to the same contract.
"""

import pytest

from codemix_dense_retrieval_tpu.datagen.lexid import (
    classify_pair,
    default_pair_classifier,
    supported,
)
from codemix_dense_retrieval_tpu.datagen.mix_count import (
    count_two_langs,
    mix_ratio,
)


class TestClassifyPair:
    def test_function_words_en_fr(self):
        for tok, want in [
            ("the", "en"), ("where", "en"), ("what", "en"), ("is", "en"),
            ("les", "fr"), ("où", "fr"), ("quelle", "fr"), ("est", "fr"),
        ]:
            assert classify_pair(tok, "en", "fr") == want, tok

    def test_function_words_en_es(self):
        for tok, want in [
            ("which", "en"), ("how", "en"), ("many", "en"),
            ("dónde", "es"), ("cuántos", "es"), ("los", "es"), ("qué", "es"),
        ]:
            assert classify_pair(tok, "en", "es") == want, tok

    def test_diacritics_decide_within_pair(self):
        # é decides FR over EN...
        assert classify_pair("café", "en", "fr") == "fr"
        # ...but is mute for FR vs ES (both own it) -> None
        assert classify_pair("café", "fr", "es") is None
        assert classify_pair("straße", "en", "de") == "de"
        assert classify_pair("año", "en", "es") == "es"
        assert classify_pair("ação", "es", "pt") == "pt"  # ã is PT-only

    def test_suffixes_decide(self):
        assert classify_pair("bildung", "en", "de") == "de"
        assert classify_pair("freundlich", "en", "de") == "de"
        assert classify_pair("happiness", "de", "en") == "en"
        assert classify_pair("running", "en", "fr") == "en"
        assert classify_pair("boulangerie", "en", "fr") == "fr"

    def test_tie_returns_none(self):
        assert classify_pair("internet", "en", "fr") is None
        assert classify_pair("xyzzy", "en", "es") is None

    def test_case_insensitive(self):
        assert classify_pair("The", "en", "fr") == "en"
        assert classify_pair("LES", "en", "fr") == "fr"

    def test_vietnamese_tone_block(self):
        assert classify_pair("việt", "en", "vi") == "vi"
        assert classify_pair("người", "en", "vi") == "vi"

    def test_supported_matrix(self):
        for lang in ("en", "fr", "es", "pt", "it", "de", "nl", "id", "vi"):
            assert supported(lang)
        assert not supported("zh")
        assert default_pair_classifier("en", "zh") is None
        clf = default_pair_classifier("en", "fr")
        assert clf is not None and clf("the") == "en" and clf("les") == "fr"
        # ties resolve to lang_a (the old classifier-less behavior)
        assert clf("internet") == "en"


class TestSameScriptCounting:
    """count_two_langs with NO classifier must now discriminate
    same-script pairs via the bundled default (hand counts)."""

    def test_en_fr_mixed_hand_count(self):
        # EN: where is the -> 3 tokens EN; FR: meilleure boulangerie de la
        # ville -> 5 tokens FR ('meilleure' ends -eur? no, 'eure'; decided
        # by lexicon for de/la, suffix/diacritic for the rest)
        a, b = count_two_langs(
            "where is the meilleure boulangerie de la ville", "en", "fr"
        )
        assert (a, b) == (3, 5)

    def test_en_es_mixed_hand_count(self):
        # "dónde está the best librería de the city"
        #   ES: dónde está librería de -> 4; EN: the best the city -> 4
        a, b = count_two_langs(
            "dónde está the best librería de the city", "en", "es"
        )
        assert (a, b) == (4, 4)

    def test_en_de_mixed_hand_count(self):
        # DE: welche versicherung ist für -> 4 ; EN: best for students -> 3
        a, b = count_two_langs(
            "welche versicherung ist best für students", "en", "de"
        )
        assert (a, b) == (2, 4)  # 'best'+'students' EN; rest DE

    def test_pure_sentences(self):
        a, b = count_two_langs("où est la gare la plus proche", "en", "fr")
        assert b >= 5 and a <= 2  # overwhelmingly FR
        a, b = count_two_langs("what is the average salary", "en", "fr")
        assert a == 5 and b == 0

    def test_mix_ratio_same_script(self):
        # en: what is the capital (capital = tie -> lang_a); fr: de la
        # république -> 3 of 7 countable words
        r = mix_ratio("what is the capital de la république", "en", "fr")
        assert r == pytest.approx(100.0 * 3 / 7)

    def test_script_distinct_pairs_unchanged(self):
        # the default classifier must not perturb script-decided pairs
        a, b = count_two_langs("Where do black widow 蜘蛛 live in the US", "en", "zh")
        assert b == 2 and a == 8  # 8 latin words (US is 1) + 2 han chars

    def test_explicit_classifier_still_wins(self):
        clf = lambda tok: "es"  # noqa: E731
        a, b = count_two_langs("the cat", "en", "es", classifier=clf)
        assert (a, b) == (0, 2)
