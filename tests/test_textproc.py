"""Unit tests for fuzzy ratios (F4/F5) and stop-word handling (P6),
cross-checked against hand-computed fuzzywuzzy/python-Levenshtein values
(SURVEY.md §5 item 1)."""

from lmss_entity_extractor_spark.textproc import (
    STOPWORDS,
    char_trigrams,
    full_process,
    indel_ratio,
    partial_ratio,
    simple_ratio,
    strip_leading_stopwords,
    token_set_ratio,
)


class TestSimpleRatio:
    def test_identical(self):
        assert simple_ratio("patent law", "patent law") == 100

    def test_classic_fuzzywuzzy_example(self):
        # fuzz.ratio("this is a test", "this is a test!") == 97
        assert simple_ratio("this is a test", "this is a test!") == 97

    def test_empty_both(self):
        assert simple_ratio("", "") == 100

    def test_empty_one(self):
        assert simple_ratio("abc", "") == 0

    def test_symmetry(self):
        assert simple_ratio("abcd", "bcde") == simple_ratio("bcde", "abcd")

    def test_indel_formula(self):
        # LCS("kitten","sitting") = 4 ("ittn") -> 2*4/13
        assert abs(indel_ratio("kitten", "sitting") - 8 / 13) < 1e-12


class TestTokenSetRatio:
    def test_reordered_tokens_score_100(self):
        # fuzz.token_set_ratio is order-insensitive
        assert token_set_ratio("fuzzy wuzzy was a bear", "wuzzy fuzzy bear was a") == 100

    def test_subset_scores_100(self):
        # one side's tokens a subset of the other's: sorted-intersection
        # vs itself gives 100
        assert token_set_ratio("patent law", "patent law firm") == 100

    def test_disjoint_low(self):
        assert token_set_ratio("alpha beta", "gamma delta") < 60

    def test_case_and_punct_insensitive(self):
        assert token_set_ratio("Patent-Law!", "patent law") == 100


class TestPartialRatio:
    def test_substring_scores_100(self):
        # fuzz.partial_ratio("this is a test", "this is a test!") == 100
        assert partial_ratio("this is a test", "this is a test!") == 100

    def test_inner_substring(self):
        assert partial_ratio("law", "patent law firm") == 100

    def test_empty(self):
        # fuzzywuzzy wraps partial_ratio in @check_empty_string: either
        # input empty -> 0 (including both empty)
        assert partial_ratio("", "") == 0
        assert partial_ratio("", "law") == 0
        assert partial_ratio("law", "") == 0


class TestFullProcess:
    def test_non_alnum_to_space_lower_strip(self):
        assert full_process("  Patent-Law, (2024)! ") == "patent law 2024"

    def test_force_ascii_fold(self):
        # the reference calls every ratio with the default
        # force_ascii=True, which DROPS non-ASCII code points before
        # tokenizing ('café' -> 'caf') — parity requires the same fold
        assert full_process("café law") == "caf law"
        assert full_process("café") == full_process("caf")


class TestStripLeadingStopwords:
    def test_strips_and_offsets(self):
        text, off = strip_leading_stopwords("the patent law")
        assert text == "patent law"
        assert off == 4  # len("the") + 1

    def test_multiple_stops(self):
        text, off = strip_leading_stopwords("some of the trade secrets")
        assert text == "trade secrets"
        assert off == len("some ") + len("of ") + len("the ")

    def test_all_stopwords_returns_original(self):
        text, off = strip_leading_stopwords("the of and")
        assert text == "the of and"
        assert off == 0

    def test_no_stops(self):
        assert strip_leading_stopwords("patent law") == ("patent law", 0)

    def test_fixture_loaded(self):
        assert "the" in STOPWORDS and "patent" not in STOPWORDS


class TestTrigrams:
    def test_padding_and_content(self):
        tris = char_trigrams("law")
        assert "#la" in tris and "aw#" in tris and "law" in tris

    def test_empty(self):
        assert char_trigrams("") == frozenset()


def test_strip_leading_stopwords_normalizes_internal_whitespace():
    """Regression: the reference's word-join re-normalizes ALL internal
    whitespace even when nothing is stripped — a verbatim fast path for
    non-stopword-leading text breaks oracle parity on multi-space or
    newline-bearing surfaces."""
    from lmss_entity_extractor_spark.textproc import strip_leading_stopwords

    assert strip_leading_stopwords("foo  bar") == ("foo bar", 0)
    assert strip_leading_stopwords("contract\nlaw") == ("contract law", 0)
    assert strip_leading_stopwords("the  contract law") == ("contract law", 4)
