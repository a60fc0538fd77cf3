"""Table-driven tests of the span resolver (W2) — one case per rule
branch of the reference merge loop
(/root/reference/app/entity_extraction.py:56-98), plus the oracle's
independent implementation must agree on every case (SURVEY.md §5)."""

import pytest

from lmss_entity_extractor_spark.extraction.merge import resolve_spans
from lmss_entity_extractor_spark.oracle.reference_oracle import _oracle_merge

CASES = {
    "empty": ([], []),
    "single": ([("patent law", 0, 10, "NOUN_PHRASE")], [("patent law", 0, 10, "NOUN_PHRASE")]),
    # NER is frozen: overlapping follower cannot change it
    "ner_frozen": (
        [("Paris", 0, 5, "NER_GPE"), ("Paris Texas", 0, 11, "NOUN_PHRASE")],
        # sort (start,-end) puts the NOUN_PHRASE first; follower NER wins;
        # then next scan starts past both
        [("Paris", 0, 5, "NER_GPE")],
    ),
    # follower NER replaces running non-NER
    "ner_preferred": (
        [("the patent", 0, 10, "NOUN_PHRASE"), ("patent", 4, 10, "NER_LAW")],
        [("patent", 4, 10, "NER_LAW")],
    ),
    # overlapping noun phrases merge with text splice + span union
    "np_overlap_merge": (
        [("patent law", 0, 10, "NOUN_PHRASE"), ("law firm", 7, 15, "NOUN_PHRASE")],
        [("patent law law firm", 0, 15, "NOUN_PHRASE")],
    ),
    # adjacent (gap exactly 1) noun phrases also merge
    "np_adjacent_merge": (
        [("patent", 0, 6, "NOUN_PHRASE"), ("law", 7, 10, "NOUN_PHRASE")],
        [("patent law", 0, 10, "NOUN_PHRASE")],
    ),
    # gap of 2 does not merge
    "np_gap2_no_merge": (
        [("patent", 0, 6, "NOUN_PHRASE"), ("law", 8, 11, "NOUN_PHRASE")],
        [("patent", 0, 6, "NOUN_PHRASE"), ("law", 8, 11, "NOUN_PHRASE")],
    ),
    # keyword yields to overlapping noun phrase
    "keyword_yields_to_np": (
        [("patent", 0, 6, "KEYWORD"), ("patent law", 0, 10, "NOUN_PHRASE")],
        [("patent law", 0, 10, "NOUN_PHRASE")],
    ),
    # longer keyword beats shorter keyword
    "longer_keyword_wins": (
        [("patents", 0, 7, "KEYWORD"), ("patent", 0, 6, "KEYWORD")],
        [("patents", 0, 7, "KEYWORD")],
    ),
    # shorter keyword follower is consumed without replacing
    "shorter_keyword_consumed": (
        [("patents", 0, 7, "KEYWORD"), ("atents", 1, 7, "KEYWORD")],
        [("patents", 0, 7, "KEYWORD")],
    ),
    # NOUN_PHRASE running + KEYWORD follower -> scan break, both kept
    # unless containment suppresses the keyword
    "np_then_keyword_contained": (
        [("patent law", 0, 10, "NOUN_PHRASE"), ("law", 7, 10, "KEYWORD")],
        [("patent law", 0, 10, "NOUN_PHRASE")],
    ),
    # leading stop words stripped with offset shift
    "stopword_strip": (
        [("the patent law", 0, 14, "NOUN_PHRASE")],
        [("patent law", 4, 14, "NOUN_PHRASE")],
    ),
    # case-insensitive dedup keeps first surface form
    "dedup_case_insensitive": (
        [("Patent Law", 0, 10, "NOUN_PHRASE"), ("patent law", 20, 30, "NOUN_PHRASE")],
        [("Patent Law", 0, 10, "NOUN_PHRASE")],
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_merge_case(name):
    spans, expected = CASES[name]
    assert resolve_spans(list(spans)) == expected


@pytest.mark.parametrize("name", sorted(CASES))
def test_oracle_agrees(name):
    spans, _ = CASES[name]
    assert _oracle_merge(list(spans)) == resolve_spans(list(spans))


def test_merge_idempotent_on_resolved_output():
    spans = [
        ("patent law", 0, 10, "NOUN_PHRASE"),
        ("law firm", 7, 15, "NOUN_PHRASE"),
        ("Paris", 20, 25, "NER_GPE"),
        ("paris", 20, 25, "KEYWORD"),
    ]
    once = resolve_spans(spans)
    assert resolve_spans(once) == once


def test_batched_extraction_bit_identical_to_per_turn(tmp_path):
    """The cross-turn batched fuzzy path (extract_mentions_from_turns)
    must produce bit-identical records to the per-turn form on a corpus
    with blanks, typos, stop-word phrases, and hot conversations — the
    in-turn window counts are sums of the same tally rows whichever
    prefix matrix they come from."""
    from lmss_entity_extractor_spark.datagen import gen_transcript_rows, write_fixture_owl
    from lmss_entity_extractor_spark.extraction.turn import (
        extract_mentions_from_turn,
        extract_mentions_from_turns,
    )
    from lmss_entity_extractor_spark.ontology import build_artifacts, parse_owl_classes

    owl = tmp_path / "fixture.owl"
    write_fixture_owl(owl)
    arts = build_artifacts(parse_owl_classes(owl))
    texts = [r[3] for r in gen_transcript_rows(n_convs=12, seed=7, hot_frac=0.1, hot_multiplier=10)]
    assert "" in texts or any(not t.strip() for t in texts)  # blanks exercised
    for with_context in (True, False):
        batch = extract_mentions_from_turns(texts, arts, with_context=with_context)
        per = [extract_mentions_from_turn(t, arts, with_context=with_context) for t in texts]
        assert batch == per
    assert any(batch), "corpus produced no mentions — fixture broken"
