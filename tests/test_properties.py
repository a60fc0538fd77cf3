"""Property-based tests (SURVEY.md §5.5): seeded hypothesis checks of
the invariants the pipeline's correctness rests on — merge resolution,
fuzzy-ratio bounds, closure semantics, canonicalization dedup.  No Spark
session needed except for the closure property (runs on the shared
fixture session)."""

import pytest
from hypothesis import given, settings, strategies as st

from lmss_entity_extractor_spark.extraction.merge import resolve_spans
from lmss_entity_extractor_spark.textproc import (
    partial_ratio,
    strip_leading_stopwords,
    token_set_ratio,
)

# deterministic, bounded: CI-stable regardless of hypothesis version
SETTINGS = settings(max_examples=200, deadline=None, derandomize=True)

words = st.text(alphabet="abcdefg", min_size=1, max_size=6)


@st.composite
def span_lists(draw):
    n = draw(st.integers(0, 12))
    out = []
    for _ in range(n):
        start = draw(st.integers(0, 60))
        length = draw(st.integers(1, 12))
        stype = draw(st.sampled_from(["NER_LMSS", "NOUN_PHRASE", "KEYWORD"]))
        text = draw(words)
        out.append((text, start, start + length, stype))
    return out


@SETTINGS
@given(span_lists())
def test_resolve_spans_invariants(spans):
    resolved = resolve_spans(spans)
    # no later span is contained in an earlier-accepted span (the
    # reference suppression rule is one-directional: later-vs-earlier)
    for i, a in enumerate(resolved):
        for b in resolved[i + 1 :]:
            assert not (a[1] <= b[1] and a[2] >= b[2])
    # surface forms are case-insensitively unique (A6)
    forms = [sp[0].lower() for sp in resolved]
    assert len(forms) == len(set(forms))
    # determinism: same input list resolves identically
    assert resolve_spans(list(spans)) == resolved


@SETTINGS
@given(st.text(max_size=40), st.text(max_size=40))
def test_fuzzy_ratios_bounded_and_symmetric_enough(a, b):
    ts = token_set_ratio(a, b)
    assert 0 <= ts <= 100
    assert ts == token_set_ratio(b, a)  # token_set is symmetric
    pr = partial_ratio(a, b)
    assert 0 <= pr <= 100
    # identity: equal non-empty processed strings score 100
    if a.strip().isalnum() and a == b and a.strip():
        assert ts == 100


@SETTINGS
@given(st.lists(words, min_size=1, max_size=8))
def test_strip_leading_stopwords_offset_consistent(tokens):
    phrase = " ".join(tokens)
    trimmed, offset = strip_leading_stopwords(phrase)
    assert 0 <= offset <= len(phrase)
    # the trimmed phrase appears at the reported offset
    if trimmed:
        assert phrase[offset : offset + len(trimmed)] == trimmed
    # idempotent unless the whole phrase was stop words
    trimmed2, off2 = strip_leading_stopwords(trimmed)
    if trimmed2 == trimmed:
        assert off2 == 0


def _closure_python(edges):
    """Reference transitive closure by repeated squaring over a dict."""
    reach = {}
    for c, p in edges:
        reach.setdefault(c, set()).add(p)
    changed = True
    while changed:
        changed = False
        for c in list(reach):
            new = set()
            for mid in reach[c]:
                new |= reach.get(mid, set())
            if not new <= reach[c]:
                reach[c] |= new
                changed = True
    return {(c, p) for c, ps in reach.items() for p in ps}


@pytest.mark.spark
@settings(max_examples=10, deadline=None, derandomize=True)
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(7, 14)),
        min_size=0,
        max_size=10,
        unique=True,
    )
)
def test_transitive_closure_matches_reference(spark, int_edges):
    """J4 fixpoint join == the textbook transitive closure (the strategy
    guarantees an acyclic shape: child ids < parent ids)."""
    from lmss_entity_extractor_spark.graph.closure import transitive_closure

    if not int_edges:
        return
    edges = [(f"n{c}", f"n{p}") for c, p in int_edges]
    df = spark.createDataFrame(edges, "child string, parent string")
    got = {(r.desc_iri, r.anc_iri) for r in transitive_closure(df, include_self=False).collect()}
    assert got == _closure_python(edges)
