"""Span resolution — the overlap-merge sequential scan (operator W2).

Semantics replicate the reference's ``merge_entities``
(/root/reference/app/entity_extraction.py:38-109) rule for rule; this is
the single most P/R-critical function of the pipeline (SURVEY.md §2.5
W2).  It is a stateful sequential scan over one turn's sorted span list,
NOT expressible as a fixed-frame SQL window — so it runs as plain Python
over the (small) per-turn span list inside the Arrow-batched mention UDF.

Rule set, for spans sorted by (start, -end):
  * a following span "collides" with the running span when it starts at
    or before the running span's end, or when it is a NOUN_PHRASE within
    one character of a running NOUN_PHRASE (adjacency),
  * a running NER-typed span is frozen: collision resolution stops and
    the NER span is kept as is,
  * an NER-typed follower replaces whatever is running,
  * two colliding/adjacent NOUN_PHRASEs concatenate: texts spliced with a
    single space (NOT re-sliced from the document — exact reference
    behavior), span = [min(start), max(end)],
  * a running KEYWORD yields to a NOUN_PHRASE follower or a strictly
    longer KEYWORD follower; a shorter/equal KEYWORD follower is consumed
    with no change,
  * any other combination stops the scan for the running span,
  * the winning span is stripped of leading stop words (offset-adjusted),
  * a winner contained within an already-accepted span is suppressed,
  * finally, case-insensitive surface-form dedup keeps first occurrence.
"""

from __future__ import annotations

from bisect import bisect_left, bisect_right

from ..textproc import STOPWORDS, strip_leading_stopwords

Span = tuple[str, int, int, str]


def _collides(running: Span, follower: Span) -> bool:
    if follower[1] <= running[2]:
        return True
    return (
        follower[1] - running[2] <= 1
        and running[3] == "NOUN_PHRASE"
        and follower[3] == "NOUN_PHRASE"
    )


def resolve_spans(spans: list[Span], stopwords: frozenset[str] = STOPWORDS) -> list[Span]:
    ordered = sorted(spans, key=lambda sp: (sp[1], -sp[2]))
    n = len(ordered)
    accepted: list[Span] = []
    # Containment frontier: the non-dominated accepted (start, end) pairs
    # — both lists strictly increasing — so "is the winner contained in
    # ANY accepted span" is one bisect instead of an O(len(accepted))
    # scan (dominated spans can never answer the containment query with
    # a different result; was ~10% of the extraction kernel).
    f_starts: list[int] = []
    f_ends: list[int] = []
    i = 0
    while i < n:
        # the running span lives in four locals (same rule set as the
        # _collides/tuple form, which remains the documented semantics —
        # tuple construction per merge step profiled as ~15% of the
        # extraction kernel's merge cost)
        r_text, r_start, r_end, r_type = ordered[i]
        j = i + 1
        while j < n:
            follower = ordered[j]
            f_type = follower[3]
            if follower[1] > r_end and not (
                follower[1] - r_end <= 1 and r_type == "NOUN_PHRASE" and f_type == "NOUN_PHRASE"
            ):
                break
            if r_type.startswith("NER_"):
                break
            if f_type.startswith("NER_"):
                r_text, r_start, r_end, r_type = follower
            elif r_type == "NOUN_PHRASE" and f_type == "NOUN_PHRASE":
                r_text = (r_text + " " + follower[0]).strip()
                if follower[1] < r_start:
                    r_start = follower[1]
                if follower[2] > r_end:
                    r_end = follower[2]
            elif r_type == "KEYWORD" and (f_type == "NOUN_PHRASE" or f_type == "KEYWORD"):
                if f_type == "NOUN_PHRASE" or len(follower[0]) > len(r_text):
                    r_text, r_start, r_end, r_type = follower
                # else: shorter/equal keyword follower is consumed, no change
            else:
                break
            j += 1

        trimmed, offset = strip_leading_stopwords(r_text, stopwords)
        running = (trimmed, r_start + offset, r_end, r_type)

        # contained iff some accepted a has a.start <= start and
        # a.end >= end; on the frontier, ends increase with starts, so
        # the last frontier entry with f_start <= start carries the max
        # end over every accepted span with start <= this start
        w_start, w_end = running[1], running[2]
        k = bisect_right(f_starts, w_start) - 1
        if k < 0 or f_ends[k] < w_end:
            accepted.append(running)
            # insert (w_start, w_end), dropping entries it dominates
            # (start >= w_start and end <= w_end — a contiguous slice)
            lo = bisect_left(f_starts, w_start)
            hi = lo
            nf = len(f_starts)
            while hi < nf and f_ends[hi] <= w_end:
                hi += 1
            f_starts[lo:hi] = [w_start]
            f_ends[lo:hi] = [w_end]
        i = j

    seen_forms: set[str] = set()
    result: list[Span] = []
    for sp in accepted:
        form = sp[0].lower()
        if form not in seen_forms:
            seen_forms.add(form)
            result.append(sp)
    return result
