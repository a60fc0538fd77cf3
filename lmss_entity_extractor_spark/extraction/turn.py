"""Per-turn mention extraction: candidates -> span resolution -> mention
records (the body of the extraction UDF, reference lifecycle step
/root/reference/app/entity_extraction.py:157-204).
"""

from __future__ import annotations

from ..ontology.artifacts import OntologyArtifacts
from .candidates import generate_candidates
from .merge import resolve_spans

CONTEXT_RADIUS = 100  # chars each side (/root/reference/app/entity_extraction.py:182-188)


def _records(text: str, merged, with_context: bool) -> list[dict]:
    out = []
    for surface, start, end, mtype in merged:
        rec = {"text": surface, "start": start, "end": end, "mtype": mtype}
        if with_context:
            ctx_lo = max(0, start - CONTEXT_RADIUS)
            ctx_hi = min(len(text), end + CONTEXT_RADIUS)
            rec["source"] = mtype.split("_")[0]
            rec["context"] = text[ctx_lo:ctx_hi]
            rec["confidence"] = 1.0
        out.append(rec)
    return out


def extract_mentions_from_turn(
    text: str, artifacts: OntologyArtifacts, with_context: bool = True
) -> list[dict]:
    """Extract merged mention records from one turn's text.

    Returns dicts with keys (text, start, end, mtype[, source, context,
    confidence]) in merged-list order.  Empty/blank input yields no
    mentions (/root/reference/app/entity_extraction.py:160-162).
    """
    if not text or not text.strip():
        return []
    return _records(text, resolve_spans(generate_candidates(text, artifacts)), with_context)


def extract_mentions_from_turns(
    texts: list[str], artifacts: OntologyArtifacts, with_context: bool = True
) -> list[list[dict]]:
    """Batch twin of ``extract_mentions_from_turn`` for a whole Arrow
    batch: the fuzzy channel's tally/prefix-sum machinery runs over the
    concatenated token stream (1.7x kernel speedup measured at 60 convs;
    see candidates.fuzzy_window_spans_batch), with per-turn records
    bit-identical to the single-turn form (same _records/_scan bodies)."""
    from .candidates import generate_candidates_batch

    blank = [not t or not t.strip() for t in texts]
    cands = generate_candidates_batch(
        ["" if b else t for t, b in zip(texts, blank)], artifacts
    )
    return [
        [] if b else _records(t, resolve_spans(spans), with_context)
        for t, b, spans in zip(texts, blank, cands)
    ]
