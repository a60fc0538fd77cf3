"""Per-turn mention extraction: candidates -> span resolution -> mention
records (the body of the extraction UDF, reference lifecycle step
/root/reference/app/entity_extraction.py:157-204).
"""

from __future__ import annotations

from ..ontology.artifacts import OntologyArtifacts
from .candidates import generate_candidates
from .merge import resolve_spans

CONTEXT_RADIUS = 100  # chars each side (/root/reference/app/entity_extraction.py:182-188)


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
    merged = resolve_spans(generate_candidates(text, artifacts))
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
