"""Single-process oracle of the reference pipeline semantics.

This is the P/R ≥ 0.95 comparison side (SURVEY.md §5 item 2): a naive,
loop-shaped re-statement of the reference's extraction + classification
behavior (/root/reference/app/entity_extraction.py:38-109,157-204 and
/root/reference/app/lmss_classification.py:62-171), deliberately written
as per-document/per-mention Python — the way the reference computes — so
the distributed pipeline (Arrow batches, broadcast matrices, caches,
salted shuffles) is checked against straight-line semantics, not against
itself.

Shared with the pipeline (pinned fixtures, SURVEY.md §7 deviations):
the deterministic encoder, the fuzzy-ratio implementations, the stop-word
list, and candidate generation (which *replaces* spaCy channels per the
sanctioned redesign, so both sides must use the identical spec).
Everything downstream of candidates — merge scan, stop-word strip,
containment, dedup, fast path, argmax, thresholds, branch walk — is an
independent implementation here.
"""

from __future__ import annotations

from ..encoder import get_encoder
from ..extraction.candidates import generate_candidates
from ..ontology.artifacts import OntologyArtifacts
from ..textproc import STOPWORDS, cached_token_set_ratio

import numpy as np


def _oracle_strip_leading_stops(phrase: str) -> tuple[str, int]:
    parts = phrase.split()
    moved = 0
    for idx in range(len(parts)):
        if parts[idx].lower() not in STOPWORDS:
            return " ".join(parts[idx:]), moved
        moved += len(parts[idx]) + 1
    return phrase, 0


def _oracle_merge(spans):
    """Sequential overlap resolution, transcribed from the reference's
    merge loop shape (/root/reference/app/entity_extraction.py:38-109)."""
    spans = sorted(spans, key=lambda e: (e[1], -e[2]))
    kept = []
    i = 0
    while i < len(spans):
        cur = spans[i]
        j = i + 1
        while j < len(spans):
            nxt = spans[j]
            overlap = nxt[1] <= cur[2]
            adjacent_np = (
                nxt[1] - cur[2] <= 1 and cur[3] == "NOUN_PHRASE" and nxt[3] == "NOUN_PHRASE"
            )
            if overlap or adjacent_np:
                if cur[3].startswith("NER_"):
                    break
                elif nxt[3].startswith("NER_"):
                    cur = nxt
                elif cur[3] == "NOUN_PHRASE" and nxt[3] == "NOUN_PHRASE":
                    cur = (
                        f"{cur[0]} {nxt[0]}".strip(),
                        min(cur[1], nxt[1]),
                        max(cur[2], nxt[2]),
                        "NOUN_PHRASE",
                    )
                elif cur[3] == "KEYWORD" and nxt[3] in ["NOUN_PHRASE", "KEYWORD"]:
                    if nxt[3] == "NOUN_PHRASE" or len(nxt[0]) > len(cur[0]):
                        cur = nxt
                else:
                    break
                j += 1
            else:
                break
        cleaned, off = _oracle_strip_leading_stops(cur[0])
        cur = (cleaned, cur[1] + off, cur[2], cur[3])
        if not any(k[1] <= cur[1] and k[2] >= cur[2] for k in kept):
            kept.append(cur)
        i = j

    seen = set()
    final = []
    for sp in kept:
        if sp[0].lower() not in seen:
            final.append(sp)
            seen.add(sp[0].lower())
    return final


def oracle_extract(text: str, artifacts: OntologyArtifacts) -> list[dict]:
    """Reference extraction lifecycle for one turn
    (/root/reference/app/entity_extraction.py:157-204)."""
    if not text or not text.strip():
        return []
    merged = _oracle_merge(generate_candidates(text, artifacts))
    records = []
    for surface, start, end, ent_type in merged:
        records.append(
            {
                "text": surface,
                "start": start,
                "end": end,
                "mtype": ent_type,
                "source": ent_type.split("_")[0],
                "context": text[max(0, start - 100) : min(len(text), end + 100)],
                "confidence": 1.0,
            }
        )
    return records


def oracle_link(
    mention_text: str,
    artifacts: OntologyArtifacts,
    similarity_threshold: float = 0.7,
    high_confidence_threshold: float = 0.9,
) -> dict | None:
    """Reference _find_best_match + _get_branch semantics as a per-entity
    scan (/root/reference/app/lmss_classification.py:62-109,161-171).

    Cosines come from the same float64 matrix product as the pipeline (a
    semantically identical formulation — SURVEY.md §7 hard part (6): both
    sides must see bit-identical IEEE results, which per-pair np.dot
    would not guarantee against a BLAS gemv)."""
    sem_all = artifacts.mean_matrix.astype(np.float64) @ get_encoder(
        artifacts.encoder_spec
    ).encode(mention_text).astype(np.float64)

    best = None
    best_score = 0.0
    for pos in range(artifacts.size):
        if not artifacts.row_has_embedding[pos]:
            continue  # reference skips entities with no embedding
        sem = float(sem_all[pos])
        if sem >= high_confidence_threshold:
            return _with_branch(
                {"iri": artifacts.iris[pos], "label": artifacts.labels[pos], "score": sem},
                artifacts,
            )
        fuzzy = cached_token_set_ratio(mention_text.lower(), artifacts.labels[pos].lower()) / 100.0
        combined = (sem + fuzzy) / 2.0
        if combined > best_score:
            best_score = combined
            best = {"iri": artifacts.iris[pos], "label": artifacts.labels[pos], "score": combined}
    if best is not None and best["score"] >= similarity_threshold:
        return _with_branch(best, artifacts)
    return None


def _with_branch(match: dict, artifacts: OntologyArtifacts) -> dict:
    match["branch"] = artifacts.branch_map.get(match["iri"], "Unknown")
    return match


def oracle_mention_type_counts(transcript_rows, artifacts: OntologyArtifacts) -> list[tuple[str, int]]:
    """Loop-oracle twin of the Spark contract query
    ``mention_type_counts``: per-candidate-type mention tallies over
    (conv_id, turn_idx, text) rows.  Materialized as a parquet fixture
    (tools/make_oracle_fixtures.py) so the driver's DuckDB can
    hash-check the Arrow-UDF extraction stage against straight-line
    semantics."""
    from collections import Counter

    counts: Counter[str] = Counter()
    for _conv_id, _turn_idx, text in transcript_rows:
        for m in oracle_extract(text or "", artifacts):
            counts[m["mtype"]] += 1
    return sorted(counts.items())


def oracle_edge_counts(
    transcript_rows,
    artifacts: OntologyArtifacts,
    similarity_threshold: float = 0.7,
    high_confidence_threshold: float = 0.9,
) -> list[tuple[str, int, int]]:
    """Loop-oracle twin of the Spark contract query ``kg_edge_counts``:
    per-predicate (n_edges, n_provenances) over the full extract->link->
    canonicalize pipeline.

    Replicates emit_triples + canonicalize_triples semantics exactly:
    each link row emits one isInstanceOf, one mentionedIn, and one
    turn->conv partOf triple (graph/triples.py:42-61); ``n_edges`` counts
    distinct (subj, pred, obj) and ``n_provenances`` sums raw emissions
    per canonical edge (graph/canonicalize.py phase-0 counts summed
    through phases 1-2).  Derived from ``oracle_edge_rows`` so the two
    oracles can never desynchronize."""
    per_pred: dict[str, list[int]] = {}
    for _s, p, _o, n in oracle_edge_rows(
        transcript_rows, artifacts, similarity_threshold, high_confidence_threshold
    ):
        agg = per_pred.setdefault(p, [0, 0])
        agg[0] += 1
        agg[1] += n
    return sorted((p, e, pr) for p, (e, pr) in per_pred.items())


def oracle_edge_rows(
    transcript_rows,
    artifacts: OntologyArtifacts,
    similarity_threshold: float = 0.7,
    high_confidence_threshold: float = 0.9,
) -> list[tuple[str, str, str, int]]:
    """Full canonical edge ROWS (subj, pred, obj, n_provenances) — the
    per-triple form of ``oracle_edge_counts``'s tally, frozen to parquet
    fixtures so DuckDB can value-check the incremental/changelog
    machinery (``edges_diff``) against straight-line semantics.  Any
    provenance-bearing column (first_*, max_score) changes only when new
    emissions arrive, which always bump ``n_provenances`` — so count
    equality per triple is diff-completeness."""
    from collections import Counter

    tally: Counter[tuple[str, str, str]] = Counter()
    for conv_id, turn_idx, text in transcript_rows:
        turn_uri = f"turn://{conv_id}/{turn_idx}"
        conv_uri = f"conv://{conv_id}"
        for m in oracle_extract(text or "", artifacts):
            match = oracle_link(
                m["text"],
                artifacts,
                similarity_threshold=similarity_threshold,
                high_confidence_threshold=high_confidence_threshold,
            )
            if match is None:
                continue
            mention_uri = f"mention://{conv_id}/{turn_idx}/{m['start']}-{m['end']}"
            tally[(mention_uri, "lmss:isInstanceOf", match["iri"])] += 1
            tally[(mention_uri, "prov:mentionedIn", turn_uri)] += 1
            tally[(turn_uri, "prov:partOf", conv_uri)] += 1
    return sorted((s, p, o, n) for (s, p, o), n in tally.items())


def oracle_triples(
    transcript_rows,
    artifacts: OntologyArtifacts,
    similarity_threshold: float = 0.7,
    high_confidence_threshold: float = 0.9,
) -> set[tuple[str, str, str]]:
    """Full oracle pipeline over (conv_id, turn_idx, text) rows: extract,
    link, emit canonical (subj, pred, obj) set — the golden triple set for
    the parity gate."""
    triples: set[tuple[str, str, str]] = set()
    for conv_id, turn_idx, text in transcript_rows:
        turn_uri = f"turn://{conv_id}/{turn_idx}"
        conv_uri = f"conv://{conv_id}"
        any_link = False
        for m in oracle_extract(text or "", artifacts):
            match = oracle_link(
                m["text"],
                artifacts,
                similarity_threshold=similarity_threshold,
                high_confidence_threshold=high_confidence_threshold,
            )
            if match is None:
                continue
            any_link = True
            mention_uri = f"mention://{conv_id}/{turn_idx}/{m['start']}-{m['end']}"
            triples.add((mention_uri, "lmss:isInstanceOf", match["iri"]))
            triples.add((mention_uri, "prov:mentionedIn", turn_uri))
        if any_link:
            triples.add((turn_uri, "prov:partOf", conv_uri))
    return triples
