"""Turtle (.ttl) export of the canonical edges table.

K3 parity with the reference's graph sink
(/root/reference/app/lmss_parser.py:166-169 — ``graph.serialize(
format="turtle")``).  At 100 TB the graph lives in the partitioned
``edges`` table; a Turtle file is an interchange artifact for small
slices (fixtures, debugging, downstream RDF tools), so this is an
explicitly bounded driver-side sink: deterministic ordering, hard row
cap, prefix-compressed qnames.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PREFIXES = {
    "lmss": "http://lmss.sali.org/",
    "prov": "http://www.w3.org/ns/prov#",
    "mention": "mention://",
    "turn": "turn://",
    "conv": "conv://",
}


def _term(value: str) -> str:
    """Render one RDF term: full IRIs in angle brackets (illegal IRI-ref
    characters percent-encoded — a space inside <...> is invalid
    Turtle), short qnames with a known prefix as-is (e.g.
    "lmss:isInstanceOf"), everything else as an escaped string literal."""
    if "://" in value:
        iri = value
        for ch, enc in ((" ", "%20"), ("<", "%3C"), (">", "%3E"), ('"', "%22"),
                        ("{", "%7B"), ("}", "%7D"), ("|", "%7C"), ("\\", "%5C"),
                        ("^", "%5E"), ("`", "%60")):
            iri = iri.replace(ch, enc)
        return f"<{iri}>"
    pfx, sep, local = value.partition(":")
    if sep and pfx in PREFIXES and "/" not in local:
        return value
    escaped = (
        value.replace("\\", "\\\\").replace('"', '\\"')
        .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
    )
    return f'"{escaped}"'


def edges_to_turtle(edges: DataFrame, path: str | Path, max_rows: int = 100_000) -> int:
    """Serialize ``edges(subj, pred, obj)`` to a Turtle file.

    Deterministic: rows sorted by (subj, pred, obj); refuses silently
    unbounded collects via ``max_rows`` (raises when exceeded so a
    truncated export can never masquerade as complete).  Returns the
    number of triples written."""
    rows = (
        edges.select("subj", "pred", "obj")
        .orderBy("subj", "pred", "obj")
        .limit(max_rows + 1)
        .collect()
    )
    if len(rows) > max_rows:
        raise ValueError(
            f"edges_to_turtle: more than max_rows={max_rows} triples; "
            "export a filtered slice or raise the cap explicitly"
        )
    lines = [f"@prefix {p}: <{iri}> ." for p, iri in PREFIXES.items()]
    lines.append("")
    lines += [f"{_term(r.subj)} {_term(r.pred)} {_term(r.obj)} ." for r in rows]
    Path(path).write_text("\n".join(lines) + "\n")
    return len(rows)
