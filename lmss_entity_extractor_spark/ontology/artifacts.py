"""Ontology artifact bundle — the broadcast "dimension" side of the
pipeline.

The reference precomputes a JSON index + an embedding-bearing RDF graph
once per ontology hash and reuses them across requests
(/root/reference/app/lmss_parser.py:171-195, app/main.py:82-110).  Here
the same precomputation produces a single picklable bundle that Spark
broadcasts to executors: numpy embedding matrix, frozen index order,
label dictionary for mention detection, subclass closure, and the
iri->branch map.

Deliberately NOT ported: the reference re-queries the RDF graph for every
(mention x class) pair (/root/reference/app/lmss_classification.py:50-60,
68-74) — an O(M*C) repeated-work anti-pattern (SURVEY.md §4 O5).  Mean
embeddings are computed exactly once here.
"""

from __future__ import annotations

import re
import uuid
from dataclasses import dataclass, field

import numpy as np

from ..encoder import DEFAULT_ENCODER_SPEC, get_encoder
from ..textproc import char_trigrams

# Embedded fields, in the reference's order
# (/root/reference/app/lmss_parser.py:119-127): list-valued fields are
# space-joined; empty texts produce no vector.
EMBEDDING_FIELDS = ("rdfs_label", "skos_definition", "skos_prefLabel", "skos_altLabel")

MIN_SURFACE_LEN = 3


def _field_text(entity: dict, fld: str) -> str:
    v = entity.get(fld, "")
    if isinstance(v, list):
        return " ".join(v)
    return v or ""


@dataclass
class OntologyArtifacts:
    """Everything the extraction + linking UDFs need, broadcastable."""

    index_rows: list[dict]                     # sorted-IRI order, index_pos aligned
    labels: list[str]                          # rdfs_label per index_pos
    iris: list[str]                            # rdf_about per index_pos
    mean_matrix: np.ndarray                    # (C, DIM) float32, rows l2-normalized
    row_has_embedding: np.ndarray              # (C,) bool — rows with >=1 field vec
    branch_map: dict[str, str]                 # iri -> top-class label ("branch")
    top_classes: list[dict]                    # (iri, label, entities_count), label-sorted
    closure: list[tuple[str, str, int]]        # (desc_iri, anc_iri, depth), depth 0 = self
    field_embeddings: list[tuple[str, str, list[float]]]  # (iri, field, vec)
    surfaces: list[tuple[str, int]]            # (surface_lower, index_pos) dictionary
    label_trigrams: list[frozenset]            # per surface id, trigrams of the surface
    trigram_postings: dict[str, "np.ndarray"] = field(default_factory=dict)
    # Unique per BUILD, stable through pickling to executors: the linking
    # stage keys its executor-local Linker cache on this (id() of the value
    # can collide when a replaced broadcast is GC'd and CPython recycles the
    # address, silently scoring against a stale ontology; pyspark Broadcast
    # handles expose no stable public id).
    build_token: str = field(default_factory=lambda: uuid.uuid4().hex)
    # Which encoder produced mean_matrix/field_embeddings.  The SPEC (a
    # short string) is what pickles to executors; every consumer (linker,
    # search, with_vector extraction, oracle) resolves it through
    # encoder.get_encoder's per-process lazy singleton, so a real model
    # plugs in cluster-wide by building artifacts with its spec (F8).
    encoder_spec: str = DEFAULT_ENCODER_SPEC

    @property
    def label_tri_sizes(self) -> np.ndarray:
        sz = getattr(self, "_label_tri_sizes", None)
        if sz is None:
            sz = np.asarray([len(t) for t in self.label_trigrams], dtype=np.int64)
            object.__setattr__(self, "_label_tri_sizes", sz)
        return sz

    # -- derived, built lazily on executors ---------------------------------
    _surface_regex: "re.Pattern | None" = None

    def surface_regex(self) -> "re.Pattern":
        """One compiled word-boundary alternation over every dictionary
        surface, longest-first so the regex engine prefers the longest
        surface at a given position."""
        if self._surface_regex is None:
            ordered = sorted({s for s, _ in self.surfaces}, key=lambda s: (-len(s), s))
            if not ordered:
                pattern = r"(?!x)x"  # matches nothing
            else:
                # boundaries are PER SURFACE and only on word-char edges:
                # a shared \b around the whole alternation makes surfaces
                # that start/end with punctuation (e.g. "(ADR)") unmatchable
                def _alt(s: str) -> str:
                    lb = r"\b" if (s[:1].isalnum() or s[:1] == "_") else ""
                    rb = r"\b" if (s[-1:].isalnum() or s[-1:] == "_") else ""
                    return lb + re.escape(s) + rb

                pattern = "(?:" + "|".join(_alt(s) for s in ordered) + ")"
            self._surface_regex = re.compile(pattern, re.IGNORECASE)
        return self._surface_regex

    @property
    def size(self) -> int:
        return len(self.index_rows)


def _transitive_closure(parents: dict[str, list[str]]) -> list[tuple[str, str, int]]:
    """BFS per node over ``subClassOf`` edges; yields (desc, anc, depth)
    with depth 0 = the node itself (the reference's ``transitive_objects``
    also yields the subject first,
    /root/reference/app/lmss_classification.py:163-165)."""
    out: list[tuple[str, str, int]] = []
    for node in sorted(parents):
        seen = {node: 0}
        frontier = [node]
        depth = 0
        while frontier:
            depth += 1
            nxt: list[str] = []
            for n in frontier:
                for p in parents.get(n, ()):
                    if p not in seen:
                        seen[p] = depth
                        nxt.append(p)
            frontier = nxt
        out.extend((node, anc, d) for anc, d in sorted(seen.items(), key=lambda kv: (kv[1], kv[0])))
    return out


def build_artifacts(
    index_rows: list[dict],
    owl_thing: str = "http://www.w3.org/2002/07/owl#Thing",
    encoder_spec: str = DEFAULT_ENCODER_SPEC,
) -> OntologyArtifacts:
    """Build the full artifact bundle from parsed entity rows.

    ``index_rows`` must already be in frozen sorted-IRI order with
    ``index_pos`` (see ontology/owl.py).  ``encoder_spec`` selects the
    registered text encoder (encoder.get_encoder) used for every field
    embedding and is stamped into the bundle so all downstream scoring
    uses the same model.
    """
    encoder = get_encoder(encoder_spec)
    iris = [r["rdf_about"] for r in index_rows]
    labels = [r["rdfs_label"] for r in index_rows]
    known = set(iris)

    # --- field embeddings + per-iri mean (A3) ------------------------------
    field_embeddings: list[tuple[str, str, list[float]]] = []
    mean = np.zeros((len(index_rows), encoder.dim), dtype=np.float64)
    has_emb = np.zeros(len(index_rows), dtype=bool)
    for pos, row in enumerate(index_rows):
        vecs = []
        for fld in EMBEDDING_FIELDS:
            text = _field_text(row, fld)
            if text:
                v = encoder.encode(text)
                vecs.append(v)
                field_embeddings.append((row["rdf_about"], fld, v.tolist()))
        if vecs:
            mean[pos] = np.mean(np.stack(vecs), axis=0)
            has_emb[pos] = True
    norms = np.linalg.norm(mean, axis=1)
    nz = norms > 0
    mean[nz] /= norms[nz, None]

    # --- closure (J4) + top classes (A2) -----------------------------------
    parents = {r["rdf_about"]: [p for p in r.get("subClassOf", [])] for r in index_rows}
    closure = _transitive_closure(parents)

    top_iris = sorted(
        iri for iri, ps in parents.items() if owl_thing in ps
    )
    top_label = {iri: labels[iris.index(iri)] for iri in top_iris}
    # entities_count = number of known strict descendants (recursive count,
    # /root/reference/app/lmss_parser.py:92-99,106-112).
    desc_count = {iri: 0 for iri in top_iris}
    for desc, anc, depth in closure:
        if depth > 0 and anc in desc_count and desc in known:
            desc_count[anc] += 1
    top_classes = sorted(
        (
            {"iri": iri, "label": top_label[iri], "entities_count": desc_count[iri]}
            for iri in top_iris
        ),
        key=lambda r: r["label"],
    )

    # --- branch map (J5): min-depth ancestor among top classes, self
    # included; lexicographic anc_iri tiebreak (SURVEY.md §7 deviation (c)).
    top_set = set(top_iris)
    branch_map: dict[str, str] = {}
    best: dict[str, tuple[int, str]] = {}
    for desc, anc, depth in closure:
        if anc in top_set:
            cur = best.get(desc)
            if cur is None or (depth, anc) < cur:
                best[desc] = (depth, anc)
    for desc, (_, anc) in best.items():
        branch_map[desc] = top_label[anc]

    # --- mention dictionary + fuzzy-prefilter trigram index ----------------
    surfaces: list[tuple[str, int]] = []
    for pos, row in enumerate(index_rows):
        cands = [row["rdfs_label"], row.get("skos_prefLabel", "")]
        cands.extend(row.get("skos_altLabel", []))
        for s in cands:
            s = (s or "").strip().lower()
            if len(s) >= MIN_SURFACE_LEN:
                surfaces.append((s, pos))
    surfaces = sorted(set(surfaces))

    # trigram index over EVERY dictionary surface (labels + prefLabels +
    # altLabels) — typo'd alias mentions must be recoverable too
    surface_texts = [s for s, _ in surfaces]
    label_trigrams = [char_trigrams(s) for s in surface_texts]
    postings_lists: dict[str, list[int]] = {}
    for sid, tris in enumerate(label_trigrams):
        for g in tris:
            postings_lists.setdefault(g, []).append(sid)
    # int32 posting arrays: the fuzzy-window prefilter tallies shared
    # trigram counts with one np.bincount over concatenated postings
    postings = {g: np.asarray(lst, dtype=np.int32) for g, lst in postings_lists.items()}

    return OntologyArtifacts(
        index_rows=index_rows,
        labels=labels,
        iris=iris,
        mean_matrix=mean.astype(np.float32),
        row_has_embedding=has_emb,
        branch_map=branch_map,
        top_classes=top_classes,
        closure=closure,
        field_embeddings=field_embeddings,
        surfaces=surfaces,
        label_trigrams=label_trigrams,
        trigram_postings=postings,
        encoder_spec=encoder_spec,
    )
