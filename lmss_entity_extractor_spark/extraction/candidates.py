"""Per-turn candidate span generation (operator U1 of SURVEY.md §2.10).

The reference's candidate channels are spaCy NER, spaCy noun chunks and
single-document TF-IDF keywords
(/root/reference/app/entity_extraction.py:112-147).  spaCy/sklearn are
not available here, and the sanctioned redesign (BASELINE.json
``north_star``, SURVEY.md §7 deviation (b)) replaces them with exact +
fuzzy span matching against the broadcast LMSS label/alias dictionary,
feeding the *same* downstream merge (W2) and linking (J1/J2) semantics:

  * channel 1 — exact dictionary hits (leftmost-longest, word-boundary,
    case-insensitive) typed ``NER_LMSS``: like reference NER spans they
    are frozen through the merge,
  * channel 2 — fuzzy token-window candidates typed ``NOUN_PHRASE``:
    token n-grams whose char-trigram Jaccard overlap with some ontology
    label clears a threshold (catches typo'd / inflected variants; plays
    the role of noun chunks, including the adjacent-phrase merge rule),
  * channel 3 — top-k term-frequency keywords typed ``KEYWORD``,
    mirroring the reference's degenerate single-doc TF-IDF (SURVEY.md §2
    T2: single-doc fit => l2-normalized term frequency).

All three channels are pure functions of (text, artifacts) — the same
code runs inside the Arrow-batched Spark UDF and the single-process
oracle, and they are concatenated in the reference's channel order
(NER + noun phrases + keywords,
/root/reference/app/entity_extraction.py:146).
"""

from __future__ import annotations

import re
from collections import Counter

from ..ontology.artifacts import OntologyArtifacts
from ..textproc import STOPWORDS, char_trigrams, tokenize_with_offsets

Span = tuple[str, int, int, str]  # (text, start, end, type)

DICT_TYPE = "NER_LMSS"
FUZZY_TYPE = "NOUN_PHRASE"
KEYWORD_TYPE = "KEYWORD"

FUZZY_JACCARD_THRESHOLD = 0.35
FUZZY_MAX_WINDOW = 4
TOP_K_KEYWORDS = 10

# sklearn's default token_pattern is (?u)\b\w\w+\b
# (/root/reference/app/entity_extraction.py:128 uses TfidfVectorizer
# defaults apart from stop_words).
_KEYWORD_TOKEN_RE = re.compile(r"\b\w\w+\b", re.UNICODE)


def dictionary_spans(text: str, artifacts: OntologyArtifacts) -> list[Span]:
    """Leftmost-longest non-overlapping dictionary hits."""
    out: list[Span] = []
    for m in artifacts.surface_regex().finditer(text):
        out.append((text[m.start() : m.end()], m.start(), m.end(), DICT_TYPE))
    return out


def fuzzy_window_spans(
    text: str,
    artifacts: OntologyArtifacts,
    threshold: float = FUZZY_JACCARD_THRESHOLD,
    max_window: int = FUZZY_MAX_WINDOW,
) -> list[Span]:
    """Token n-gram windows that look like some ontology label.

    A window qualifies when char-trigram Jaccard similarity against the
    best-overlapping label reaches ``threshold``.  Windows may not start
    or end with a stop word (proxy for the reference's stop-root noun
    chunk filter, /root/reference/app/entity_extraction.py:121-125).
    """
    toks = tokenize_with_offsets(text)
    postings = artifacts.trigram_postings
    label_tris = artifacts.label_trigrams
    out: list[Span] = []
    n_toks = len(toks)
    for i in range(n_toks):
        if toks[i][0].lower() in STOPWORDS:
            continue
        for n in range(1, max_window + 1):
            j = i + n - 1
            if j >= n_toks:
                break
            if toks[j][0].lower() in STOPWORDS:
                continue  # window may extend past an inner stop word
            start, end = toks[i][1], toks[j][2]
            surface = text[start:end]
            if len(surface) < 3:
                continue
            win_tris = char_trigrams(surface)
            if not win_tris:
                continue
            shared: Counter[int] = Counter()
            for g in win_tris:
                for pos in postings.get(g, ()):
                    shared[pos] += 1
            qualifies = False
            for pos, cnt in shared.items():
                union = len(win_tris) + len(label_tris[pos]) - cnt
                if union > 0 and cnt / union >= threshold:
                    qualifies = True
                    break
            if qualifies:
                out.append((surface, start, end, FUZZY_TYPE))
    return out


def keyword_spans(text: str, top_k: int = TOP_K_KEYWORDS) -> list[Span]:
    """Top-k term-frequency keywords and their word-boundary occurrences.

    Mirrors the reference keyword channel
    (/root/reference/app/entity_extraction.py:127-143): single-document
    TF-IDF degenerates to term frequency; ties break by token
    (deterministic stand-in for numpy argsort order); spans are located
    with ``\\b<kw>\\b`` over the lowercased text and carry the lowercase
    keyword as their surface form.
    """
    lowered = text.lower()
    counts = Counter(
        t for t in _KEYWORD_TOKEN_RE.findall(lowered) if t not in STOPWORDS
    )
    if not counts:
        return []
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    out: list[Span] = []
    for kw, _ in top:
        for m in re.finditer(r"\b" + re.escape(kw) + r"\b", lowered):
            out.append((kw, m.start(), m.end(), KEYWORD_TYPE))
    return out


def generate_candidates(text: str, artifacts: OntologyArtifacts) -> list[Span]:
    """All candidate spans in the reference's channel order."""
    return (
        dictionary_spans(text, artifacts)
        + fuzzy_window_spans(text, artifacts)
        + keyword_spans(text)
    )
