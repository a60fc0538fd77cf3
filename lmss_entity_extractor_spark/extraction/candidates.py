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
    """Leftmost-longest non-overlapping dictionary hits.

    ASCII fast path: when text and every surface are ASCII, IGNORECASE
    regex matching over the longest-first alternation is equivalent to
    ``str.find`` over the lowered text with explicit word-boundary
    checks — measured 2.8x faster than the compiled alternation (the
    dictionary channel was ~25% of the extraction kernel).  Candidates
    from all surfaces are merged leftmost-longest exactly like the regex
    scan (smallest start, then longest, non-overlapping, resume at the
    match end).  Non-ASCII input falls back to the regex (Unicode case
    folding and \\b semantics stay byte-identical by construction)."""
    finder = getattr(artifacts, "_surface_finder", None)
    if finder is None:
        ordered = sorted({s for s, _ in artifacts.surfaces}, key=lambda s: (-len(s), s))
        all_ascii = all(s.isascii() for s in ordered)
        finder = (
            [
                (
                    s.lower(),
                    s[:1].isalnum() or s[:1] == "_",
                    s[-1:].isalnum() or s[-1:] == "_",
                )
                for s in ordered
            ]
            if all_ascii
            else None,
        )
        artifacts._surface_finder = finder
    surfs = finder[0]
    if surfs is None or not text.isascii():
        out: list[Span] = []
        for m in artifacts.surface_regex().finditer(text):
            s, e = m.span()
            out.append((m.group(), s, e, DICT_TYPE))
        return out
    low = text.lower()
    n = len(low)
    cands: list[tuple[int, int]] = []
    for s, chk_lb, chk_rb in surfs:
        p = low.find(s)
        if p < 0:
            continue
        ls = len(s)
        while p >= 0:
            e = p + ls
            if (not chk_lb or p == 0 or not (low[p - 1].isalnum() or low[p - 1] == "_")) and (
                not chk_rb or e == n or not (low[e].isalnum() or low[e] == "_")
            ):
                cands.append((p, e))
            p = low.find(s, p + 1)
    if not cands:
        return []
    cands.sort(key=lambda t: (t[0], -t[1]))
    out = []
    pos = 0
    for st, en in cands:
        if st >= pos:
            out.append((text[st:en], st, en, DICT_TYPE))
            pos = en
    return out


def fuzzy_window_spans(
    text: str,
    artifacts: OntologyArtifacts,
    threshold: float = FUZZY_JACCARD_THRESHOLD,
    max_window: int = FUZZY_MAX_WINDOW,
    _pre: tuple | None = None,
) -> list[Span]:
    """Token n-gram windows that look like some ontology label.

    A window qualifies when char-trigram Jaccard similarity against the
    best-overlapping label reaches ``threshold``.  Windows may not start
    or end with a stop word (proxy for the reference's stop-root noun
    chunk filter, /root/reference/app/entity_extraction.py:121-125).
    """
    import numpy as np

    if _pre is None:
        toks = tokenize_with_offsets(text)
        tok_lower = [t[0].lower() for t in toks]
        tok_stop = [t in STOPWORDS for t in tok_lower]
    else:  # batch path hands down its pre-pass (no double tokenization)
        toks, tok_lower, tok_stop = _pre
    surf_sizes = artifacts.label_tri_sizes
    out: list[Span] = []
    n_toks = len(toks)
    if n_toks == 0:
        return out

    # Batched window scoring: all (start, n) window similarities in
    # ~max_window ufunc calls via prefix sums over the (token, surface)
    # tally matrix — the per-window numpy-call form spends its time in
    # allocator/dispatch overhead on tiny vectors (profiled: ~55% of the
    # extraction kernel).  sims[n-1][i] = best multiset-Jaccard of the
    # window of n tokens starting at i; -1 where wsize == 0.  Falls back
    # to the incremental loop when the matrix would not fit comfortably
    # (huge ontology x very long turn).
    S = len(surf_sizes)
    if n_toks * S <= 16_000_000:
        # per-token tallies live as rows of one cached matrix, so the
        # whole turn's (token, surface) table is a single fancy-index
        # gather instead of n_toks small-array adds
        T, z = _tally_rows(artifacts, tok_lower)
        P = np.zeros((n_toks + 1, S), np.int32)
        np.cumsum(T, axis=0, out=P[1:])
        Z = np.concatenate(([0], np.cumsum(z)))
        sims = []
        for n in range(1, max_window + 1):
            if n > n_toks:
                break
            C = P[n:] - P[:-n]
            W = (Z[n:] - Z[:-n]).astype(np.float64)
            # when W > 0: denom = W + surf - C >= max(W, surf) > 0, so the
            # unguarded divide is safe on every row that survives the mask
            denom = np.maximum(W[:, None] + surf_sizes[None, :] - C, 1.0)
            sim_n = np.where(W > 0, np.max(C / denom, axis=1) if S else 0.0, -1.0)
            # python-list indexing beats per-element ndarray item access
            # in the scan loop below (hundreds of lookups per turn)
            sims.append(sim_n.tolist())

        def window_sim(i: int, n: int) -> float:
            return sims[n - 1][i]
    else:
        tallies = [_token_tally(artifacts, t) for t in tok_lower]

        def window_sim(i: int, n: int) -> float:
            counts = tallies[i][0].copy()
            wsize = tallies[i][1]
            for k in range(i + 1, i + n):
                counts += tallies[k][0]
                wsize += tallies[k][1]
            if wsize == 0:
                return -1.0
            return float((counts / (wsize + surf_sizes - counts)).max())

    _scan_windows(text, toks, tok_stop, window_sim, threshold, max_window, out)
    return out


def _scan_windows(text, toks, tok_stop, window_sim, threshold, max_window, out) -> None:
    """The per-turn window scan shared by the per-turn and cross-turn
    batched fuzzy paths (one body, zero parity drift): evaluate windows
    starting at each non-stop token, keep the best-scoring one — spaCy
    noun chunks never overlap each other, and emitting every qualifying
    sub-window would splice garbage in the merge scan."""
    n_toks = len(toks)
    i = 0
    while i < n_toks:
        if tok_stop[i]:
            i += 1
            continue
        best = None  # (similarity, n)
        for n in range(1, max_window + 1):
            j = i + n - 1
            if j >= n_toks:
                break
            if tok_stop[j]:
                continue  # window may extend past an inner stop word
            if toks[j][2] - toks[i][1] < 3:
                continue
            sim = window_sim(i, n)  # -1 when wsize == 0
            if sim >= threshold and (best is None or (sim, n) > best):
                best = (sim, n)
        if best is None:
            i += 1
        else:
            _, n = best
            start, end = toks[i][1], toks[i + n - 1][2]
            out.append((text[start:end], start, end, FUZZY_TYPE))
            i = i + n  # windows never overlap


# cells budget per batched chunk: big enough to amortize ufunc dispatch
# across tens of turns, SMALL enough that the working set (int32 prefix
# matrix + two float64 per-n buffers ~ 20 bytes/cell -> ~2 MB at 100k
# cells) stays cache-resident per worker.  Measured: 100k-500k are
# equivalent on one core (1.4x over per-turn), but multi-MB chunks turn
# DRAM-bound and 32 concurrent workers then saturate memory bandwidth —
# a 4M-cell budget measured 2.6x SLOWER than per-turn at local[32].
_BATCH_CELL_BUDGET = 100_000


def fuzzy_window_spans_batch(
    texts: list[str],
    artifacts: OntologyArtifacts,
    threshold: float = FUZZY_JACCARD_THRESHOLD,
    max_window: int = FUZZY_MAX_WINDOW,
    _pres: list | None = None,
) -> list[list[Span]]:
    """``fuzzy_window_spans`` over a whole Arrow batch of turns at once.

    The per-turn batched form still pays numpy dispatch per turn on tiny
    (n_toks x S) matrices (~60% of kernel time profiled at ~213 us/turn).
    Here the prefix-sum/tally machinery runs over the CONCATENATED token
    stream of many turns (chunked to ``_BATCH_CELL_BUDGET`` cells), so
    the ufunc cost amortizes across the chunk.  Output is BIT-IDENTICAL
    to the per-turn form: an in-turn window's counts are sums of exactly
    the same tally rows whichever prefix matrix they come from, and rows
    that straddle turn boundaries are simply never queried by the
    per-turn scan (same ``_scan_windows`` body).
    """
    surf_sizes = artifacts.label_tri_sizes
    S = len(surf_sizes)
    results: list[list[Span]] = [[] for _ in texts]
    per_turn = []  # (turn_index, toks, tok_lower, tok_stop)
    if _pres is None:
        for ti, text in enumerate(texts):
            toks = tokenize_with_offsets(text)
            if not toks:
                continue
            tok_lower = [t[0].lower() for t in toks]
            per_turn.append((ti, toks, tok_lower, [t in STOPWORDS for t in tok_lower]))
    else:  # caller (generate_candidates_batch) hands down its token pre-pass
        for ti, pre in enumerate(_pres):
            if pre[0]:
                per_turn.append((ti, *pre))

    # chunk turns under the cell budget (a single huge turn falls back to
    # the per-turn path, which has its own large-input fallback)
    chunk: list = []
    chunk_cells = 0
    max_cells = max(_BATCH_CELL_BUDGET, 1)
    for entry in per_turn:
        cells = len(entry[1]) * max(S, 1)
        if cells > max_cells:
            ti, toks, tok_lower, tok_stop = entry
            results[ti] = fuzzy_window_spans(
                texts[ti], artifacts, threshold, max_window, _pre=(toks, tok_lower, tok_stop)
            )
            continue
        if chunk and chunk_cells + cells > max_cells:
            _fuzzy_chunk(texts, chunk, artifacts, threshold, max_window, results)
            chunk, chunk_cells = [], 0
        chunk.append(entry)
        chunk_cells += cells
    if chunk:
        _fuzzy_chunk(texts, chunk, artifacts, threshold, max_window, results)
    return results


def _fuzzy_chunk(texts, chunk, artifacts, threshold, max_window, results) -> None:
    """Chunk body of the batched fuzzy channel.  Two refinements over the
    dense prefix-sum form (bit-identical results, pinned by tests):

    * window similarities are computed ONLY at positions the per-turn
      scan can query — non-stop start AND end token, both in the same
      turn, char width >= 3 — via one boolean mask per window size
      (roughly half of all flat positions are stop-started or straddle a
      turn boundary, and their (rows x S) divide+max was pure waste);
    * the scan's inner "best (sim, n) per start" loop is vectorized:
      processing n ascending with a ``sim >= best`` update reproduces
      the lexicographic (sim, n) > best tie rule exactly, so the
      per-turn walk below only jumps starts and slices text.
    """
    import numpy as np

    surf_sizes = artifacts.label_tri_sizes
    S = len(surf_sizes)
    flat_lower: list[str] = []
    offsets: list[int] = []
    stops: list[bool] = []
    t_ids: list[int] = []
    c_starts: list[int] = []
    c_ends: list[int] = []
    for t_i, (_, toks, tok_lower, tok_stop) in enumerate(chunk):
        offsets.append(len(flat_lower))
        flat_lower.extend(tok_lower)
        stops.extend(tok_stop)
        t_ids.extend([t_i] * len(toks))
        c_starts.extend(t[1] for t in toks)
        c_ends.extend(t[2] for t in toks)
    ct = len(flat_lower)
    T, z = _tally_rows(artifacts, flat_lower)
    P = np.zeros((ct + 1, S), np.int32)
    np.cumsum(T, axis=0, out=P[1:])
    Z = np.concatenate(([0], np.cumsum(z)))
    nonstop = ~np.asarray(stops, bool)
    tid = np.asarray(t_ids, np.int32)
    cs = np.asarray(c_starts, np.int64)
    ce = np.asarray(c_ends, np.int64)
    best_sim = np.full(ct, -1.0)
    best_n = np.zeros(ct, np.int64)
    for n in range(1, max_window + 1):
        if n > ct:
            break
        m = ct - n + 1
        valid = nonstop[:m] & nonstop[n - 1 :] & (ce[n - 1 :] - cs[:m] >= 3)
        if n > 1:
            valid &= tid[:m] == tid[n - 1 :]
        idx = np.nonzero(valid)[0]
        if idx.size == 0:
            continue
        C = P[idx + n] - P[idx]
        W = (Z[idx + n] - Z[idx]).astype(np.float64)
        if S:
            denom = np.maximum(W[:, None] + surf_sizes[None, :] - C, 1.0)
            sim = np.where(W > 0, np.max(C / denom, axis=1), -1.0)
        else:
            sim = np.where(W > 0, 0.0, -1.0)
        upd = sim >= best_sim[idx]
        ii = idx[upd]
        best_sim[ii] = sim[upd]
        best_n[ii] = n
    bs = best_sim.tolist()
    bn = best_n.tolist()
    for (ti, toks, _, tok_stop), g0 in zip(chunk, offsets):
        out = results[ti]
        text = texts[ti]
        n_toks = len(toks)
        i = 0
        while i < n_toks:
            if tok_stop[i] or bs[g0 + i] < threshold:
                i += 1
            else:
                n = bn[g0 + i]
                start, end = toks[i][1], toks[i + n - 1][2]
                out.append((text[start:end], start, end, FUZZY_TYPE))
                i += n


def _tally_rows(artifacts: OntologyArtifacts, tokens: list[str]):
    """Gather this turn's (token, surface) tally table: returns
    ``(T, z)`` where ``T[k]`` is token k's shared-count row (int32,
    length S) and ``z[k]`` its trigram count.

    Tokens are cached as rows of one process-wide matrix (doubling,
    capped at ~64M int32 cells so a huge ontology bounds the cache by
    memory, not entry count; no eviction).  The common case is a single
    fancy-index gather; tokens that arrive after the cap is reached are
    computed per call and patched into the gathered block — never a copy
    of the whole cached matrix."""
    import numpy as np

    store = getattr(artifacts, "_tally_store", None)
    S = len(artifacts.label_tri_sizes)
    if store is None:
        # max_rows bounds the cache by MEMORY (64M int32 cells), so for a
        # huge ontology (large S) it can drop below the starting capacity
        # — cap must respect it or the eager allocation itself blows the
        # budget (np.zeros((1024, S)) at S=1M is 4 GB)
        max_rows = max(1, 64_000_000 // max(S, 1))
        cap = min(1024, max_rows)
        store = {
            "ids": {},
            "mat": np.zeros((cap, S), np.int32),
            "sizes": np.zeros(cap, np.int64),
            "n": 0,
            "max_rows": max_rows,
        }
        artifacts._tally_store = store
    idmap, n = store["ids"], store["n"]
    ids = np.empty(len(tokens), np.int64)
    overflow: dict[int, tuple] = {}  # position in `tokens` -> (vec, size)
    for k, tok in enumerate(tokens):
        idx = idmap.get(tok)
        if idx is None:
            vec, size = _compute_tally(artifacts, tok, S)
            if n < store["max_rows"]:
                if n == len(store["sizes"]):
                    grow = min(len(store["sizes"]) * 2, store["max_rows"])
                    store["mat"] = np.resize(store["mat"], (grow, S))
                    store["mat"][n:] = 0
                    store["sizes"] = np.resize(store["sizes"], grow)
                store["mat"][n] = vec
                store["sizes"][n] = size
                idx = idmap[tok] = n
                n += 1
            else:  # cache full: patch this row into the gathered block
                overflow[k] = (vec, size)
                idx = 0  # placeholder; overwritten below
        ids[k] = idx
    store["n"] = n
    T = store["mat"][ids]
    z = store["sizes"][ids]
    for k, (vec, size) in overflow.items():
        T[k] = vec
        z[k] = size
    return T, z


def _compute_tally(artifacts: OntologyArtifacts, token: str, n_surfaces: int):
    """(shared-count vector over surfaces, n_trigrams) for one token."""
    import numpy as np

    tris = char_trigrams(token)
    vec = np.zeros(n_surfaces, dtype=np.int32)
    postings = artifacts.trigram_postings
    for g in tris:
        p = postings.get(g)
        if p is not None:
            vec[p] += 1
    return vec, len(tris)


def _token_tally(artifacts: OntologyArtifacts, token: str):
    """(shared-count vector over surfaces, n_trigrams) for one token,
    cached on the (executor-local) artifacts object.  Fallback-path twin
    of ``_tally_rows`` (same ``_compute_tally``, separate small cache —
    only workers seeing pathologically long turns ever populate it)."""
    cache = getattr(artifacts, "_tok_tally_cache", None)
    if cache is None:
        cache = {}
        artifacts._tok_tally_cache = cache
    hit = cache.get(token)
    if hit is None:
        hit = _compute_tally(artifacts, token, len(artifacts.label_tri_sizes))
        if len(cache) < 500_000:
            cache[token] = hit
    return hit


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
    # NOTE: offsets are measured in text.lower(), exactly like the
    # reference (/root/reference/app/entity_extraction.py:136-140) — for
    # the rare Unicode chars whose lowercase form changes string length
    # (e.g. U+0130), downstream offsets inherit the reference's own skew;
    # faithful by design, do not "fix" without diverging from parity.
    # one tokenizing pass collects counts AND positions: a ``\b<kw>\b``
    # re-scan per keyword matches exactly the token occurrences of kw
    # (kw is itself a \w\w+ token, and \w-adjacency blocks \b the same
    # way it extends the token), so the k extra regex passes of the
    # reference formulation are redundant work
    positions: dict[str, list[tuple[int, int]]] = {}
    for m in _KEYWORD_TOKEN_RE.finditer(lowered):
        t = m.group()
        if t not in STOPWORDS:
            positions.setdefault(t, []).append(m.span())
    if not positions:
        return []
    top = sorted(positions.items(), key=lambda kv: (-len(kv[1]), kv[0]))[:top_k]
    out: list[Span] = []
    for kw, spans_kw in top:
        for s, e in spans_kw:
            out.append((kw, s, e, KEYWORD_TYPE))
    return out


def _keyword_spans_from_tokens(
    toks: list[tuple[str, int, int]], tok_lower: list[str], top_k: int = TOP_K_KEYWORDS
) -> list[Span]:
    """``keyword_spans`` for ASCII text, reusing the fuzzy channel's
    token pre-pass instead of re-tokenizing the lowered text.  For ASCII
    input the two derivations are identical: ``str.lower`` is
    length-preserving and ``\\w`` membership is case-insensitive, so the
    maximal ``\\w+`` runs of the original text ARE the ``\\b\\w\\w+\\b``
    tokens of the lowered text (same offsets), filtered to length >= 2."""
    positions: dict[str, list[tuple[int, int]]] = {}
    for tok, t3 in zip(tok_lower, toks):
        if len(tok) > 1 and tok not in STOPWORDS:
            ps = positions.get(tok)
            if ps is None:
                positions[tok] = [(t3[1], t3[2])]
            else:
                ps.append((t3[1], t3[2]))
    if not positions:
        return []
    top = sorted(positions.items(), key=lambda kv: (-len(kv[1]), kv[0]))[:top_k]
    out: list[Span] = []
    for kw, spans_kw in top:
        for s, e in spans_kw:
            out.append((kw, s, e, KEYWORD_TYPE))
    return out


def generate_candidates(text: str, artifacts: OntologyArtifacts) -> list[Span]:
    """All candidate spans in the reference's channel order."""
    return (
        dictionary_spans(text, artifacts)
        + fuzzy_window_spans(text, artifacts)
        + keyword_spans(text)
    )


def generate_candidates_batch(texts: list[str], artifacts: OntologyArtifacts) -> list[list[Span]]:
    """``generate_candidates`` for a whole Arrow batch: one token
    pre-pass per turn feeds BOTH the cross-turn batched fuzzy channel
    (the kernel's dominant cost) and, for ASCII turns, the keyword
    channel (``_keyword_spans_from_tokens`` — the lowered-text re-scan
    is redundant there); the dictionary channel stays per-turn.  Channel
    order per turn is identical to the per-turn form."""
    pres = []
    for text in texts:
        toks = tokenize_with_offsets(text)
        if toks:
            tok_lower = [t[0].lower() for t in toks]
            pres.append((toks, tok_lower, [t in STOPWORDS for t in tok_lower]))
        else:
            pres.append(((), (), ()))
    fuzzy = fuzzy_window_spans_batch(texts, artifacts, _pres=pres)
    return [
        dictionary_spans(t, artifacts)
        + fz
        + (_keyword_spans_from_tokens(pre[0], pre[1]) if t.isascii() else keyword_spans(t))
        for t, fz, pre in zip(texts, fuzzy, pres)
    ]
