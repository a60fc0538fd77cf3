"""Shared text-processing primitives: tokenization, stop words, and
pure-Python reimplementations of the fuzzy string ratios the reference
delegates to ``fuzzywuzzy`` + ``python-Levenshtein``
(/root/reference/app/lmss_classification.py:88,
/root/reference/app/lmss_search.py:95-96).

These run on both sides of the parity gate: inside the Spark pandas UDFs
and inside the single-process oracle (``oracle/reference_oracle.py``), so
they must be deterministic pure functions of their inputs.

Ratio semantics follow python-Levenshtein's ``ratio`` (indel distance,
substitution cost 2):  ratio(a, b) = 2 * LCS(a, b) / (len(a) + len(b)),
and fuzzywuzzy's ``token_set_ratio`` / ``partial_ratio`` compositions on
top of it.  ``partial_ratio`` uses difflib matching blocks to pick the
candidate alignment windows, as fuzzywuzzy does.
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher

import numpy as np
from functools import lru_cache
from pathlib import Path

_WORD_RE = re.compile(r"\w+", re.UNICODE)
# fuzzywuzzy's full_process: non-alphanumeric -> space, lower, strip.
_NON_WORD_RE = re.compile(r"\W+", re.UNICODE)
_WS_SEARCH = re.compile(r"\s").search

_STOPWORDS_PATH = Path(__file__).resolve().parent.parent / "fixtures" / "stopwords.txt"


def load_stopwords(path: str | Path | None = None) -> frozenset[str]:
    """Frozen stop-word fixture shared by pipeline and oracle.

    Stands in for spaCy's ``nlp.Defaults.stop_words``
    (/root/reference/app/entity_extraction.py:12-13).

    Zip-aware: when the package is shipped to executors via
    ``spark-submit --py-files pkg.zip``, ``fixtures/stopwords.txt`` lives
    inside the zip (tools/make_pyfiles.py) and is read through zipfile.
    """
    if path is not None:
        text = Path(path).read_text()
    else:
        try:
            text = _STOPWORDS_PATH.read_text()
        except OSError:
            import zipfile

            parts = str(Path(__file__)).split(".zip")
            with zipfile.ZipFile(parts[0] + ".zip") as zf:
                text = zf.read("fixtures/stopwords.txt").decode()
    words = [w.strip() for w in text.splitlines()]
    return frozenset(w for w in words if w)


STOPWORDS: frozenset[str] = load_stopwords()


def full_process(s: str) -> str:
    """Normalize a string the way fuzzywuzzy's default full_process does:
    force_ascii (drop non-ASCII code points — the reference calls every
    ratio with the default ``force_ascii=True``), non-alphanumerics to
    spaces, lowercase, strip.  The pinned encoder normalizes through the
    same function, so both sides of the parity gate fold identically."""
    if not s.isascii():
        s = s.encode("ascii", "ignore").decode("ascii")
    return _NON_WORD_RE.sub(" ", s).lower().strip()


def tokenize_with_offsets(text: str) -> list[tuple[str, int, int]]:
    """``\\w+`` tokens with (token, start, end) char offsets into *text*."""
    return [(m.group(0),) + m.span() for m in _WORD_RE.finditer(text)]


def strip_leading_stopwords(text: str, stopwords: frozenset[str] = STOPWORDS) -> tuple[str, int]:
    """Drop leading stop words from a phrase; return (trimmed, char_offset).

    Mirrors the reference rule (/root/reference/app/entity_extraction.py:28-35):
    whitespace-split, walk words until the first non-stop word, offset
    advances by len(word)+1 per dropped word; a phrase made entirely of
    stop words is returned unchanged with offset 0.
    """
    if _WS_SEARCH(text) is None:
        # single-token phrase (the common case — every KEYWORD span):
        # both branches of the loop below return (text, 0) verbatim —
        # " ".join([text]) == text whether or not it is a stop word
        return text, 0
    words = text.split()
    offset = 0
    for k, w in enumerate(words):
        if w.lower() not in stopwords:
            # NOTE: " ".join re-normalizes internal whitespace even when
            # k == 0 — the reference does the same, and the oracle parity
            # depends on it, so no verbatim fast path here
            return " ".join(words[k:]), offset
        offset += len(w) + 1
    return text, 0


# ---------------------------------------------------------------------------
# Fuzzy ratios
# ---------------------------------------------------------------------------


def _lcs_len(a: str, b: str) -> int:
    """Length of the longest common subsequence.

    Bit-parallel Allison-Dix/Hyyroe form over Python big ints: one
    bitmask per distinct char of the shorter string, then per char of
    the longer string a constant number of word-wide bit operations —
    O(|a| * |b| / wordsize) with tiny constants.  This is the linker's
    hottest function (fuzzy scoring is O(uniq_mentions x classes) ratio
    evaluations); it replaced a numpy row-DP that spent its time in
    per-row ufunc dispatch (measured ~8x slower)."""
    if not a or not b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    masks: dict[str, int] = {}
    bit = 1
    for c in b:
        masks[c] = masks.get(c, 0) | bit
        bit <<= 1
    width_mask = bit - 1  # len(b) ones
    v = width_mask
    get = masks.get
    for c in a:
        u = v & get(c, 0)
        v = ((v + u) | (v - u)) & width_mask
    # each matched subsequence element clears one bit of v
    return len(b) - v.bit_count()


def indel_ratio(a: str, b: str) -> float:
    """python-Levenshtein-style ratio: 2*LCS / (len(a)+len(b)), in [0,1]."""
    total = len(a) + len(b)
    if total == 0:
        return 1.0
    return 2.0 * _lcs_len(a, b) / total


def simple_ratio(a: str, b: str) -> int:
    """fuzz.ratio equivalent: rounded percentage of ``indel_ratio``."""
    return int(round(100 * indel_ratio(a, b)))


def token_set_ratio(a: str, b: str) -> int:
    """fuzzywuzzy ``token_set_ratio``: compare sorted intersection against
    intersection+remainder strings, take the max pairwise simple ratio.

    Reference call sites: /root/reference/app/lmss_classification.py:88,
    /root/reference/app/lmss_search.py:95.
    """
    ta = set(full_process(a).split())
    tb = set(full_process(b).split())
    # fuzzywuzzy validates processed strings: either side empty -> 0
    if not ta or not tb:
        return 0
    # exact early-out: when one token set contains the other, the sorted
    # intersection equals one of the combined strings, whose self-ratio
    # is 100 — the pairwise max is therefore exactly 100.
    if ta <= tb or tb <= ta:
        return 100
    inter = sorted(ta & tb)
    rest_a = sorted(ta - tb)
    rest_b = sorted(tb - ta)

    s_inter = " ".join(inter)
    s_a = (s_inter + " " + " ".join(rest_a)).strip()
    s_b = (s_inter + " " + " ".join(rest_b)).strip()

    return max(
        simple_ratio(s_inter, s_a),
        simple_ratio(s_inter, s_b),
        simple_ratio(s_a, s_b),
    )


def partial_ratio(a: str, b: str) -> int:
    """fuzzywuzzy ``partial_ratio``: best ratio of the shorter string vs
    same-length windows of the longer, windows chosen from difflib
    matching blocks (/root/reference/app/lmss_search.py:96).

    Known deviation (documented, not silent): the reference environment
    installs python-Levenshtein, whose fuzzywuzzy backend derives
    matching blocks from Levenshtein editops rather than difflib's
    longest-match recursion; for some pairs the two evaluate different
    candidate windows and return different percentages.  This affects
    only the 0.3-weighted partial term of hybrid search ranking, never
    linking (which uses token_set_ratio alone)."""
    # fuzzywuzzy wraps partial_ratio in @check_empty_string: either input
    # empty -> 0 (including both empty)
    if not a or not b:
        return 0
    if len(a) <= len(b):
        shorter, longer = a, b
    else:
        shorter, longer = b, a

    blocks = SequenceMatcher(None, shorter, longer).get_matching_blocks()
    best = 0.0
    for block in blocks:
        start = max(block.b - block.a, 0)
        window = longer[start : start + len(shorter)]
        r = indel_ratio(shorter, window)
        if r > 0.995:
            return 100
        if r > best:
            best = r
    return int(round(100 * best))


@lru_cache(maxsize=65536)
def cached_token_set_ratio(a: str, b: str) -> int:
    """Memoized ``token_set_ratio`` for the linker's hot loop (mention
    surface forms repeat heavily across turns — Zipf-distributed)."""
    return token_set_ratio(a, b)


# full_process output is alphanumeric+space only, so "#" is a safe pad.
_TRIGRAM_PAD = "#"


def char_trigrams(s: str) -> frozenset[str]:
    """Character trigrams of a phrase: the union of padded per-token
    trigrams of the normalized string ("#tok#" boundaries).

    Token-level decomposition (rather than one padded string) lets the
    candidate generator cache trigram sets per token and build window
    sets as cheap set unions — the mention-detection hot path."""
    out: set[str] = set()
    for tok in full_process(s).split():
        out |= _token_trigrams(tok)
    return frozenset(out)


_token_tri_cache: dict[str, frozenset] = {}


def _token_trigrams(tok: str) -> frozenset:
    tris = _token_tri_cache.get(tok)
    if tris is None:
        padded = _TRIGRAM_PAD + tok + _TRIGRAM_PAD
        if len(padded) < 3:
            tris = frozenset((padded,))
        else:
            tris = frozenset(padded[i : i + 3] for i in range(len(padded) - 2))
        if len(_token_tri_cache) < 1_000_000:
            _token_tri_cache[tok] = tris
    return tris
