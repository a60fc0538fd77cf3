"""Text analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

Everything here is built-in-function column algebra — JVM-side,
whole-stage-codegen'd, no UDFs — and each has an equivalent ANSI-SQL
oracle form (__spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from .validate import validation_enabled

# minimal per-language stopword probes for the n-gram language heuristic
LANG_PROBES = {
    "en": r"\b(the|and|of|to|in)\b",
    "es": r"\b(el|la|de|que|los)\b",
    "fr": r"\b(le|la|les|des|est)\b",
    "de": r"\b(der|die|und|das|ist)\b",
}


# The ASCII punctuation class of the quality score's regex
# ([!-/:-@\[-`{-~]) spelled as an explicit character list: counting via
# translate-delete is ~2.5x cheaper than regexp_replace over the corpus
# (0 value mismatches over the full sf1.0 table, by construction - both
# forms count exactly the occurrences of these 32 code points).
_PUNCT_CHARS = "".join(
    chr(c)
    for c in (*range(0x21, 0x30), *range(0x3A, 0x41), *range(0x5B, 0x61), *range(0x7B, 0x7F))
)


def quality_score_expr(text_col: str = "text"):
    """The composite quality score as a bare column expression
    (floor-truncated to 4 decimals) — usable as a narrow filter predicate
    directly on the corpus scan (ops/curate.py) without materializing the
    stats table or joining anything."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_toks = F.size(toks)
    n_chars = F.length(F.col(text_col))
    uniq_ratio = F.size(F.array_distinct(toks)) / n_toks
    punct = n_chars - F.length(F.translate(F.col(text_col), _PUNCT_CHARS, ""))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    score = (
        F.least(n_toks / F.lit(64.0), F.lit(1.0)) * 0.4
        + uniq_ratio * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0))) * 0.2
    )
    return F.floor(score * 10000) / 10000


def quality_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features: char/token counts, mean token
    length, distinct-token ratio, punctuation ratio, and a composite
    quality score in [0,1]."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_toks = F.size(toks)
    n_chars = F.length(F.col(text_col))
    uniq_ratio = F.size(F.array_distinct(toks)) / n_toks
    punct = n_chars - F.length(F.translate(F.col(text_col), _PUNCT_CHARS, ""))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    mean_tok_len = (n_chars - (n_toks - 1)) / n_toks
    # floor-truncate instead of round: Spark rounds HALF_UP, DuckDB/other
    # engines HALF_EVEN — floor on identical doubles is engine-portable.
    def trunc4(c):
        return F.floor(c * 10000) / 10000

    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_toks.alias("n_tokens"),
        trunc4(mean_tok_len).alias("mean_token_len"),
        trunc4(uniq_ratio).alias("uniq_token_ratio"),
        trunc4(punct_ratio).alias("punct_ratio"),
        quality_score_expr(text_col).alias("quality_score"),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-probe language heuristic: count per-language probe hits,
    pick the max (ties broken by language code order); no hits -> 'und'."""
    lowered = F.lower(F.col(text_col))
    hit_cols = {
        lang: F.size(F.regexp_extract_all(lowered, F.lit(pat), 0))
        for lang, pat in LANG_PROBES.items()
    }
    best = F.greatest(*hit_cols.values())
    lang_expr = F.lit("und")
    for lang in sorted(LANG_PROBES, reverse=True):
        lang_expr = F.when((hit_cols[lang] == best) & (best > 0), F.lit(lang)).otherwise(lang_expr)
    sel = [F.col(id_col)] + [c.alias(f"hits_{lang}") for lang, c in hit_cols.items()]
    return docs.select(*sel, lang_expr.alias("lang_guess"))


# BPE-ish pre-tokenization: letter runs, digit runs, and single
# punctuation marks — the unit a byte-pair encoder would start from.
# Plain character classes only, so Java regex (Spark) and RE2 (DuckDB)
# agree byte-for-byte.
BPE_TOKEN_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting both ways a training pipeline needs it: whitespace
    words (for length filters) and BPE-ish pre-tokens (a deterministic
    proxy for model-token budgets), plus their ratio — a fragmentation
    signal (high ratio = code/punctuation-heavy text)."""
    ws = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_PATTERN), 0))
    return docs.select(
        F.col(id_col),
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        (F.floor(bpe * 10000 / F.greatest(ws, F.lit(1))) / 10000).alias("bpe_per_word"),
    )


def doc_fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Normalization fingerprint: md5 of the lowercased text with all
    non-alphanumerics removed — the canonical 'same content modulo
    formatting' key (engine-portable, unlike rolling xxhash)."""
    normalized = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]", "")
    return docs.select(
        F.col(id_col),
        F.md5(normalized).alias("fingerprint"),
        F.length(normalized).alias("n_norm_chars"),
    )


def readability(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_sentences, n_words, n_syllables, flesch, fk_grade) —
    Flesch reading ease + Flesch-Kincaid grade (L175), the curation
    heuristic for "is this text prose or table soup".

    Counting conventions (pinned, regex-only — pure JVM expressions):
      * sentences: maximal runs of [.!?]+ acting as terminators, min 1
        for non-empty text (a fragment is one sentence);
      * words: whitespace-delimited tokens containing a letter;
      * syllables: vowel GROUPS ([aeiouy]+) per word, min 1 per word —
        the standard regex approximation (exact hyphenation needs a
        dictionary; the approximation is deterministic and documented).

    Scores are fixed IEEE trees over exact integer counts (two
    divisions each) — bit-identical, ungridded.  Empty/wordless text
    → NULL scores.

    Scale: one narrow projection; 100 TB scanned once, zero shuffle.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    lower = F.lower(t)
    # words with at least one ASCII letter
    n_words = F.size(
        F.filter(
            F.split(F.trim(t), r"\s+"),
            lambda w: w.rlike("[A-Za-z]"),
        )
    )
    # handle the empty-string split artifact ([""] -> no letter, ok)
    n_sent_raw = F.size(
        F.filter(
            F.split(t, r"[.!?]+"),
            lambda s: s.rlike("[A-Za-z0-9]"),
        )
    )
    n_sentences = F.when(n_words > 0, F.greatest(n_sent_raw, F.lit(1)))
    # vowel groups across the text counted per word floor of 1:
    # total = vowel groups + number of words with NO vowel group
    vowel_groups = F.size(
        F.filter(
            F.split(lower, "[^aeiouy]+"),
            lambda s: s != F.lit(""),
        )
    )
    wordlike = F.filter(
        F.split(F.trim(lower), r"\s+"), lambda w: w.rlike("[a-z]")
    )
    no_vowel_words = F.size(
        F.filter(wordlike, lambda w: ~w.rlike("[aeiouy]"))
    )
    n_syll = F.when(n_words > 0, vowel_groups + no_vowel_words)
    wd = n_words.cast("double")
    sd = n_sentences.cast("double")
    yd = n_syll.cast("double")
    flesch = (
        F.lit(206.835) - F.lit(1.015) * (wd / sd) - F.lit(84.6) * (yd / wd)
    )
    fk = (
        F.lit(0.39) * (wd / sd) + F.lit(11.8) * (yd / wd) - F.lit(15.59)
    )
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.coalesce(n_sentences, F.lit(0)).alias("n_sentences"),
        F.coalesce(n_syll, F.lit(0)).alias("n_syllables"),
        F.when(n_words > 0, flesch).alias("flesch"),
        F.when(n_words > 0, fk).alias("fk_grade"),
    )


def readability_extended(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_words, n_sentences, n_letters, n_alnum, n_poly, ari,
    coleman_liau, smog) — the character/polysyllable readability
    family (L349), complementing L175's syllable-rate pair: ARI and
    Coleman-Liau grade from CHARACTER counts (what OCR'd or
    tokenizer-mangled text distorts least) and SMOG from the
    polysyllable density (the medical-literature standard):

        ARI  = 4.71·(alnum/words) + 0.5·(words/sentences) − 21.43
        CLI  = 0.0588·(100·letters/words) − 0.296·(100·sentences/words)
               − 15.8
        SMOG = 1.043·√(poly · 30/sentences) + 3.1291

    Counting conventions are EXACTLY L175's (letter-bearing whitespace
    tokens; terminator-run sentences with a floor of 1; vowel-group
    syllables) plus: letters = [A-Za-z] occurrences, alnum =
    [A-Za-z0-9] occurrences, poly = words with ≥ 3 vowel groups.
    Fixed IEEE trees over exact integer counts; wordless text → NULL
    scores.

    Scale: one narrow projection; 100 TB scanned once, zero shuffle.

    No reference counterpart; text-curation analytics per SURVEY §2.11.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    lower = F.lower(t)
    n_words = F.size(
        F.filter(
            F.split(F.trim(t), r"\s+"),
            lambda w: w.rlike("[A-Za-z]"),
        )
    )
    n_sent_raw = F.size(
        F.filter(
            F.split(t, r"[.!?]+"),
            lambda s: s.rlike("[A-Za-z0-9]"),
        )
    )
    n_sentences = F.when(n_words > 0, F.greatest(n_sent_raw, F.lit(1)))
    n_letters = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    n_alnum = F.length(F.regexp_replace(t, "[^A-Za-z0-9]", ""))
    wordlike = F.filter(
        F.split(F.trim(lower), r"\s+"), lambda w: w.rlike("[a-z]")
    )
    n_poly = F.size(
        F.filter(
            wordlike,
            lambda w: F.size(
                F.filter(
                    F.split(w, "[^aeiouy]+"), lambda s: s != F.lit("")
                )
            )
            >= 3,
        )
    )
    wd = n_words.cast("double")
    sd = n_sentences.cast("double")
    ld = n_letters.cast("double")
    cd = n_alnum.cast("double")
    pd_ = n_poly.cast("double")
    ari = (
        F.lit(4.71) * (cd / wd)
        + F.lit(0.5) * (wd / sd)
        - F.lit(21.43)
    )
    cli = (
        F.lit(0.0588) * (F.lit(100.0) * ld / wd)
        - F.lit(0.296) * (F.lit(100.0) * sd / wd)
        - F.lit(15.8)
    )
    smog = F.lit(1.043) * F.sqrt(pd_ * (F.lit(30.0) / sd)) + F.lit(
        3.1291
    )
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.coalesce(n_sentences, F.lit(0)).alias("n_sentences"),
        n_letters.alias("n_letters"),
        n_alnum.alias("n_alnum"),
        n_poly.alias("n_poly"),
        F.when(n_words > 0, ari).alias("ari"),
        F.when(n_words > 0, cli).alias("coleman_liau"),
        F.when(n_words > 0, smog).alias("smog"),
    )


def lexical_diversity(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_tokens, n_types, ttr, rttr, cttr, herdan_c) — per-doc
    lexical diversity panel (L350): vocabulary richness, the text
    twin of L257's category diversity and the classic repetition
    screen (templated/spun text scores low):

        TTR = V/N,  RTTR = V/√N,  CTTR = V/√(2N),
        Herdan's C = ln V / ln N   (length-corrected)

    Token convention (pinned): lowercase letter-bearing whitespace
    tokens with every non-[a-z] character stripped; V counts DISTINCT
    normalized tokens — computed per row with array ops (NO shuffle,
    no groupBy; the distinct lives inside the row).  N = 0 → NULL
    panel; Herdan additionally needs N ≥ 2 (ln 1 divides).

    Scale: one narrow projection; 100 TB scanned once, zero shuffle.

    No reference counterpart; text-curation analytics per SURVEY §2.11.
    """
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    toks = F.filter(
        F.transform(
            F.filter(
                F.split(F.trim(t), r"\s+"),
                lambda w: w.rlike("[a-z]"),
            ),
            lambda w: F.regexp_replace(w, "[^a-z]", ""),
        ),
        lambda w: w != F.lit(""),
    )
    n_tok = F.size(toks)
    n_typ = F.size(F.array_distinct(toks))
    nd = n_tok.cast("double")
    vd = n_typ.cast("double")
    return docs.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_typ.alias("n_types"),
        F.when(n_tok > 0, vd / nd).alias("ttr"),
        F.when(n_tok > 0, vd / F.sqrt(nd)).alias("rttr"),
        F.when(n_tok > 0, vd / F.sqrt(F.lit(2.0) * nd)).alias("cttr"),
        F.when(n_tok >= 2, F.log(vd) / F.log(nd)).alias("herdan_c"),
    )


def tfidf_topk(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """(id, term, tf, df, tfidf, rnk) — corpus TF-IDF top-k terms per
    document (L358): the classic "what is this document about"
    keyword extractor, the corpus-aware upgrade of the reference's
    single-doc degenerate form (SURVEY §2.6 T2 — there IDF collapses
    to 1; here the corpus supplies it):

        tfidf(t, d) = tf(t,d) · ln(N / df(t))

    with N = documents containing ≥ 1 token.  tf and df are EXACT
    integers (explode + two groupBys; df via one distinct), the score
    is ONE multiply of an exact count by one ln of an exact ratio,
    and top-k picks by (score DESC, term ASC) — fully deterministic.
    Token convention = L350's (lowercase, strip non-[a-z]).

    Scale shape: one explode + two combinable groupBys + a broadcast
    df join (vocabulary-bounded) + one per-doc top-k window.

    No reference counterpart beyond the degenerate single-doc form
    (`app/entity_extraction.py:128`); corpus analytics per SURVEY
    §2.11.
    """
    if int(k) < 1:
        raise ValueError("tfidf_topk: k must be >= 1")
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    toks = F.filter(
        F.transform(
            F.filter(
                F.split(F.trim(t), r"\s+"),
                lambda w: w.rlike("[a-z]"),
            ),
            lambda w: F.regexp_replace(w, "[^a-z]", ""),
        ),
        lambda w: w != F.lit(""),
    )
    exploded = docs.select(
        F.col(id_col).alias("_id"), F.explode(toks).alias("term")
    )
    tf = exploded.groupBy("_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = (
        exploded.dropDuplicates(["_id", "term"])
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = exploded.select("_id").distinct().count()
    scored = tf.join(F.broadcast(dfreq), "term").select(
        "_id",
        "term",
        "tf",
        "df",
        (
            F.col("tf").cast("double")
            * F.log(
                F.lit(float(n_docs)) / F.col("df").cast("double")
            )
        ).alias("tfidf"),
    )
    w = Window.partitionBy("_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.select(
            "*", F.row_number().over(w).alias("rnk")
        )
        .filter(F.col("rnk") <= int(k))
        .select(
            F.col("_id").alias(id_col), "term", "tf", "df", "tfidf",
            "rnk",
        )
    )


def burrows_delta(
    df: DataFrame,
    by: list[str],
    id_col: str,
    text_col: str,
    top_k: int = 30,
) -> DataFrame:
    """Burrows' Delta stylometric deviation (L412): ``(by..., doc,
    n_tokens, k_eff, delta)`` — HOW FAR does each document's
    function-word profile sit from its group's norm (Burrows 2002,
    the authorship-attribution standard; here the per-document
    style-outlier score for corpus curation — machine text, pasted
    boilerplate, and off-register documents surface at high delta):

        f_dw = count(w in d)/len(d)   over the group's top-k words
        z_dw = (f_dw − μ_w)/σ_w       (population σ across the docs)
        delta_d = (1/k_eff)·Σ_w |z_dw|

    Pinned machinery: lowercase whitespace tokenization (the L389
    contract; compose L89 upstream), top-k words by total count with
    the (count DESC, word ASC) deterministic tiebreak, MISSING
    (doc, word) cells materialized as true zeros via the bounded
    docs×k lattice, and — because per-document frequencies are
    rationals with different denominators — every f_dw and every
    |z_dw| is quantized half-up onto the 1e-9 grid before its EXACT
    decimal sum (the L390 macro discipline: float sums over docs or
    words are order-dependent at scale; the grid IS the contract).
    Zero-variance words (same frequency in every document) carry no
    style signal and contribute 0 with ``k_eff`` reporting the words
    that counted; k_eff = 0 → NULL delta.  NULL ids/texts refused.

    Scale shape: one token explode + combinable counts, one bounded
    top-k window, one docs×k lattice join (k bounded), two combinable
    aggs — no collect, no pairwise-document anything.

    No reference counterpart; text-curation analytics per SURVEY
    §2.11."""
    if top_k < 1:
        raise ValueError("burrows_delta: top_k must be >= 1")
    if validation_enabled():
        n_null = df.filter(
            F.col(id_col).isNull() | F.col(text_col).isNull()
        ).count()
        if n_null:
            raise ValueError(
                f"burrows_delta: {n_null} NULL id/text row(s)"
            )
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda x: x != F.lit(""),
    )
    base = df.select(*by, F.col(id_col).alias("_doc"), toks.alias("_t"))
    lens = base.select(
        *by, "_doc", F.size("_t").alias("_len")
    )
    words = base.select(
        *by, "_doc", F.explode("_t").alias("_w")
    )
    tf = words.groupBy(*by, "_doc", "_w").agg(
        F.count(F.lit(1)).alias("_c")
    )
    totals = tf.groupBy(*by, "_w").agg(F.sum("_c").alias("_tot"))
    w_top = Window.partitionBy(*by).orderBy(
        F.col("_tot").desc(), F.col("_w").asc()
    )
    topk = (
        totals.withColumn("_r", F.row_number().over(w_top))
        .filter(F.col("_r") <= top_k)
        .select(*by, "_w")
    )
    lattice = lens.join(topk, list(by))
    cells = lattice.join(tf, [*by, "_doc", "_w"], "left").select(
        *by,
        "_doc",
        "_w",
        "_len",
        F.coalesce(F.col("_c"), F.lit(0)).alias("_c"),
    )
    dec = "decimal(38,0)"
    q = lambda t: F.floor(t * F.lit(1e9) + F.lit(0.5)).cast(dec)  # noqa: E731
    f_dw = F.col("_c").cast("double") / F.col("_len").cast("double")
    scored = cells.select(
        *by, "_doc", "_w", "_len", q(f_dw).alias("_qf")
    )
    stats = scored.groupBy(*by, "_w").agg(
        F.count(F.lit(1)).alias("_nd"),
        F.sum("_qf").alias("_s"),
        F.sum(F.col("_qf") * F.col("_qf")).alias("_ss"),
    )
    nd = F.col("_nd").cast("double")
    mu = F.col("_s").cast("double") / nd / F.lit(1e9)
    var = (
        nd * F.col("_ss").cast("double")
        - F.col("_s").cast("double") * F.col("_s").cast("double")
    ) / (nd * nd) / F.lit(1e18)
    wstats = stats.select(
        *by, "_w", mu.alias("_mu"), F.sqrt(var).alias("_sd")
    )
    joined = scored.join(wstats, [*by, "_w"])
    z = (
        F.col("_qf").cast("double") / F.lit(1e9) - F.col("_mu")
    ) / F.col("_sd")
    per_cell = joined.select(
        *by,
        "_doc",
        "_len",
        F.when(F.col("_sd") > 0, q(F.abs(z))).otherwise(
            F.lit(0).cast(dec)
        ).alias("_qz"),
        F.when(F.col("_sd") > 0, 1).otherwise(0).alias("_eff"),
    )
    agg = per_cell.groupBy(*by, F.col("_doc").alias("doc")).agg(
        F.max("_len").alias("n_tokens"),
        F.sum("_eff").alias("k_eff"),
        F.sum("_qz").alias("_sz"),
    )
    return agg.select(
        *by,
        "doc",
        "n_tokens",
        "k_eff",
        F.when(
            F.col("k_eff") > 0,
            F.col("_sz").cast("double")
            / F.lit(1e9)
            / F.col("k_eff").cast("double"),
        ).alias("delta"),
    )


def lexicon_scan(
    df: DataFrame,
    by: list[str],
    id_col: str,
    text_col: str,
    lexicon: list[str],
    case_insensitive: bool = True,
) -> DataFrame:
    """Lexicon scan panel (L437): ``(by..., doc, n_chars, total_hits,
    n_patterns_hit, hits_per_kchar, first_pattern, flagged)`` —
    policy-phrase screening (safety wordlists, PII trigger phrases,
    brand terms) as EXACT arithmetic: each pattern's occurrence count
    is (len(t) − len(replace(t, p)))/len(p) — an exact integer from
    two JVM length calls, counting NON-overlapping occurrences (the
    replace semantics, documented), substring matching (compose word
    boundaries into the patterns if needed).  The lexicon is a
    bounded broadcast literal (1..64 non-empty patterns, pinned into
    the plan — the L435 discipline); ``first_pattern`` is the
    lexicographically SMALLEST hit (deterministic witness, the L343
    rule), ``hits_per_kchar`` the one division.  Case folding pinned
    by the flag (both sides lowered).  NULL ids/texts refused.

    Scale shape: per-row bounded JVM string ops — zero shuffle.

    No reference counterpart; curation analytics per SURVEY §2.11."""
    if not lexicon or len(lexicon) > 64:
        raise ValueError("lexicon_scan: need 1..64 patterns")
    if any(not p for p in lexicon):
        raise ValueError("lexicon_scan: empty pattern")
    pats = sorted(
        {p.lower() for p in lexicon}
        if case_insensitive
        else set(lexicon)
    )
    if validation_enabled():
        n_null = df.filter(
            F.col(id_col).isNull() | F.col(text_col).isNull()
        ).count()
        if n_null:
            raise ValueError(f"lexicon_scan: {n_null} NULL row(s)")
    t = (
        F.lower(F.col(text_col))
        if case_insensitive
        else F.col(text_col)
    )
    counts = [
        (
            (F.length(t) - F.length(F.replace(t, F.lit(p))))
            / F.lit(len(p))
        ).cast("int")
        for p in pats
    ]
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    npat = sum(
        [F.when(c > 0, 1).otherwise(0) for c in counts], F.lit(0)
    )
    first = F.lit(None).cast("string")
    for p, c in reversed(list(zip(pats, counts))):
        first = F.when(c > 0, F.lit(p)).otherwise(first)
    n_chars = F.length(F.col(text_col))
    return df.select(
        *by,
        F.col(id_col).alias("doc"),
        n_chars.alias("n_chars"),
        total.alias("total_hits"),
        npat.alias("n_patterns_hit"),
        F.when(
            n_chars > 0,
            total.cast("double") * F.lit(1000.0)
            / n_chars.cast("double"),
        ).alias("hits_per_kchar"),
        first.alias("first_pattern"),
        (total > 0).alias("flagged"),
    )


def char_entropy(
    df: DataFrame,
    by: list[str],
    id_col: str,
    text_col: str,
    max_chars: int = 20_000,
) -> DataFrame:
    """Character-entropy panel (L438): ``(by..., doc, n_chars,
    n_distinct_chars, entropy_bits, est_ratio)`` — the cheap
    compressibility/gibberish screen beside LZ76 (L382 is a
    sequential bounded fold measuring STRUCTURE; the zeroth-order
    Shannon bound is embarrassingly parallel and catches encoding
    anomalies, key-mash, and base64 blobs by their flat character
    distributions):

        H = −Σ_c (n_c/n)·log₂(n_c/n)   bits per character
        est_ratio = H/8                 (the order-0 compression
                                         bound as a fraction of raw
                                         bytes for 8-bit text)

    Counts are exact integers (per-row fold over the doc's DISTINCT
    characters in sorted order — pinned; O(distinct·len) against the
    loud ``max_chars`` cap); the entropy tree is a per-DOC output
    (never summed across docs — per-row transcendental ulps are
    absorbed by the 9-digit compare, the L420 rule).  Empty texts →
    NULL entropy.  NULL ids/texts refused.

    No reference counterpart; curation analytics per SURVEY §2.11."""
    if validation_enabled():
        n_null = df.filter(
            F.col(id_col).isNull() | F.col(text_col).isNull()
        ).count()
        if n_null:
            raise ValueError(f"char_entropy: {n_null} NULL row(s)")
    if validation_enabled():
        over = df.filter(F.length(F.col(text_col)) > max_chars).count()
        if over:
            raise ValueError(
                f"char_entropy: {over} doc(s) exceed max_chars="
                f"{max_chars} — the distinct-char fold is quadratic-ish; "
                "truncate upstream"
            )
    chars = F.filter(
        F.split(F.col(text_col), ""), lambda x: x != F.lit("")
    )
    distinct = F.array_sort(F.array_distinct(chars))
    n = F.size(chars)
    nd = n.cast("double")
    h = F.aggregate(
        distinct,
        F.lit(0.0),
        lambda acc, ch: acc
        - (
            F.size(F.filter(chars, lambda x: x == ch)).cast("double")
            / nd
        )
        * F.log2(
            F.size(F.filter(chars, lambda x: x == ch)).cast("double")
            / nd
        ),
    )
    return df.select(
        *by,
        F.col(id_col).alias("doc"),
        n.alias("n_chars"),
        F.size(distinct).alias("n_distinct_chars"),
        F.when(n > 0, h).alias("entropy_bits"),
        F.when(n > 0, h / F.lit(8.0)).alias("est_ratio"),
    )
