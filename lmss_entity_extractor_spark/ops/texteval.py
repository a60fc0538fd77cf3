"""Reference-based text-generation evaluation (L389/L390): corpus
BLEU and ROUGE-N over (candidate, reference) string pairs — the
summarization/translation eval scoreboard an LLM-data pipeline runs
next to its retrieval metrics (P/R@k L164, NDCG L221, ERR L372 score
RANKINGS; BLEU/ROUGE score generated TEXT against references).

Both ride the same per-row n-gram machinery, entirely in JVM
higher-order functions — no UDF, no shuffle before the one combinable
aggregation:

    tokens   = whitespace-split (``\\s+``), empty strings dropped —
               the pinned tokenization contract (compose L89
               normalization upstream for anything smarter)
    grams_n  = join of each length-n token window with a single space
               (tokens contain no whitespace, so the joiner is safe)
    m_n      = Σ_g min(count_cand(g), count_ref(g)) over the DISTINCT
               candidate grams — the CLIPPED match count (Papineni
               2002 §2.1), an exact integer computed inside the row

Per-row cost is O(distinct-grams × tokens) against the loud
``max_tokens`` cap (the L180 bounded-series contract) — bounded,
embarrassingly parallel, zero-shuffle.  NULL candidates or references
are REFUSED (a missing eval side is a pipeline bug, not a zero).

L389 — corpus BLEU-N (micro, the canonical corpus form): per order
n = 1..max_n, pₙ = Σᵢmₙᵢ / Σᵢtₙᵢ over exact integer sums; brevity
penalty BP = 1 if c > r else exp(1 − r/c); BLEU = BP·exp(Σ ln pₙ/N)
with the ln sum folded in pinned n order.  NO smoothing: any zero pₙ
→ BLEU exactly 0.0 (documented; smoothing variants are a caller
choice this contract refuses to hide).  Any empty gram universe
(Σtₙ = 0) → NULL pₙ and NULL BLEU.

L390 — ROUGE-N panel (one gram order per call): micro P/R/F1 from
the same exact corpus sums, AND macro (per-pair-averaged, the
ROUGE-1.5.5 convention) P/R/F1 where each per-pair score is 0 when
its denominator is 0 (the ROUGE convention for empty sides) and is
quantized half-up onto the 1e-9 grid (``floor(x·1e9 + 0.5)``) before
an EXACT decimal sum — per-pair IEEE scores cannot ride a float sum
at 10¹² rows (order-dependent), so the grid IS the macro contract
(the L50/L166 quantization discipline).

No reference counterpart; analytics per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .validate import validation_enabled

_DEC = "decimal(38,0)"


def _tokens(col):
    return F.filter(F.split(col, r"\s+"), lambda x: x != F.lit(""))


def _grams(toks, n: int):
    if n == 1:
        return toks
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _count_in(arr, g):
    return F.size(F.filter(arr, lambda x: x == g))


def _clipped(cg, rg):
    return F.aggregate(
        F.array_distinct(cg),
        F.lit(0),
        lambda acc, g: acc + F.least(_count_in(cg, g), _count_in(rg, g)),
    )


def _validated(
    df: DataFrame, cand_col: str, ref_col: str, max_tokens: int, op: str
) -> DataFrame:
    if validation_enabled():
        n_null = df.filter(
            F.col(cand_col).isNull() | F.col(ref_col).isNull()
        ).count()
        if n_null:
            raise ValueError(
                f"{op}: {n_null} pair(s) with a NULL candidate or "
                "reference — a missing eval side is a bug, not a zero"
            )
    base = df.withColumn("_ct", _tokens(F.col(cand_col))).withColumn(
        "_rt", _tokens(F.col(ref_col))
    )
    if validation_enabled():
        n_long = base.filter(
            (F.size("_ct") > max_tokens) | (F.size("_rt") > max_tokens)
        ).count()
        if n_long:
            raise ValueError(
                f"{op}: {n_long} pair(s) exceed max_tokens={max_tokens} — "
                "per-row gram matching is O(L^2); raise the cap "
                "deliberately or truncate upstream"
            )
    return base


def corpus_bleu(
    df: DataFrame,
    by: list[str],
    cand_col: str,
    ref_col: str,
    max_n: int = 4,
    max_tokens: int = 512,
) -> DataFrame:
    """``(by..., n_pairs, cand_tokens, ref_tokens, p1..p<max_n>, bp,
    bleu)`` — corpus BLEU (see module docstring)."""
    if not (1 <= max_n <= 8):
        raise ValueError("corpus_bleu: max_n must be in 1..8")
    base = _validated(df, cand_col, ref_col, max_tokens, "corpus_bleu")
    proj = [F.size("_ct").alias("_lc"), F.size("_rt").alias("_lr")]
    for n in range(1, max_n + 1):
        cg, rg = _grams(F.col("_ct"), n), _grams(F.col("_rt"), n)
        proj.append(_clipped(cg, rg).alias(f"_m{n}"))
        proj.append(
            F.when(
                F.size("_ct") >= n, F.size("_ct") - F.lit(n - 1)
            )
            .otherwise(F.lit(0))
            .alias(f"_t{n}"),
        )
    rows = base.select(*by, *proj)
    aggs = [
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("_lc").alias("cand_tokens"),
        F.sum("_lr").alias("ref_tokens"),
    ]
    for n in range(1, max_n + 1):
        aggs.append(F.sum(f"_m{n}").alias(f"_sm{n}"))
        aggs.append(F.sum(f"_t{n}").alias(f"_st{n}"))
    agg = rows.groupBy(*by).agg(*aggs)

    out = [*by, "n_pairs", "cand_tokens", "ref_tokens"]
    defined = None
    positive = None
    for n in range(1, max_n + 1):
        ok = F.col(f"_st{n}") > 0
        defined = ok if defined is None else (defined & ok)
        pos = F.col(f"_sm{n}") > 0
        positive = pos if positive is None else (positive & pos)
        out.append(
            F.when(
                ok,
                F.col(f"_sm{n}").cast("double")
                / F.col(f"_st{n}").cast("double"),
            ).alias(f"p{n}")
        )
    cd = F.col("cand_tokens").cast("double")
    rd = F.col("ref_tokens").cast("double")
    bp = F.when(F.col("cand_tokens") == 0, F.lit(None).cast("double")).when(
        F.col("cand_tokens") > F.col("ref_tokens"), F.lit(1.0)
    ).otherwise(F.exp(F.lit(1.0) - rd / cd))
    out.append(bp.alias("bp"))
    lnsum = None
    for n in range(1, max_n + 1):
        term = F.log(
            F.col(f"_sm{n}").cast("double") / F.col(f"_st{n}").cast("double")
        )
        lnsum = term if lnsum is None else (lnsum + term)
    out.append(
        F.when(~defined, F.lit(None).cast("double"))
        .when(~positive, F.lit(0.0))
        .otherwise(bp * F.exp(lnsum / F.lit(float(max_n))))
        .alias("bleu")
    )
    return agg.select(*out)


def rouge_n(
    df: DataFrame,
    by: list[str],
    cand_col: str,
    ref_col: str,
    n: int = 1,
    max_tokens: int = 512,
) -> DataFrame:
    """``(by..., n_pairs, match_grams, cand_grams, ref_grams,
    micro_p, micro_r, micro_f1, macro_p, macro_r, macro_f1)`` —
    ROUGE-N panel (see module docstring)."""
    if not (1 <= n <= 8):
        raise ValueError("rouge_n: n must be in 1..8")
    base = _validated(df, cand_col, ref_col, max_tokens, "rouge_n")
    cg, rg = _grams(F.col("_ct"), n), _grams(F.col("_rt"), n)
    tc = F.when(F.size("_ct") >= n, F.size("_ct") - F.lit(n - 1)).otherwise(
        F.lit(0)
    )
    tr = F.when(F.size("_rt") >= n, F.size("_rt") - F.lit(n - 1)).otherwise(
        F.lit(0)
    )
    rows = base.select(
        *by,
        _clipped(cg, rg).alias("_m"),
        tc.alias("_tc"),
        tr.alias("_tr"),
    )
    md = F.col("_m").cast("double")
    p_i = F.when(F.col("_tc") > 0, md / F.col("_tc").cast("double")).otherwise(
        F.lit(0.0)
    )
    r_i = F.when(F.col("_tr") > 0, md / F.col("_tr").cast("double")).otherwise(
        F.lit(0.0)
    )
    f_i = F.when(
        (p_i + r_i) > 0, F.lit(2.0) * p_i * r_i / (p_i + r_i)
    ).otherwise(F.lit(0.0))
    q = lambda t: F.floor(t * F.lit(1e9) + F.lit(0.5)).cast(_DEC)  # noqa: E731
    agg = rows.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("_m").alias("match_grams"),
        F.sum("_tc").alias("cand_grams"),
        F.sum("_tr").alias("ref_grams"),
        F.sum(q(p_i)).alias("_qp"),
        F.sum(q(r_i)).alias("_qr"),
        F.sum(q(f_i)).alias("_qf"),
    )
    mp = F.when(
        F.col("cand_grams") > 0,
        F.col("match_grams").cast("double")
        / F.col("cand_grams").cast("double"),
    )
    mr = F.when(
        F.col("ref_grams") > 0,
        F.col("match_grams").cast("double")
        / F.col("ref_grams").cast("double"),
    )
    mf = F.when(
        mp.isNull() | mr.isNull(), F.lit(None).cast("double")
    ).when((mp + mr) > 0, F.lit(2.0) * mp * mr / (mp + mr)).otherwise(
        F.lit(0.0)
    )
    nd = F.col("n_pairs").cast("double")
    macro = lambda c: F.col(c).cast("double") / F.lit(1e9) / nd  # noqa: E731
    return agg.select(
        *by,
        "n_pairs",
        "match_grams",
        "cand_grams",
        "ref_grams",
        mp.alias("micro_p"),
        mr.alias("micro_r"),
        mf.alias("micro_f1"),
        macro("_qp").alias("macro_p"),
        macro("_qr").alias("macro_r"),
        macro("_qf").alias("macro_f1"),
    )


def _chars(col):
    return F.filter(
        F.split(F.regexp_replace(col, r"\s+", ""), ""),
        lambda x: x != F.lit(""),
    )


def _char_grams(chars, n: int):
    if n == 1:
        return chars
    return F.when(
        F.size(chars) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(chars) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(chars, i, n), ""),
        ),
    ).otherwise(F.array().cast("array<string>"))


def chrf(
    df: DataFrame,
    by: list[str],
    cand_col: str,
    ref_col: str,
    max_n: int = 6,
    beta: float = 2.0,
    max_tokens: int = 512,
) -> DataFrame:
    """chrF (L431): ``(by..., n_pairs, n_orders_eff, chr_p, chr_r,
    chrf)`` — the CHARACTER-n-gram F-score (Popović 2015), the third
    member of the generation-eval family (BLEU L389 is word-precision
    + BP, ROUGE L390 word-recall; chrF is robust to morphology and
    tokenization because it never tokenizes beyond characters):

        whitespace removed entirely (the sacrebleu convention,
        pinned), char n-grams for n = 1..max_n, corpus-level clipped
        P_n and R_n per order (exact integer sums — the L389
        machinery at char level), F_n = (1+β²)PR/(β²P+R), and chrF =
        the arithmetic mean of F_n over the orders where both sides
        HAVE n-grams (``n_orders_eff``; an undefined order is
        excluded, not zero-filled — documented); all orders undefined
        → NULL.

    The order-mean folds over ≤ max_n terms in ascending-n order
    (fixed tree); β is a pinned literal.  NULL sides refused;
    ``max_tokens`` caps the per-row work (the L389 contract — here
    it bounds characters at 8×max_tokens).

    No reference counterpart; generation-eval analytics per SURVEY
    §2.11."""
    if not (1 <= max_n <= 8):
        raise ValueError("chrf: max_n must be in 1..8")
    if beta <= 0:
        raise ValueError("chrf: beta must be > 0")
    if validation_enabled():
        n_null = df.filter(
            F.col(cand_col).isNull() | F.col(ref_col).isNull()
        ).count()
        if n_null:
            raise ValueError(f"chrf: {n_null} NULL candidate/reference")
    max_chars = 8 * max_tokens
    base = df.withColumn("_cc", _chars(F.col(cand_col))).withColumn(
        "_rc", _chars(F.col(ref_col))
    )
    if validation_enabled():
        n_long = base.filter(
            (F.size("_cc") > max_chars) | (F.size("_rc") > max_chars)
        ).count()
        if n_long:
            raise ValueError(
                f"chrf: {n_long} pair(s) exceed {max_chars} characters — "
                "truncate upstream"
            )
    proj = []
    for n in range(1, max_n + 1):
        cg, rg = _char_grams(F.col("_cc"), n), _char_grams(
            F.col("_rc"), n
        )
        proj.append(_clipped(cg, rg).alias(f"_m{n}"))
        proj.append(F.size(cg).alias(f"_tc{n}"))
        proj.append(F.size(rg).alias(f"_tr{n}"))
    rows = base.select(*by, *proj)
    aggs = [F.count(F.lit(1)).alias("n_pairs")]
    for n in range(1, max_n + 1):
        aggs.append(F.sum(f"_m{n}").alias(f"_sm{n}"))
        aggs.append(F.sum(f"_tc{n}").alias(f"_stc{n}"))
        aggs.append(F.sum(f"_tr{n}").alias(f"_str{n}"))
    agg = rows.groupBy(*by).agg(*aggs)
    b2 = F.lit(float(beta) * float(beta))
    eff = None
    sp = sr = sf = None
    for n in range(1, max_n + 1):
        ok = (F.col(f"_stc{n}") > 0) & (F.col(f"_str{n}") > 0)
        p = F.col(f"_sm{n}").cast("double") / F.col(
            f"_stc{n}"
        ).cast("double")
        r = F.col(f"_sm{n}").cast("double") / F.col(
            f"_str{n}"
        ).cast("double")
        f_n = F.when(
            (p + r) > 0,
            (F.lit(1.0) + b2) * p * r / (b2 * p + r),
        ).otherwise(F.lit(0.0))
        e = F.when(ok, 1).otherwise(0)
        tp = F.when(ok, p).otherwise(F.lit(0.0))
        tr_ = F.when(ok, r).otherwise(F.lit(0.0))
        tf = F.when(ok, f_n).otherwise(F.lit(0.0))
        eff = e if eff is None else eff + e
        sp = tp if sp is None else sp + tp
        sr = tr_ if sr is None else sr + tr_
        sf = tf if sf is None else sf + tf
    effd = eff.cast("double")
    return agg.select(
        *by,
        "n_pairs",
        eff.alias("n_orders_eff"),
        F.when(eff > 0, sp / effd).alias("chr_p"),
        F.when(eff > 0, sr / effd).alias("chr_r"),
        F.when(eff > 0, sf / effd).alias("chrf"),
    )


def wer_cer(
    df: DataFrame,
    by: list[str],
    id_col: str,
    cand_col: str,
    ref_col: str,
    max_tokens: int = 256,
) -> DataFrame:
    """Word/character error rate (L432): one row per pair ``(by...,
    id, ref_tokens, word_dist, wer, ref_chars, char_dist, cer)`` —
    the transcription/generation EXACTNESS scoreboard (BLEU/ROUGE/
    chrF score overlap; WER/CER charge every insertion, deletion,
    and substitution — the ASR/OCR standard, and the right metric
    for verbatim tasks):

        word_dist = Levenshtein over TOKEN sequences — computed as a
        bounded in-row DP fold (outer fold over candidate tokens
        carrying the previous DP row, inner fold building the next
        row cell by cell — the L382 sequential-fold discipline,
        O(|c|·|r|) against the loud ``max_tokens`` cap)
        char_dist = the JVM ``levenshtein`` builtin over the
        whitespace-stripped strings (and the DP fold is pinned equal
        to the builtin on character input by test)
        wer = word_dist/ref_tokens,  cer = char_dist/ref_chars
        (NULL when the reference side is empty — a rate over nothing)

    Pinned lowercase-whitespace tokenization (the L389 contract).
    NULL sides refused.  Scale shape: zero-shuffle per-row compute;
    the oracle cross-checks with an INDEPENDENT algorithm (DuckDB's
    native levenshtein over a token→codepoint encoding).

    No reference counterpart; eval analytics per SURVEY §2.11."""
    if validation_enabled():
        n_null = df.filter(
            F.col(cand_col).isNull()
            | F.col(ref_col).isNull()
            | F.col(id_col).isNull()
        ).count()
        if n_null:
            raise ValueError(f"wer_cer: {n_null} NULL row(s)")
    base = df.withColumn(
        "_ct", _tokens(F.lower(F.col(cand_col)))
    ).withColumn("_rt", _tokens(F.lower(F.col(ref_col))))
    if validation_enabled():
        n_long = base.filter(
            (F.size("_ct") > max_tokens) | (F.size("_rt") > max_tokens)
        ).count()
        if n_long:
            raise ValueError(
                f"wer_cer: {n_long} pair(s) exceed max_tokens="
                f"{max_tokens} — the DP is quadratic; truncate upstream"
            )
    c, r = F.col("_ct"), F.col("_rt")
    nr = F.size(r)
    init = F.sequence(F.lit(0), nr)

    def outer(prev, i):
        ci = F.element_at(c, i)

        def inner(acc2, j):
            cost = F.when(
                ci == F.element_at(r, j), F.lit(0)
            ).otherwise(F.lit(1))
            last = F.element_at(acc2, -1)
            cell = F.least(
                F.element_at(prev, j + 1) + F.lit(1),
                last + F.lit(1),
                F.element_at(prev, j) + cost,
            )
            return F.concat(acc2, F.array(cell))

        return F.aggregate(
            F.when(nr >= 1, F.sequence(F.lit(1), nr)).otherwise(
                F.array().cast("array<int>")
            ),
            F.array(i),
            inner,
        )

    final_row = F.aggregate(
        F.when(F.size(c) >= 1, F.sequence(F.lit(1), F.size(c))).otherwise(
            F.array().cast("array<int>")
        ),
        init,
        outer,
    )
    word_dist = F.element_at(final_row, nr + 1)
    cand_str = F.regexp_replace(F.lower(F.col(cand_col)), r"\s+", "")
    ref_str = F.regexp_replace(F.lower(F.col(ref_col)), r"\s+", "")
    char_dist = F.levenshtein(cand_str, ref_str)
    ref_chars = F.length(ref_str)
    return base.select(
        *by,
        F.col(id_col).alias("id"),
        nr.alias("ref_tokens"),
        word_dist.alias("word_dist"),
        F.when(
            nr > 0, word_dist.cast("double") / nr.cast("double")
        ).alias("wer"),
        ref_chars.alias("ref_chars"),
        char_dist.alias("char_dist"),
        F.when(
            ref_chars > 0,
            char_dist.cast("double") / ref_chars.cast("double"),
        ).alias("cer"),
    )
