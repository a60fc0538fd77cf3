"""URL normalization and domain-level curation — the web-scale
pipeline's first mile (C4 / RefinedWeb style): canonicalize URLs so
exact dedup catches trivially-distinct fetches of the same resource,
and aggregate per registered domain for allow/deny-listing and
per-domain quotas.

Everything here is pure JVM column algebra (regexp + conditionals +
array sort) — zero UDFs, zero shuffles for the normalization itself, so
Catalyst folds it into the scan projection and it runs at full
whole-stage-codegen speed over 100 TB.  The only shuffle in the module
is the ONE hash aggregate of ``domain_stats`` (map-side combinable).

Normalization rules (each one oracle-mirrored in SQL, so the exact rule
set IS the contract):

1. scheme lowercased;
2. host lowercased, one leading ``www.`` label stripped;
3. default port dropped (``:80`` for http, ``:443`` for https); other
   ports kept;
4. empty path becomes ``/``;
5. fragment dropped (never part of the request);
6. query: a bare ``?`` is dropped; otherwise params are sorted by their
   full ``k=v`` text (byte order) and re-joined — parameter ORDER is
   normalized, parameter semantics are not touched.

Registered domain = last two dot-labels of the normalized host — an
explicit, documented heuristic (the real Public Suffix List is an
external artifact; the seam is one function, swap it when a PSL is
available).

Unparseable URLs surface with ``url_norm = NULL`` rather than being
dropped or echoed through — a silent echo would let garbage dedup
against itself and pollute domain stats.

Reference counterpart: none — the reference ingests local documents
(`app/main.py`); URL-level curation is part of the beyond-reference
LLM-pipeline mandate (SURVEY §2.11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme :// host[:port] path [?query] [#fragment]
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#:]+)(:[0-9]+)?([^?#]*)(\?[^#]*)?(#.*)?$"


def normalize_url(url: Column | str) -> Column:
    """Canonical form of ``url`` per the module's six rules; NULL if the
    URL does not parse (no scheme, empty host, junk)."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(u, _URL_RE, 2)), r"^www\.", ""
    )
    port = F.regexp_extract(u, _URL_RE, 3)
    path = F.regexp_extract(u, _URL_RE, 4)
    query = F.regexp_extract(u, _URL_RE, 5)

    port_n = F.when(
        ((scheme == "http") & (port == ":80"))
        | ((scheme == "https") & (port == ":443")),
        F.lit(""),
    ).otherwise(port)
    path_n = F.when(path == "", F.lit("/")).otherwise(path)
    qbody = F.substring(query, 2, 1 << 30)  # strip the leading '?'
    query_n = F.when(
        (query == "") | (qbody == ""), F.lit("")
    ).otherwise(
        F.concat(F.lit("?"), F.array_join(F.array_sort(F.split(qbody, "&")), "&"))
    )
    out = F.concat(scheme, F.lit("://"), host, port_n, path_n, query_n)
    return F.when((scheme == "") | (host == ""), F.lit(None)).otherwise(out)


def registered_domain(url_norm: Column | str) -> Column:
    """Last two dot-labels of the normalized URL's host (documented
    heuristic — see module docstring); NULL for NULL/unparsed input or
    single-label hosts."""
    u = F.col(url_norm) if isinstance(url_norm, str) else url_norm
    host = F.regexp_extract(u, _URL_RE, 2)
    dom = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(dom == "", F.lit(None)).otherwise(dom)


def normalize_urls(
    df: DataFrame, url_col: str = "url", out_col: str = "url_norm"
) -> DataFrame:
    """Append ``out_col`` (canonical URL) and ``domain`` columns —
    projection-only, fuses into the scan."""
    return df.withColumn(out_col, normalize_url(url_col)).withColumn(
        "domain", registered_domain(F.col(out_col))
    )


def domain_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-registered-domain curation stats: row count, distinct
    canonical URLs (the post-dedup size), and the duplicate surplus —
    one combinable hash aggregate.  Unparseable URLs group under the
    NULL domain so they stay visible."""
    n = normalize_urls(df, url_col)
    return n.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("url_norm").alias("n_urls"),
        (F.count(F.lit(1)) - F.countDistinct("url_norm")).alias("n_dup_rows"),
    )
