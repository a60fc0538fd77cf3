"""Product quantization (PQ) for embedding columns: the memory-bound
half of the ANN suite (ops/similarity.py is the compute-bound half).

A d-dim float vector is split into ``m`` subvectors; each subvector is
coded as the id of its nearest centroid from a per-subspace codebook of
``k`` entries (Jegou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI'11).  A 64-dim float32 vector (256 B) becomes ``m`` small
ints (m bytes at k<=256) — at 100 TB of embeddings that is the
difference between scanning 100 TB and scanning ~3 TB per ANN pass.

Query scoring is ADC (asymmetric distance computation): the query stays
un-quantized; a per-query (m x k) table of subspace distances is built
driver-side (tiny: m*k doubles) and broadcast-joined to the codes, and each
candidate's approximate squared L2 distance is ``m`` table lookups + a
fold — pure JVM column expressions over the codes column, no Python on
the hot path and no float vectors read at all.

Determinism contract (mirrors train_ivf_centroids): hash-sampled
id-sorted training set, evenly spaced init, Lloyd with argmin-distance
(ties -> lowest code), empty clusters keep their centroid.  Same input
-> bit-identical codebooks at any parallelism.  Code assignment and ADC
use sequential left-fold float64 arithmetic so the DuckDB oracle can
reproduce them bit-for-bit (see q_knn_pq).

Re-rank stage (Jegou §V): ADC ranking resolves coarse geometry but not
in-cluster noise ordering (recall@10 ~0.3 at the m=8 x k=16 budget), so
the serving-path default shortlists ``rerank`` candidates by ADC and
re-ranks them by EXACT squared L2 — the float vectors are read only via
a broadcast-shortlist join against the (partition-pruned, for the
persisted index) vector source, never a full float scan, so the 100 TB
story is preserved while recall@10 goes 0.30 -> 0.93 at the serving
defaults on clustered corpora (BENCH/IVF.md; the residue is shortlist
depth and nprobe probe loss — candidates outside the probed cells are
unrecoverable by re-ranking, so raise nprobe/rerank to push higher).
``rerank=0`` keeps the pure-ADC ranking.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def train_pq_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
):
    """Per-subspace Euclidean k-means codebooks, trained driver-side on a
    deterministic hash sample (same cap/sampling contract as
    train_ivf_centroids; dims must divide evenly by ``m``)."""
    from .similarity import collect_training_sample

    X = collect_training_sample(embeddings, id_col, vec_col, sample_mod, "train_pq_codebooks")
    return train_pq_codebooks_local(X, m=m, k=k, n_iters=n_iters)


def train_pq_codebooks_local(X, m: int = 8, k: int = 16, n_iters: int = 5):
    """The numpy training core, shared with the oracle fixture generator
    (tools/make_oracle_fixtures.py trains from the same id-sorted rows
    via DuckDB, no Spark) so both sides freeze bit-identical codebooks.
    ``X`` must be the id-sorted (n, d) float64 sample."""
    import numpy as np

    n, d = X.shape
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    kk = min(k, n)
    books = []
    for j in range(m):
        S = X[:, j * sub : (j + 1) * sub]
        C = S[np.linspace(0, n - 1, kk).astype(int)].copy()
        for _ in range(max(n_iters, 0)):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)  # (n, kk)
            assign = np.argmin(d2, axis=1)  # ties -> lowest code
            for c in range(kk):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books.append([(c, C[c].tolist()) for c in range(kk)])
    return books


def assign_cells_np(X, cents):
    """Numpy twin of similarity.ivf_cell_expr's assignment rule (argmax
    dot, ties -> lowest cid): used ONLY to compute training residuals
    driver-side, where an ulp-level tie flip changes nothing observable
    (both the operator and the oracle fixture generator train through
    this same function, so the codebooks stay bit-identical).

    The returned values are POSITIONAL indexes into the centroid list;
    they only equal cell ids when cids are the contiguous 0..n-1 the
    trainer emits — enforced here, since every downstream consumer
    (means, residuals, residual_expr literals) indexes by cid."""
    import numpy as np

    if [c for c, _v in cents] != list(range(len(cents))):
        raise ValueError(f"non-contiguous cell ids: {[c for c, _v in cents]}")
    C = np.asarray([v for _cid, v in cents], dtype=np.float64)
    # einsum (optimize=False) sums in fixed index order regardless of the
    # host's BLAS threading — dgemm reassociates with thread count, which
    # drifted trained centroids by 1 ulp between driver sessions
    return np.argmax(np.einsum("nd,kd->nk", X, C), axis=1)


def ivf_cell_means_local(X, cents, cells=None):
    """Per-cell MEAN of the training sample under ivf_cell_expr's
    assignment — the residual offsets.  The spherical IVF centroids are
    UNIT vectors (cosine cells), so subtracting them would leave the
    cluster offset almost intact; the cell mean is the actual cluster
    position the residual must remove.  A cell empty IN THE SAMPLE gets
    the zero vector: corpus rows the full assignment later lands there
    degenerate to raw-vector coding — well-defined, and both the
    operator and the oracle apply the same offset.  ``cells`` accepts a
    precomputed assign_cells_np result.  Returns [(cid, mean)] in cid
    order."""
    import numpy as np

    if cells is None:
        cells = assign_cells_np(X, cents)
    means = np.zeros((len(cents), X.shape[1]), dtype=np.float64)
    for cid, _v in cents:
        members = X[cells == cid]
        if len(members):
            means[cid] = members.mean(axis=0)
    return [(cid, means[cid].tolist()) for cid, _v in cents]


def train_pq_codebooks_residual_local(X, cents, m: int = 8, k: int = 16, n_iters: int = 5):
    """Residual PQ codebooks (Jegou §IV's actual IVFADC): each training
    vector is replaced by its residual vs its cell's MEAN (see
    ivf_cell_means_local), and the subspace codebooks quantize THAT —
    the coarse quantizer absorbs cluster position, so the full m x k
    code budget resolves in-cluster structure instead of re-encoding it
    (reconstruction MSE down >2x on the scattered test fixture — pinned
    by test_residual_coding_improves_adc_and_roundtrips).
    Returns (books, means)."""
    import numpy as np

    cells = assign_cells_np(X, cents)
    means = ivf_cell_means_local(X, cents, cells=cells)
    M = np.asarray([v for _cid, v in means], dtype=np.float64)
    R = X - M[cells]
    return train_pq_codebooks_local(R, m=m, k=k, n_iters=n_iters), means


def residual_expr(vec_name: str, means) -> Column:
    """array<double> residual of the vector column vs the row's assigned
    cell MEAN — requires a ``centroid_id`` column (ivf_cell_expr) in
    scope.  Pure JVM: one element_at into an array-of-arrays literal +
    zip_with; generated as a single SQL string (see _dot_sql's build-cost
    note).  Cell ids must be the contiguous 0..n-1 the trainer emits."""
    from .similarity import _dlit, _qcol

    ordered = sorted(means)
    if [c for c, _v in ordered] != list(range(len(ordered))):
        raise ValueError(f"non-contiguous cell ids: {[c for c, _v in ordered]}")
    arrs = ", ".join(
        "array(" + ", ".join(_dlit(x) for x in v) + ")" for _cid, v in ordered
    )
    return F.expr(
        f"zip_with({_qcol(vec_name)}, "
        f"element_at(array({arrs}), CAST(centroid_id AS INT) + 1), "
        "(x, c) -> CAST(x AS DOUBLE) - c)"
    )


def _sub_dist2_sql(vec_name: str, j: int, sub: int, cent: list[float]) -> str:
    """Sequential-fold squared L2 between subvector j of the named column
    and a centroid literal — the exact accumulation order the oracle
    mirrors, generated as SQL (one parse; see similarity._dot_sql)."""
    from .similarity import _dlit, _qcol

    arr = ", ".join(_dlit(x) for x in cent)
    return (
        f"aggregate(zip_with(slice({_qcol(vec_name)}, {j * sub + 1}, {sub}), array({arr}), "
        "(x, c) -> (CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c)), "
        "0D, (acc, v) -> acc + v)"
    )


def pq_code_expr(vec_name: str, books) -> Column:
    """codes array<int> — per subspace, the argmin-distance centroid id
    (ties -> lowest code) as a pure narrow JVM expression: no shuffle,
    no Python, exactly like similarity.ivf_cell_expr.  ``vec_name`` is
    the embedding COLUMN NAME; the whole expression is generated as one
    SQL string (expression BUILD via py4j literals measured ~5s/plan at
    m=8 x k=16 x dim=64 — parsing the string is milliseconds)."""
    sub = len(books[0][0][1])
    per_sub = []
    for j, book in enumerate(books):
        entries = ", ".join(
            f"named_struct('d', {_sub_dist2_sql(vec_name, j, sub, cent)}, 'c', {code})"
            for code, cent in book
        )
        per_sub.append(f"array_min(array({entries})).c")
    return F.expr("array(" + ", ".join(per_sub) + ")")


def pq_codes_udf(vec_col: str, books) -> Column:
    """Arrow-batched numpy encoder for LARGE codebooks (pq_k >= ~64),
    where the literal-expression form outgrows whole-stage codegen
    (k*d squared-diff terms in one SQL expression).  Vectorized argmin
    per subspace over the whole Arrow batch; ties -> lowest code
    (np.argmin), same tie rule as the SQL form.  Not oracle-pinned:
    numpy's pairwise summation may differ from the sequential fold by
    an ulp on exact centroid-distance ties — the SQL form remains the
    bit-contract path for small k."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cents = [np.asarray([c for _code, c in book], dtype=np.float64) for book in books]
    sub = cents[0].shape[1]

    @pandas_udf("array<int>")
    def _enc(v: pd.Series) -> pd.Series:
        X = np.asarray(v.tolist(), dtype=np.float64)
        out = np.empty((len(X), len(cents)), np.int32)
        for j, Cj in enumerate(cents):
            S = X[:, j * sub : (j + 1) * sub]
            d2 = ((S[:, None, :] - Cj[None, :, :]) ** 2).sum(axis=2)
            out[:, j] = np.argmin(d2, axis=1)
        return pd.Series([row.tolist() for row in out])

    return _enc(F.col(vec_col))


# per-subspace codebook size above which the literal-SQL encoder gives
# way to the Arrow/numpy one (k*d terms stop fitting codegen budgets)
_SQL_ENCODER_MAX_K = 16


def _codes_col(vec_col: str, books, encoder: str = "auto") -> Column:
    """The codes expression under the encoder policy: ``sql`` (bit-exact
    oracle contract, small k), ``numpy`` (Arrow-batched, any k), or
    ``auto`` (sql up to k=16 per subspace, numpy beyond)."""
    if encoder == "auto":
        encoder = "sql" if max(len(b) for b in books) <= _SQL_ENCODER_MAX_K else "numpy"
    if encoder == "sql":
        return pq_code_expr(vec_col, books)
    if encoder == "numpy":
        return pq_codes_udf(vec_col, books)
    raise ValueError(f"unknown encoder {encoder!r} (sql | numpy | auto)")


def encode_pq(
    embeddings: DataFrame,
    books,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    encoder: str = "auto",
) -> DataFrame:
    """(id, codes): the stored form — m ints instead of d floats."""
    return embeddings.select(
        F.col(id_col), _codes_col(vec_col, books, encoder).alias("codes")
    )


def adc_table(qvec, books):
    """(m x k) per-query subspace distance table, sequential-fold float64
    — plain Python data ready to broadcast as a literal."""
    sub = len(books[0][0][1])
    tbl = []
    for j, book in enumerate(books):
        row = []
        for _code, cent in book:
            acc = 0.0
            for x, c in zip(qvec[j * sub : (j + 1) * sub], cent):
                dxc = float(x) - float(c)
                acc = acc + dxc * dxc
            row.append(acc)
        tbl.append(row)
    return tbl


def _resolve_rerank(rerank: int | None, k: int) -> int:
    """``None`` (the serving default) -> a shortlist an order of magnitude
    past k (Jegou §V sizes k' >> k); 0 -> pure ADC; explicit ints pass
    through (floored at k — a shortlist below k can't fill the result)."""
    if rerank is None:
        return max(50, 10 * k)
    return max(rerank, k) if rerank else 0


def _exact_rerank(
    shortlist: DataFrame,
    vec_src: DataFrame,
    q_rows,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Re-rank the ADC shortlist by EXACT squared L2 (Jegou §V): the
    shortlist (n_queries x k' rows — tiny) broadcasts into a join
    against the float-vector source, so only shortlisted ids' vectors
    flow into scoring; the fold is sequential left-associated float64,
    the order the DuckDB oracle unrolls term-for-term
    (q_knn_ivfpq_rerank)."""
    spark = shortlist.sparkSession
    qdf = spark.createDataFrame(
        [(r["qid"], [float(x) for x in r["qv"]]) for r in q_rows], ["query_id", "qv"]
    )
    cand = vec_src.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv")
    )
    scored = (
        cand.join(F.broadcast(shortlist.select("query_id", "neighbor_id")), "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .withColumn(
            "_xd",
            F.aggregate(
                F.zip_with(
                    F.col("_nv"),
                    F.col("qv"),
                    lambda x, q: (x.cast("double") - q) * (x.cast("double") - q),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("_xd"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def knn_ivfpq(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    nprobe: int = 2,
    m: int = 8,
    pq_k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
    rerank: int | None = None,
    encoder: str = "auto",
    residual: bool = False,
) -> DataFrame:
    """IVFADC (Jegou et al. §IV): the compute-bound and memory-bound
    halves composed — the IVF coarse quantizer prunes to ``nprobe``
    cells' candidates, then ADC over PQ codes ranks them without reading
    a float vector.  Candidate cost per query drops to
    ``nprobe/n_centroids`` of the corpus AND each candidate costs m
    lookups instead of d multiplies; at 100 TB this is the configuration
    that serves ANN from a few TB of codes.  Same output shape as
    knn_bruteforce.

    ``rerank`` (default auto = max(50, 10k)) adds the §V exact re-rank:
    ADC shortlists k' candidates, a broadcast-shortlist join reads ONLY
    those float vectors, exact L2 orders the final top-k.  ``rerank=0``
    is the pure-ADC ranking (the bit-oracle contract of q_knn_ivfpq).

    ``residual=True`` is §IV's actual encoding: PQ quantizes the residual
    vs the assigned cell's MEAN instead of the raw vector, spending the
    whole code budget on in-cluster structure; the ADC table is then
    built per (query, probed cell) from the query's residual against
    THAT cell.  Same storage, same scan shape.  The win appears when
    cluster position dominates vector magnitude — the scattered-centers
    test PINS recall improvement and a >2x reconstruction-MSE reduction
    (measured point values: MSE 28.3 -> 5.9, recall 8x); on the grid's
    synthetic corpora — whose in-cluster residual IS the full random
    vector — it is measured neutral (BENCH/IVF.md).

    Plan shape: ONE scan of the coded corpus, equi-joined on
    ``centroid_id`` against a broadcast (query x probed-cell, ADC-table)
    frame — query count scales the broadcast, never the scan count.
    Both quantizers train from a single collected sample."""
    from .similarity import (
        collect_training_sample,
        ivf_cell_expr,
        ivf_probe_cells_expr,
        train_ivf_centroids_local,
    )

    X = collect_training_sample(embeddings, id_col, vec_col, sample_mod, "knn_ivfpq")
    cents = train_ivf_centroids_local(X, n_centroids)
    means = None
    if residual:
        books, means = train_pq_codebooks_residual_local(X, cents, m=m, k=pq_k)
    else:
        books = train_pq_codebooks_local(X, m=m, k=pq_k)
    nprobe = max(1, min(nprobe, len(cents)))
    q_rows = sorted(
        queries.select(
            F.col(id_col).alias("qid"),
            F.col(vec_col).alias("qv"),
            ivf_probe_cells_expr(vec_col, cents, nprobe).alias("cells"),
        ).collect(),
        key=lambda r: r["qid"],
    )
    if not q_rows:
        return _empty_knn(queries, id_col)
    coded = _encode_cells(embeddings, cents, books, encoder, means, id_col, vec_col)
    return _score_probed_cells(
        coded, q_rows, books, k,
        rerank=_resolve_rerank(rerank, k),
        vec_src=embeddings, id_col=id_col, vec_col=vec_col,
        residual_means=dict(means) if means else None,
    )


def _encode_cells(
    embeddings: DataFrame, cents, books, encoder: str, means,
    id_col: str, vec_col: str, keep_vec: bool = False,
) -> DataFrame:
    """(neighbor_id, codes, centroid_id[, vec]): the shared coding
    projection of the inline and persisted IVFADC paths — raw-vector
    codes, or (with ``means`` set) codes over the residual vs the
    assigned cell's mean.  One narrow scan, no shuffle; ``keep_vec``
    carries the float column through for store_vectors indexes."""
    from .similarity import ivf_cell_expr

    base = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col),
        ivf_cell_expr(vec_col, cents).alias("centroid_id"),
    )
    src = vec_col
    if means is not None:
        base = base.withColumn("_res", residual_expr(vec_col, means))
        src = "_res"
    cols = ["neighbor_id", _codes_col(src, books, encoder).alias("codes"), "centroid_id"]
    if keep_vec:
        cols.insert(1, F.col(vec_col))
    return base.select(*cols)


def _adc_dist_expr(tbl_lit: Column) -> Column:
    return F.aggregate(
        F.zip_with(
            F.col("codes"),
            tbl_lit,
            lambda c, row: F.element_at(row, c.cast("int") + 1),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def knn_pq(
    codes_df: DataFrame,
    queries: DataFrame,
    books,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int = 0,
    embeddings: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k by ADC distance over the CODES table: each
    query's (m x k) distance table is computed driver-side (queries are
    small by the same contract as the other knn operators) and shipped
    in ONE broadcast frame; the codes table is scanned once whatever the
    query count, and each candidate costs m lookups + a fold.  Output
    shape matches knn_bruteforce: (query_id, rank, neighbor_id); ranking
    ties break on neighbor id.

    ``rerank > 0`` (requires ``embeddings``, the float-vector source)
    shortlists k' by ADC then re-ranks by exact L2 via a
    broadcast-shortlist join — the codes-only default stays pure ADC
    because this operator's input deliberately carries no floats."""
    if rerank and embeddings is None:
        raise ValueError("knn_pq(rerank=...) needs the embeddings frame as the exact-vector source")
    q_rows = sorted(
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv")).collect(),
        key=lambda r: r["qid"],
    )
    if not q_rows:
        return _empty_knn(queries, id_col)
    spark = codes_df.sparkSession
    qdf = spark.createDataFrame(
        [(r["qid"], adc_table(r["qv"], books)) for r in q_rows], ["query_id", "tbl"]
    )
    scored = (
        codes_df.select(F.col(id_col).alias("neighbor_id"), "codes")
        .crossJoin(F.broadcast(qdf))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("adc_dist", _adc_dist_expr(F.col("tbl")))
    )
    if rerank:
        short = _rank_topk(scored, max(rerank, k))
        return _exact_rerank(short, embeddings, q_rows, k, id_col, vec_col)
    return _rank_topk(scored, k)


def write_ivfpq_index(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 8,
    m: int = 8,
    pq_k: int = 16,
    n_iters: int = 5,
    sample_mod: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    store_vectors: bool = True,
    encoder: str = "auto",
    residual: bool = False,
):
    """Materialize the IVFADC serving layout: PQ codes PARTITIONED BY
    IVF cell, both codebooks as JSON alongside.

    This is THE 100 TB ANN configuration: the corpus's float vectors are
    read exactly once (at build), and every query after that touches only
    its nprobe cells' code files (static partition filter — unprobed
    cells scan zero bytes); ADC scans read no float bytes at all.

    ``store_vectors`` (default) keeps the float column IN the cell files
    for the exact re-rank stage: parquet is columnar, so ADC scans that
    project only ``codes`` still read zero float bytes, while re-rank
    reads floats from the probed partitions only — the disk-resident-
    vector layout of re-ranked ANN serving.  ``store_vectors=False`` is
    the minimal pure-ADC footprint (~d*4/m smaller than the corpus);
    probes against such an index must pass ``rerank=0``.  Returns
    (centroids, codebooks)."""
    import json
    from pathlib import Path

    from ..checkpoints import atomic_write_text
    from .similarity import collect_training_sample, ivf_cell_expr, train_ivf_centroids_local

    X = collect_training_sample(embeddings, id_col, vec_col, sample_mod, "write_ivfpq_index")
    cents = train_ivf_centroids_local(X, n_centroids, n_iters)
    means = None
    if residual:
        books, means = train_pq_codebooks_residual_local(X, cents, m=m, k=pq_k, n_iters=n_iters)
    else:
        books = train_pq_codebooks_local(X, m=m, k=pq_k, n_iters=n_iters)
    coded = _encode_cells(
        embeddings, cents, books, encoder, means, id_col, vec_col,
        keep_vec=store_vectors,
    )
    (
        coded.withColumnRenamed("neighbor_id", id_col)
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(f"{path}/cells")
    )
    # metadata is the index's commit point: atomic temp+rename so a crash
    # mid-write can't leave a valid-looking dir with truncated JSON
    # (ADVICE r3 — mirrors the manifest discipline in streaming/incremental)
    atomic_write_text(
        Path(path, "codebooks.json"),
        json.dumps(
            {"centroids": cents, "books": books, "residual": residual, "means": means}
        ),
    )
    return cents, books


def knn_ivfpq_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int | None = None,
) -> DataFrame:
    """Top-k against a persisted IVFADC index (:func:`write_ivfpq_index`):
    codebooks load driver-side (tiny), the probed cell ids become a
    STATIC partition filter, and scoring is the same broadcast
    table-join as :func:`knn_ivfpq`.  Same output shape as
    knn_bruteforce.

    ``rerank`` (default auto = max(50, 10k)) re-ranks the ADC shortlist
    by exact L2 against the float column stored in the SAME probed
    partitions — float reads stay partition-pruned to nprobe cells.
    Requires an index written with ``store_vectors=True`` (the default);
    a vectorless index raises a clear error instead of mis-ranking."""
    import json
    from pathlib import Path

    from .similarity import ivf_probe_cells_expr

    meta = json.loads((Path(path) / "codebooks.json").read_text())
    cents = [(int(c), v) for c, v in meta["centroids"]]
    books = [[(int(c), v) for c, v in book] for book in meta["books"]]
    # the stored flag is authoritative: codes in the cell files were
    # produced under it, and scoring must build matching ADC tables
    # from the SAME frozen cell means — a residual index without them
    # would silently mis-rank, so it raises instead
    means = None
    if meta.get("residual"):
        if not meta.get("means"):
            raise ValueError(
                f"index at {path!r} is residual-coded but carries no cell "
                "means — metadata is damaged or from an incompatible "
                "writer; rebuild with write_ivfpq_index(residual=True)"
            )
        means = [(int(c), v) for c, v in meta["means"]]
    nprobe = max(1, min(nprobe, len(cents)))
    q_rows = sorted(
        queries.select(
            F.col(id_col).alias("qid"),
            F.col(vec_col).alias("qv"),
            ivf_probe_cells_expr(vec_col, cents, nprobe).alias("cells"),
        ).collect(),
        key=lambda r: r["qid"],
    )
    if not q_rows:
        return _empty_knn(queries, id_col)
    probe_ids = sorted({int(c) for r in q_rows for c in r["cells"]})
    stored = spark.read.parquet(f"{path}/cells").filter(
        F.col("centroid_id").isin(probe_ids)
    )
    cells = stored.select(F.col(id_col).alias("neighbor_id"), "codes", "centroid_id")
    rerank = _resolve_rerank(rerank, k)
    if rerank and vec_col not in stored.columns:
        raise ValueError(
            f"index at {path!r} was written with store_vectors=False — "
            "re-rank has no float source; pass rerank=0 for pure-ADC "
            "ranking or rebuild the index with store_vectors=True"
        )
    return _score_probed_cells(
        cells, q_rows, books, k,
        rerank=rerank, vec_src=stored, id_col=id_col, vec_col=vec_col,
        residual_means=dict(means) if means else None,
    )


def _score_probed_cells(
    candidates: DataFrame,
    q_rows,
    books,
    k: int,
    rerank: int = 0,
    vec_src: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    residual_means: dict | None = None,
) -> DataFrame:
    """Shared IVFADC scoring tail (inline and persisted paths):
    broadcast one (query, probed-cell, ADC-table) frame — the table
    computed ONCE per query and reused across its cells (or, under
    residual coding, once per (query, probed cell) from the query's
    residual vs that cell) — equi-join on cell, score, rank; with
    ``rerank`` set, ADC produces a k' shortlist that re-ranks exactly
    against ``vec_src``.  ``candidates`` must carry (neighbor_id, codes,
    centroid_id)."""
    spark = candidates.sparkSession
    data = []
    for r in q_rows:
        if residual_means is None:
            tbl = adc_table(r["qv"], books)
            data.extend((r["qid"], int(c), tbl) for c in r["cells"])
        else:
            for c in r["cells"]:
                mean = residual_means[int(c)]
                qres = [float(x) - float(ci) for x, ci in zip(r["qv"], mean)]
                data.append((r["qid"], int(c), adc_table(qres, books)))
    qdf = spark.createDataFrame(data, ["query_id", "centroid_id", "tbl"])
    scored = (
        candidates.join(F.broadcast(qdf), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("adc_dist", _adc_dist_expr(F.col("tbl")))
    )
    if rerank:
        short = _rank_topk(scored, max(rerank, k))
        return _exact_rerank(short, vec_src, q_rows, k, id_col, vec_col)
    return _rank_topk(scored, k)


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def _empty_knn(queries: DataFrame, id_col: str) -> DataFrame:
    """Zero-row (query_id, rank, neighbor_id) frame typed from the query
    side — the other knn operators return empty results for empty query
    sets rather than crashing; so do these."""
    return queries.select(
        F.col(id_col).alias("query_id"),
        F.lit(1).cast("int").alias("rank"),
        F.col(id_col).alias("neighbor_id"),
    ).limit(0)
