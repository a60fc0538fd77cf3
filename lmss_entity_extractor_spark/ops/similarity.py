"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline (crossJoin against a
broadcast query set — fine when |queries| is small); sign-bit LSH
bucketing is the scale path (candidate set shrinks ~2^bits, join on the
bucket key instead of a crossJoin).  Dot products use the built-in
higher-order functions ``zip_with``/``aggregate`` — JVM-side, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    # column-vs-column dots stay as the HOF fold: an unrolled 64-term
    # getItem chain measured SLOWER here (3.19s vs 2.49s at sf1.0
    # knn_bruteforce — the ~400-node expression defeats codegen), unlike
    # the literal-vector case in _dot_sql below where constant folding
    # makes unrolling a 1.6x win
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    """Cosine with the reference's zero-norm guard -> 0
    (/root/reference/app/lmss_search.py:106-110)."""
    na, nb = norm_expr(a), norm_expr(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot_expr(a, b) / (na * nb))


def knn_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors per query: (query_id, rank, neighbor_id).

    ``queries`` is broadcast (small side); ranking window ties break on
    neighbor id for determinism.  Self-matches excluded."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    e = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"))
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine_expr(F.col("qvec"), F.col("nvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def sign_bucket_expr(vec_col: Column, bits: int = 4) -> Column:
    """Sign-LSH bucket id from the first ``bits`` dimensions: bit i set
    iff vec[i] > 0.  A random-hyperplane LSH would rotate first; for
    pre-normalized embeddings the leading-dims variant is deterministic
    and engine-portable."""
    b = F.lit(0)
    for i in range(bits):
        b = b + F.when(vec_col.getItem(i) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return b


def collect_training_sample(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
    op_name: str = "train",
):
    """The shared deterministic-training sample contract (IVF and PQ):
    optional hash sample -> capped driver collect -> id-sorted float64
    matrix.  One collect can feed both quantizers (knn_ivfpq)."""
    import numpy as np

    src = embeddings.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if sample_mod is not None and sample_mod > 1:
        src = src.filter(F.pmod(F.xxhash64(F.col("_id")), F.lit(sample_mod)) == 0)
    # refuse a silent full-table collect on big data: training without a
    # sample_mod is only for small/test tables.  One pass: collect with a
    # cap+1 limit and fail if it truncated (the rows are only USED when
    # under the cap, where limit() returns the complete — hence
    # deterministic — set; the caller must choose the hash-sample rate
    # explicitly for larger tables).
    _CAP = 500_000
    rows = src.limit(_CAP + 1).collect()
    if len(rows) > _CAP:
        raise ValueError(
            f"{op_name}: more than {_CAP} rows would be collected to the "
            "driver; pass sample_mod so the deterministic hash sample "
            "lands in the ~1e5 range"
        )
    rows = sorted(rows, key=lambda r: r["_id"])
    if not rows:
        raise ValueError(f"{op_name}: empty sample (raise sample coverage)")
    return np.asarray([r["_v"] for r in rows], dtype=np.float64)


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 8,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int | None = None,
) -> list[tuple[int, list[float]]]:
    """Deterministic spherical k-means coarse quantizer.

    Scale shape: training happens on a *deterministic hash sample* of the
    vectors (``pmod(xxhash64(id), sample_mod) == 0``), collected to the
    driver and iterated in numpy — at 100 TB you set ``sample_mod`` so the
    sample is ~10^5 rows (one narrow filtered scan; k-means on 1e5 x dim
    doubles is milliseconds per iteration).  ``sample_mod=None`` trains on
    the full table and is only for small/test data.

    Determinism (required by the resume/oracle contract): the sample is
    sorted by id before use, init = ``n_centroids`` evenly spaced rows of
    the sorted sample, Lloyd iterations use argmax-dot with
    lowest-centroid tiebreak, and empty clusters keep their previous
    centroid.  Same input -> bit-identical centroids at any parallelism.

    Returns ``[(centroid_id, unit_vector)]`` — plain driver-side data,
    ready for :func:`ivf_cell_expr` (no DataFrame, no shuffle).
    """
    X = collect_training_sample(embeddings, id_col, vec_col, sample_mod, "train_ivf_centroids")
    return train_ivf_centroids_local(X, n_centroids, n_iters)


def train_ivf_centroids_local(X, n_centroids: int = 8, n_iters: int = 5):
    """The numpy training core over an id-sorted float64 sample (same
    split as pq.train_pq_codebooks_local — callers with both quantizers
    collect the sample once)."""
    import numpy as np

    # einsum, not linalg.norm: norm's BLAS dot picks CPU-specific kernels
    # whose reduction order differs ACROSS HOSTS (caught by the fixture
    # freshness gate when the sandbox moved hardware) — einsum
    # (optimize=False) is a fixed-order C loop everywhere
    norms = np.sqrt(np.einsum("nd,nd->n", X, X))
    X = X[norms > 0] / norms[norms > 0, None]  # zero vectors carry no direction
    n = len(X)
    if n == 0:
        raise ValueError(
            "train_ivf_centroids: every sampled vector is zero-norm — no "
            "direction to train on (check the embedding column / encoder)"
        )
    k = min(n_centroids, n)
    # evenly spaced rows of the id-sorted sample: deterministic, spread
    # across the id space (ids are usually ingestion-ordered)
    C = X[np.linspace(0, n - 1, k).astype(int)].copy()
    for _ in range(max(n_iters, 0)):
        # einsum (optimize=False) keeps a fixed summation order independent
        # of BLAS threading — `X @ C.T` reassociated across driver sessions
        # and drifted the trained centroids by 1 ulp (caught by the fixture
        # freshness gate in test_contract.py)
        sims = np.einsum("nd,kd->nk", X, C)         # (n, k)
        assign = np.argmax(sims, axis=1)            # ties -> lowest index
        for j in range(k):
            members = X[assign == j]
            if len(members):
                m = members.mean(axis=0)
                nm = float(np.sqrt(np.einsum("d,d->", m, m)))
                if nm > 0:
                    C[j] = m / nm
    return [(j, C[j].tolist()) for j in range(k)]


def _dlit(v: float) -> str:
    """Exact double literal: repr round-trips, the D-suffixed literal
    parses to the identical IEEE value.  Non-finite values (a NaN/Inf
    embedding leaking into a trained centroid) get the CAST spelling —
    'nanD' would parse as a column reference."""
    import math

    v = float(v)
    if not math.isfinite(v):
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        return "CAST('Infinity' AS DOUBLE)" if v > 0 else "CAST('-Infinity' AS DOUBLE)"
    return f"{v!r}D"


def _qcol(name: str) -> str:
    """Quote a column name for generated SQL with F.col's semantics:
    dots traverse struct fields (each part backtick-quoted, embedded
    backticks doubled), so ``s.embedding`` keeps resolving."""
    return ".".join("`" + part.replace("`", "``") + "`" for part in name.split("."))


def _dot_sql(vec_name: str, cvec: list[float]) -> str:
    """dot_expr against a literal vector as generated SQL — identical
    zip_with/left-fold arithmetic, but ONE F.expr parse instead of
    thousands of py4j Column constructions (profiled: expression BUILD,
    not execution, dominated the literal-heavy IVF/PQ operators at ~5s
    per plan).

    r6: rows whose array length equals the literal's take an UNROLLED
    left-associated sum (``0D + v[0]*c0 + v[1]*c1 + ...``) — the same
    IEEE additions in the same order as the fold, evaluated without the
    per-element lambda dispatch that makes ``aggregate``/``zip_with``
    slow; other lengths keep the fold verbatim via CASE.  Measured
    three ways at local[32] (sf0.1 cell assignment, warm medians):
    fold-only 0.25 s/1.14 s (sf0.1/sf1.0), this CASE+fold form
    0.73 s/0.73 s, and a CASE whose else branch is a NULL literal
    (provably equal to the fold on every mismatched length — pinned by
    TestDotSqlEquivalence) 1.47 s: SHRINKING the expression made it
    eligible for whole-stage codegen and the ~4000-node compile became
    a larger fixed cost than interpreted execution ever was.  The fold
    branch is therefore ALSO the codegen-suppressor that keeps the
    unrolled branch interpreted-but-fast at every scale."""
    q = _qcol(vec_name)
    arr = ", ".join(_dlit(x) for x in cvec)
    fold = (
        f"aggregate(zip_with({q}, array({arr}), "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0D, (acc, v) -> acc + v)"
    )
    terms = " + ".join(
        f"(CAST({q}[{i}] AS DOUBLE) * {_dlit(x)})" for i, x in enumerate(cvec)
    )
    unrolled = f"(0D + {terms})" if terms else "0D"
    return f"(CASE WHEN size({q}) = {len(cvec)} THEN {unrolled} ELSE {fold} END)"


def _dot_fold_sql(vec_name: str, cvec: list[float]) -> str:
    """The plain zip_with/aggregate fold against a literal vector — the
    round-5 form, value-identical to :func:`_dot_sql` (whose unrolled
    branch reproduces the fold's additions exactly).  Used where the
    input frame is SMALL by contract (query-side probes): there the
    CASE+unrolled form's per-plan fixed cost is pure loss."""
    arr = ", ".join(_dlit(x) for x in cvec)
    return (
        f"aggregate(zip_with({_qcol(vec_name)}, array({arr}), "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0D, (acc, v) -> acc + v)"
    )


def _ivf_struct_entries_sql(vec_name: str, centroids, dot=None) -> str:
    dot = dot or _dot_sql
    return ", ".join(
        f"named_struct('d', {dot(vec_name, cvec)}, 'nid', {-cid})"
        for cid, cvec in centroids
    )


def ivf_cell_expr(vec_name: str, centroids: list[tuple[int, list[float]]]) -> Column:
    """Nearest-centroid id as a pure column expression — narrow, JVM-side,
    zero shuffle: one dot product per (row, centroid) via ``zip_with``/
    ``aggregate``, argmax as ``array_max`` over (dot, -id) structs.

    Centroids must be unit vectors (``train_ivf_centroids`` guarantees
    this), so argmax-dot == argmax-cosine per row; ties break to the
    lowest centroid id, and an all-zero row (cosine undefined) lands in
    cell 0 — matching the cosine zero-guard convention.  ``vec_name`` is
    the embedding COLUMN NAME (the expression is generated as one SQL
    string — see ``_dot_sql``)."""
    return F.expr(
        f"-(array_max(array({_ivf_struct_entries_sql(vec_name, centroids)})).nid)"
    )


def ivf_probe_cells_expr(
    vec_name: str, centroids: list[tuple[int, list[float]]], nprobe: int
) -> Column:
    """The ``nprobe`` nearest centroid ids (desc similarity, asc id
    tiebreak) as an array column — the query-side multi-cell probe.

    Query frames are small by contract, so the dots use the plain fold
    (:func:`_dot_fold_sql`): the CASE+unrolled form saves per-row time
    the probe side never spends and costs per-plan analysis time it
    always pays.  Values are identical either way."""
    # d desc, then -id desc = id asc
    return F.expr(
        "transform(slice(reverse(array_sort(array("
        f"{_ivf_struct_entries_sql(vec_name, centroids, dot=_dot_fold_sql)}"
        f"))), 1, {int(nprobe)}), s -> -s.nid)"
    )


def assign_ivf_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: tag each vector with the id of its
    nearest centroid (max cosine, asc centroid-id tiebreak).

    The centroid table is tiny by construction, so it is collected and
    folded into a literal column expression (:func:`ivf_cell_expr`) —
    assignment is one narrow projection over the vectors: no crossJoin
    fan-out, no window, no shuffle, and no uniqueness precondition on
    ``id_col``.  Centroids are L2-normalized driver-side so argmax-dot
    equals argmax-cosine."""
    import numpy as np

    rows = sorted(centroids.select(id_col, vec_col).collect(), key=lambda r: r[0])
    cents = []
    for r in rows:
        v = np.asarray(r[1], dtype=np.float64)
        nv = float(np.sqrt(np.einsum("d,d->", v, v)))
        cents.append((r[0], (v / nv if nv > 0 else v).tolist()))
    return vectors.withColumn("centroid_id", ivf_cell_expr(vec_col, cents))


def knn_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    nprobe: int = 2,
    train_iters: int = 5,
    sample_mod: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: vectors are bucketed by nearest coarse
    centroid from a trained spherical-k-means codebook, and each query
    probes its ``nprobe`` nearest cells.

    The scale path beyond ``knn_lsh``: candidate count per query is
    ~``nprobe * N / n_centroids`` regardless of embedding geometry, and
    the cell join is an equi-join on ``centroid_id`` (broadcastable query
    side).  Cell assignment is a narrow literal-expression projection
    (no shuffle); each vector lives in exactly one cell, so probing
    distinct cells never duplicates a candidate.  ``train_iters=0``
    degrades to the untrained evenly-spaced-sample codebook.  Same output
    shape as ``knn_bruteforce``: (query_id, rank, neighbor_id)."""
    cents = train_ivf_centroids(
        embeddings, n_centroids, train_iters, id_col, vec_col, sample_mod
    )
    nprobe = max(1, min(nprobe, len(cents)))
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        ivf_cell_expr(vec_col, cents).alias("centroid_id"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(ivf_probe_cells_expr(vec_col, cents, nprobe)).alias("centroid_id"),
    )
    scored = (
        e.join(F.broadcast(q), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine_expr(F.col("qvec"), F.col("nvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def write_ivf_index(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 8,
    n_iters: int = 5,
    sample_mod: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Train a codebook and materialize the IVF index as a parquet table
    PARTITIONED BY centroid_id — the persisted-ANN-index pattern: train
    once, serve many queries.

    Partitioning by cell makes every probe a *partition-pruned* scan:
    a query reading nprobe of n_centroids cells touches only that
    fraction of the files on disk (PartitionFilters in the scan, no data
    read for unprobed cells) — the property that makes IVF pay off at
    100 TB, where re-deriving cell assignments per query would be a full
    corpus pass.  The codebook is stored alongside as JSON.  Returns the
    trained centroids."""
    import json
    from pathlib import Path

    cents = train_ivf_centroids(embeddings, n_centroids, n_iters, id_col, vec_col, sample_mod)
    (
        embeddings.withColumn("centroid_id", ivf_cell_expr(vec_col, cents))
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(f"{path}/cells")
    )
    # atomic commit point: a crash mid-write must not leave a readable
    # dir with truncated centroid JSON (ADVICE r3)
    from ..checkpoints import atomic_write_text

    atomic_write_text(Path(path) / "centroids.json", json.dumps(cents))
    return cents


def ivf_index_add(
    embeddings: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally add vectors to a persisted IVF index
    (:func:`write_ivf_index`) WITHOUT retraining: new rows are assigned
    to cells by the FROZEN codebook and appended into the existing
    cell partitions — the serving-path ingest (an index over 100 TB is
    rebuilt rarely and appended to constantly).

    Contract (and its honest limit): queries over the grown index are
    EXACTLY what a fresh build with the same frozen centroids over
    old ∪ new would return — pinned by test.  What appends do NOT do is
    re-center the codebook; if the new data drifts far from the trained
    cells, recall decays and the fix is a rebuild (monitor cell-size
    skew — the same signal Faiss users watch).  Append atomicity is
    parquet-file-level: a crashed append leaves whole files missing,
    never torn rows."""
    import json
    from pathlib import Path

    cents = [
        (int(c), v)
        for c, v in json.loads((Path(path) / "centroids.json").read_text())
    ]
    (
        embeddings.withColumn("centroid_id", ivf_cell_expr(vec_col, cents))
        .write.mode("append")
        .partitionBy("centroid_id")
        .parquet(f"{path}/cells")
    )


def knn_ivf_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k against a persisted IVF index
    (:func:`write_ivf_index`): the codebook loads driver-side (tiny), the
    query side explodes to its nprobe nearest cells, and the cell scan is
    partition-pruned to exactly those cells.  Same output shape as
    ``knn_bruteforce``."""
    import json
    from pathlib import Path

    cents = [(int(c), v) for c, v in json.loads((Path(path) / "centroids.json").read_text())]
    nprobe = max(1, min(nprobe, len(cents)))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.explode(ivf_probe_cells_expr(vec_col, cents, nprobe)).alias("centroid_id"),
    )
    # The query batch is small by contract (it broadcasts below), so the
    # probed cell set is collected driver-side and pushed as a STATIC
    # partition filter — guaranteed pruning (PartitionFilters in the
    # scan), not best-effort runtime DPP: unprobed cells contribute zero
    # scanned bytes.
    probe_ids = sorted({r[0] for r in q.select("centroid_id").distinct().collect()})
    cells = (
        spark.read.parquet(f"{path}/cells")
        .filter(F.col("centroid_id").isin(probe_ids))
        .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"), "centroid_id")
    )
    scored = (
        cells.join(F.broadcast(q), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine_expr(F.col("qvec"), F.col("nvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def knn_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed approximate top-k: neighbors searched only within the
    query's sign bucket.  Same output shape as ``knn_bruteforce``."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        sign_bucket_expr(F.col(vec_col), bits).alias("bucket"),
    )
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        sign_bucket_expr(F.col(vec_col), bits).alias("bucket"),
    )
    scored = (
        e.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine_expr(F.col("qvec"), F.col("nvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )
