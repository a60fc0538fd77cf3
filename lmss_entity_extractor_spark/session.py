"""SparkSession factory with the pipeline's standard configuration.

Tuned for the sandbox (single JVM, local[N]) but expressed the way a
1000-executor deployment would be: AQE on (runtime partition coalescing +
skew-join splitting), Arrow-batched Python UDF transfer, bounded Arrow
batch sizes so the per-batch embedding matrices stay in executor memory
(SURVEY.md §4 O9/O10), UTC session timezone for deterministic timestamp
semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_master() -> str:
    return os.environ.get(
        "SPARK_GRAFT_MASTER",
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
    )


_THREAD_ENV = {
    # one BLAS/OpenMP thread per Python worker: N workers x 32-thread
    # pools spin-wait each other into the ground on a shared host (numpy
    # ops here are tiny — 64-dim vectors — so pools only add contention)
    "OPENBLAS_NUM_THREADS": "1",
    "OMP_NUM_THREADS": "1",
    "MKL_NUM_THREADS": "1",
    "NUMEXPR_NUM_THREADS": "1",
    "VECLIB_MAXIMUM_THREADS": "1",
}


def get_spark(
    app_name: str = "lmss-kg-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    for k, v in _THREAD_ENV.items():
        os.environ.setdefault(k, v)
    master = master or default_master()
    # shuffle width ~ cores: at cluster scale this would be a multiple of
    # total executor cores (or left to AQE coalescing from a high initial).
    if shuffle_partitions is None:
        try:
            n = int(master.split("[")[1].rstrip("]").replace("*", str(os.cpu_count() or 8)))
        except Exception:
            n = 32
        shuffle_partitions = max(n, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 16384 (r5): fewer, larger Arrow batches cut the per-batch
        # JVM<->Python overhead that dominates at wide parallelism —
        # measured 14% faster extraction at local[16] (4% slower at
        # local[4], where per-batch overhead amortizes over wall time
        # anyway); the deployment shape is wide executors
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # let AQE re-optimize plans under a .cache()/persist() — without
        # this a cached DataFrame pins the non-adaptive physical plan
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        # session-catalog warehouse for bucketed tables (catalog.py):
        # per-process by default — a shared fixed path lets one session's
        # drop_table rmtree a table another live session is scanning
        # (the in-memory catalog gives no cross-process table sharing
        # anyway); override via SPARK_GRAFT_WAREHOUSE for a durable
        # single-tenant warehouse
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE", f"/tmp/lmss_spark_warehouse_{os.getpid()}"
            ),
        )
    )
    for k, v in _THREAD_ENV.items():
        builder = builder.config(f"spark.executorEnv.{k}", v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def widen_small_input(df, key_cols: list[str], factor: int = 4):
    """Hash-repartition ``df`` wider when the input carries fewer splits
    than the session can use — a small input (one parquet file) would
    otherwise serialize a CPU-bound mapInPandas stage onto one core.

    The split estimate starts from ``df.inputFiles()`` — a plan-free
    metadata lookup, unlike ``df.rdd.getNumPartitions()`` which
    materializes the RDD conversion per call (ADVICE r1) — and, for
    locally stat-able files, adds ceil(size / maxPartitionBytes) so one
    large multi-split file is not mistaken for one split (which would
    force a pointless full shuffle ahead of the stage).  Unstat-able
    files (object stores) count as one split each — a lower bound, so
    the check can only over-widen, never under-parallelize; on a real
    cluster reading many files this is a no-op.  Non-file inputs
    (in-memory test frames) report zero files and are always widened,
    which matches their at-most-defaultParallelism partitioning.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * factor
    files = df.inputFiles()
    if len(files) >= target:
        return df
    try:
        max_bytes = int(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728").rstrip("b"))
    except ValueError:
        max_bytes = 128 * 1024 * 1024
    splits = 0
    for f in files:
        path = f[7:] if f.startswith("file:") and f[5:7] == "//" else f
        try:
            size = os.stat(path).st_size
            splits += max(1, -(-size // max_bytes))
        except OSError:
            splits += 1
        if splits >= target:
            return df
    return df.repartition(target, *key_cols)
