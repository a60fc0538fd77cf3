"""Cluster job entrypoint for the KG-construction pipeline.

Run with spark-submit, shipping the package as a ``--py-files`` zip (the
north rule's deployment shape — no repo checkout needed on executors):

    python tools/make_pyfiles.py                       # -> dist/lmss_entity_extractor_spark.zip
    spark-submit --master <cluster-or-local[N]> \\
        --py-files dist/lmss_entity_extractor_spark.zip \\
        jobs/kg_job.py \\
        --transcripts /path/to/transcripts_parquet \\
        --owl /path/to/LMSS.owl \\
        --warehouse /path/to/warehouse \\
        [--threshold 0.7] [--salt-buckets 16]

The job is checkpoint-resumable: re-submitting over the same warehouse
skips completed stages via the per-stage manifests (input snapshot +
config hash), mirroring the reference's whole-build hash gate
(/root/reference/app/run_parser.py:39-45) at stage granularity.  Prints
ONE JSON metrics line on success (stage timings, row counts,
per-partition lineage summary path).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--transcripts", required=True, help="input transcripts parquet dir")
    ap.add_argument("--owl", required=True, help="LMSS OWL/RDF-XML ontology file")
    ap.add_argument("--warehouse", required=True, help="output warehouse dir (stages + graph tables)")
    ap.add_argument("--threshold", type=float, default=0.7, help="linker similarity threshold")
    ap.add_argument("--salt-buckets", type=int, default=16, help="canonicalization salt width")
    args = ap.parse_args()

    # Under spark-submit the master/deploy conf comes from the submit
    # command; builder.getOrCreate() attaches to it.  The session-tuning
    # knobs (AQE, Arrow, shuffle width) are set only if not already
    # provided via --conf.
    from pyspark.sql import SparkSession

    defaults = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
        "spark.sql.session.timeZone": "UTC",
    }
    builder = SparkSession.builder.appName("lmss-kg-job")
    for k, v in defaults.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()

    # package import AFTER the session exists: under --py-files the zip
    # is on sys.path for both driver and executors
    from lmss_entity_extractor_spark.pipeline import KGPipeline, PipelineConfig

    t0 = time.time()
    pipe = KGPipeline(
        spark,
        args.owl,
        args.warehouse,
        PipelineConfig(similarity_threshold=args.threshold, salt_buckets=args.salt_buckets),
    )
    out = pipe.run_path(args.transcripts)
    counts = {k: df.count() for k, df in out.items()}
    pipe.write_metrics()

    print(
        json.dumps(
            {
                "job": "kg_construct",
                "wall_sec": round(time.time() - t0, 3),
                "counts": counts,
                "metrics": pipe.metrics,
                "warehouse": args.warehouse,
            },
            default=str,
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
