"""Zone-map data skipping (L121): file-level min/max pruning for a
sorted parquet layout — the Iceberg/Delta data-skipping behavior
(metadata decides which files a predicate can touch BEFORE any scan),
owned explicitly so the pruning is inspectable and testable.

Spark's parquet reader already skips row groups inside the files it
opens; what it cannot do without table-format metadata is avoid
LISTING AND OPENING files at all.  At 100 TB with thousands of files,
a range predicate over a sort-clustered column should read the handful
of overlapping files and zero bytes of the rest — that decision needs
a manifest, and this module is that manifest:

* ``write_with_zonemap`` — range-repartition on the zone column, sort
  within files, write, then ONE bounded stats pass over the fresh data
  (``input_file_name`` + per-file min/max agg — the write-side indexing
  cost, same stance as the IVF/BM25 index builders) and an ATOMIC
  ``zonemap.json`` commit (tmp + ``os.replace``, the manifest-as-
  single-commit-point discipline of streaming/incremental.py);
* ``read_zone_pruned`` — load the manifest, keep files whose
  ``[min, max]`` intersects ``[lo, hi]`` (inclusive, NULL-free zones by
  construction — rows with NULL zone keys are refused at write), read
  ONLY those paths, apply the residual filter.  Result == full scan +
  filter, row-for-row; the pruning is visible in the returned plan's
  file list (asserted by test, and by the files_scanned helper).

Missing or damaged manifests REFUSE loudly (the damaged-index stance
of ops/pq.py) — silently falling back to a full scan would hide a
100 TB regression behind a correct answer.

Composes with L82: a Z-order key as the zone column gives
multi-dimensional skipping from the same one-dimensional manifest.

No reference counterpart; table-layout hygiene per SURVEY §2.11.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from .validate import validation_enabled

_MANIFEST = "zonemap.json"


def write_with_zonemap(
    df: DataFrame, path: str, zone_col: str, n_files: int = 8
) -> dict:
    """Write ``df`` range-clustered on ``zone_col`` with a per-file
    min/max manifest; returns the manifest dict."""
    if n_files < 1:
        raise ValueError(f"n_files must be >= 1, got {n_files}")
    if zone_col not in df.columns:
        raise ValueError(f"column {zone_col!r} not in DataFrame")
    if validation_enabled():
        n_null = df.filter(F.col(zone_col).isNull()).count()
        if n_null:
            raise ValueError(
                f"{n_null} rows have NULL {zone_col!r} — zone pruning is "
                "range logic and NULL has no range; filter or backfill first"
            )
    (
        df.repartitionByRange(n_files, F.col(zone_col))
        .sortWithinPartitions(zone_col)
        .write.mode("error")
        .parquet(path)
    )
    stats = (
        df.sparkSession.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(zone_col).alias("zmin"),
            F.max(zone_col).alias("zmax"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    )
    manifest = {
        "zone_col": zone_col,
        "files": sorted(
            (
                {
                    "file": r["file"],
                    "zmin": r["zmin"],
                    "zmax": r["zmax"],
                    "n_rows": r["n_rows"],
                }
                for r in stats
            ),
            key=lambda e: (e["zmin"], e["file"]),
        ),
    }
    tmp = os.path.join(path, f"_{_MANIFEST}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, _MANIFEST))
    return manifest


def _load_manifest(path: str) -> dict:
    mpath = os.path.join(path, _MANIFEST)
    if not os.path.exists(mpath):
        raise ValueError(
            f"no {_MANIFEST} under {path} — not a zone-mapped table "
            "(write_with_zonemap owns the layout); refusing a blind full scan"
        )
    try:
        with open(mpath) as f:
            m = json.load(f)
        if "zone_col" not in m or "files" not in m:
            raise KeyError("missing keys")
    except (json.JSONDecodeError, KeyError) as e:
        raise ValueError(f"damaged zone manifest at {mpath}: {e}") from e
    return m


def prune_files(path: str, lo, hi) -> tuple[list[str], int]:
    """(overlapping file paths, total file count) for [lo, hi]."""
    m = _load_manifest(path)
    keep = [e["file"] for e in m["files"] if not (e["zmax"] < lo or e["zmin"] > hi)]
    return keep, len(m["files"])


def read_zone_pruned(
    spark: SparkSession, path: str, lo, hi
) -> DataFrame:
    """Rows with ``zone_col`` in ``[lo, hi]`` reading ONLY the
    overlapping files (empty-typed result if nothing overlaps)."""
    m = _load_manifest(path)
    keep, _ = prune_files(path, lo, hi)
    zc = m["zone_col"]
    if not keep:
        return (
            spark.read.parquet(path)
            .filter(F.lit(False))
            .filter(F.col(zc).between(lo, hi))
        )
    return spark.read.parquet(*keep).filter(F.col(zc).between(lo, hi))
