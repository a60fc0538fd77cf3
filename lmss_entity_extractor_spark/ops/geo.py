"""Spatial candidate generation (L212): grid-bucketed neighbor pairs
with haversine distances — the blocking pattern that makes spatial
dedup / proximity joins tractable at 100 TB (an all-pairs distance
join is quadratic and dead; a lat/lon grid turns it into an equi-join
exactly like the MinHash band join or the ER prefix block).

Semantics: each point lands in an integer grid cell of ``cell_deg``
degrees; each point's cell plus its 8 neighbors are exploded (a
bounded ×9 fan-out on the SMALL projected table, not the fact rows'
payloads) and equi-joined against home cells; each unordered pair
surfaces exactly once (the exploded-cell == home-cell match is unique
per pair, and ``a < b`` kills the mirror).  COMPLETENESS bound: any
pair within ``cell_deg`` degrees in both axes shares or neighbors a
cell and is guaranteed emitted; pairs farther apart in grid terms are
deliberately out of scope (that is the blocking trade, documented —
pick cell_deg ≥ the radius you care about).  Distances are emitted
UNFILTERED: the haversine uses transcendental sin/cos/asin, which are
not IEEE-correctly-rounded and can differ by ULPs across engines, so
a radius threshold would knife-edge; callers filter, and the driver's
9-significant-digit comparison absorbs the ULP noise on the emitted
values.

Scale shape: one narrow projection of (id, lat, lon, cell), one ×9
explode, one hash equi-join on the cell key — no θ-join, no cross
join; skewed cells (urban hot spots) are AQE-splittable because the
join key is the cell.

No reference counterpart; spatial curation per SURVEY §2.11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


def haversine_km(lat1, lon1, lat2, lon2):
    """Great-circle distance in km as a fixed expression tree (column
    in, column out); 2R·asin(sqrt(sin²(Δφ/2)+cosφ₁cosφ₂sin²(Δλ/2)))."""
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlon)
        * F.sin(dlon)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def grid_neighbor_pairs(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    cell_deg: float = 1.0,
) -> DataFrame:
    """``(a, b, dist_km)`` — candidate point pairs from the 3×3 grid
    neighborhood, each unordered pair once, with haversine distance.
    Latitudes outside [-90, 90] or longitudes outside [-180, 180]
    are refused loudly (a silent modulo would alias hemispheres)."""
    if cell_deg <= 0:
        raise ValueError("grid_neighbor_pairs: cell_deg must be > 0")
    flt = df.filter(
        F.col(id_col).isNotNull()
        & F.col(lat_col).isNotNull()
        & F.col(lon_col).isNotNull()
    )
    n_bad = flt.filter(
        (F.col(lat_col) < -90)
        | (F.col(lat_col) > 90)
        | (F.col(lon_col) < -180)
        | (F.col(lon_col) > 180)
    ).count()
    if n_bad:
        raise ValueError(
            f"grid_neighbor_pairs: {n_bad} row(s) outside lat/lon bounds"
        )
    # longitude wraps at the antimeridian: when the cell size tiles
    # 360 exactly, longitude cells are taken MODULO the ring size, so
    # points straddling +/-180 (including the same location written
    # as lon=180 and lon=-180) share/neighbor cells.  For a cell size
    # that does not tile 360 the wrap seam cannot be gridded — the
    # +/-180 neighborhood hole is then a documented recall limit.
    ring = 360.0 / cell_deg
    wraps = float(ring).is_integer()
    cy_raw = F.floor(F.col(lon_col) / cell_deg).cast("long")
    cy = F.pmod(cy_raw, F.lit(int(ring))) if wraps else cy_raw
    pts = flt.select(
        F.col(id_col).alias("_id"),
        F.col(lat_col).cast("double").alias("_lat"),
        F.col(lon_col).cast("double").alias("_lon"),
        F.floor(F.col(lat_col) / cell_deg).cast("long").alias("_cx"),
        cy.alias("_cy"),
    )
    left = (
        pts.withColumn("_dx", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .withColumn("_dy", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .select(
            F.col("_id").alias("a"),
            F.col("_lat").alias("_lat_a"),
            F.col("_lon").alias("_lon_a"),
            (F.col("_cx") + F.col("_dx")).alias("_jx"),
            (
                F.pmod(F.col("_cy") + F.col("_dy"), F.lit(int(ring)))
                if wraps
                else (F.col("_cy") + F.col("_dy"))
            ).alias("_jy"),
        )
    )
    right = pts.select(
        F.col("_id").alias("b"),
        F.col("_lat").alias("_lat_b"),
        F.col("_lon").alias("_lon_b"),
        F.col("_cx").alias("_jx"),
        F.col("_cy").alias("_jy"),
    )
    pairs = left.join(right, ["_jx", "_jy"]).filter(F.col("a") < F.col("b"))
    return pairs.select(
        "a",
        "b",
        haversine_km(
            F.col("_lat_a"), F.col("_lon_a"), F.col("_lat_b"), F.col("_lon_b")
        ).alias("dist_km"),
    )
