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
from .validate import validation_enabled

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
    if validation_enabled():
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


def morans_i(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    value_col: str,
    cell_deg: float = 1.0,
    scale: int = 4,
) -> DataFrame:
    """One row ``(n, n_pairs, w, i_moran, e_i)`` — Moran's I spatial
    autocorrelation (L253) under the binary 3×3-grid-neighbor weight
    matrix (L212's candidate structure): do nearby points carry
    similar values — the spatial companion to the temporal ACF (L151).

        I = (n/W) · Σ_{i,j} w_ij(xᵢ−x̄)(xⱼ−x̄) / Σᵢ(xᵢ−x̄)²

    Exactness (the L151 centring idea, adapted because pairwise c·c
    products of n·x−S overflow DECIMAL(38)): center at the FLOORED
    mean m₀ = ⌊S/n⌋ — an exact decimal — so every residual
    d = x − m₀ is small and the pair sums P = Σ d_a·d_b,
    Q = Σ (d_a + d_b), D₂ = Σ d² are exact decimals; the remaining
    shift δ = (S − n·m₀)/n ∈ [0,1) is ONE division and the algebraic
    correction is a fixed tree:

        Σ(xᵢ−x̄)(xⱼ−x̄) = P − δ·Q + n_pairs·δ²
        Σ(xᵢ−x̄)²       = D₂ − n·δ²

    W = 2·n_pairs (each unordered neighbor pair counts both ways).
    Values must fit DECIMAL(12, scale) (ANSI overflow is loud);
    duplicate ids are refused (they would double weights); constant
    values (denominator ≤ 0) or no neighbor pairs → NULL i_moran.
    E[I] = −1/(n−1) for reference.

    Scale shape: the L212 grid join + one values join + combinable
    aggs — no n² anything.

    No reference counterpart; spatial analytics per SURVEY §2.11.
    """
    dec = f"decimal(12,{scale})"
    flt = df.filter(
        F.col(id_col).isNotNull() & F.col(value_col).isNotNull()
    )
    if validation_enabled():
        n_dup = (
            flt.groupBy(F.col(id_col))
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > 1)
            .count()
        )
        if n_dup:
            raise ValueError(
                f"morans_i: {n_dup} duplicate id(s) — weights would double"
            )
    vals = flt.select(
        F.col(id_col).alias("_vid"), F.col(value_col).cast(dec).alias("_x")
    )
    stats = vals.agg(
        F.count(F.lit(1)).alias("n"), F.sum("_x").alias("_s")
    )
    m0 = F.floor(F.col("_s") / F.col("n")).cast(dec)
    stats = stats.select("n", "_s", m0.alias("_m0"))
    centred = vals.crossJoin(F.broadcast(stats)).select(
        "_vid", (F.col("_x") - F.col("_m0")).alias("_d")
    )
    d2 = centred.agg(
        F.sum(F.col("_d") * F.col("_d")).alias("_d2")
    )
    pairs = grid_neighbor_pairs(flt, id_col, lat_col, lon_col, cell_deg)
    pa = centred.select(
        F.col("_vid").alias("a"), F.col("_d").alias("_da")
    )
    pb = centred.select(
        F.col("_vid").alias("b"), F.col("_d").alias("_db")
    )
    psums = (
        pairs.join(pa, "a")
        .join(pb, "b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("_da") * F.col("_db")).alias("_p"),
            F.sum(F.col("_da") + F.col("_db")).alias("_q"),
        )
    )
    j = (
        stats.crossJoin(F.broadcast(d2)).crossJoin(F.broadcast(psums))
    )
    nd = F.col("n").cast("double")
    delta = (
        F.col("_s") - F.col("n") * F.col("_m0")
    ).cast("double") / nd
    npd = F.coalesce(F.col("n_pairs"), F.lit(0)).cast("double")
    num = (
        F.coalesce(F.col("_p").cast("double"), F.lit(0.0))
        - delta * F.coalesce(F.col("_q").cast("double"), F.lit(0.0))
    ) + npd * (delta * delta)
    den = F.col("_d2").cast("double") - nd * (delta * delta)
    w = F.lit(2.0) * npd
    i_m = ((nd / w) * (F.lit(2.0) * num)) / den
    ok = (npd > 0.0) & (den > 0.0)
    return j.select(
        "n",
        F.coalesce(F.col("n_pairs"), F.lit(0)).alias("n_pairs"),
        w.alias("w"),
        F.when(ok, i_m).alias("i_moran"),
        F.when(
            F.col("n") > 1, F.lit(-1.0) / (nd - F.lit(1.0))
        ).alias("e_i"),
    )


def geary_c(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    value_col: str,
    cell_deg: float = 1.0,
    scale: int = 4,
) -> DataFrame:
    """One row ``(n, n_pairs, w, c_geary, e_c)`` — Geary's C (L369)
    under the binary 3×3-grid-neighbor weights: the LOCAL-difference
    companion to Moran's I (L253) — I correlates deviations from the
    global mean (one hot region far from the mean dominates), C sums
    squared neighbor DIFFERENCES, so it reacts to local roughness I
    smooths over.  Run both: I≈E[I] with C<1 means locally smooth
    but globally unremarkable; the reverse means global trend with
    local noise.

        C = ((n−1)/(2W)) · Σ_{i,j} w_ij(xᵢ−xⱼ)² / Σᵢ(xᵢ−x̄)²

    The numerator is shift-invariant, so it needs NO centring at
    all: Σ(xₐ−x_b)² accumulates as exact decimals straight off the
    pair list.  The denominator reuses L253's floored-mean trick
    (D₂ − n·δ², δ = (S − n·m₀)/n the only division).  W = 2·n_pairs;
    E[C] = 1.  Duplicate ids refused; constant values or no pairs →
    NULL c_geary.

    Scale shape: the L212 grid join + one values join + combinable
    aggs — no n² anything.

    No reference counterpart; spatial analytics per SURVEY §2.11.
    """
    dec = f"decimal(12,{scale})"
    flt = df.filter(
        F.col(id_col).isNotNull() & F.col(value_col).isNotNull()
    )
    if validation_enabled():
        n_dup = (
            flt.groupBy(F.col(id_col))
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") > 1)
            .count()
        )
        if n_dup:
            raise ValueError(
                f"geary_c: {n_dup} duplicate id(s) — weights would double"
            )
    vals = flt.select(
        F.col(id_col).alias("_vid"), F.col(value_col).cast(dec).alias("_x")
    )
    stats = vals.agg(
        F.count(F.lit(1)).alias("n"), F.sum("_x").alias("_s")
    )
    m0 = F.floor(F.col("_s") / F.col("n")).cast(dec)
    stats = stats.select("n", "_s", m0.alias("_m0"))
    centred = vals.crossJoin(F.broadcast(stats)).select(
        "_vid", (F.col("_x") - F.col("_m0")).alias("_d")
    )
    d2 = centred.agg(F.sum(F.col("_d") * F.col("_d")).alias("_d2"))
    pairs = grid_neighbor_pairs(flt, id_col, lat_col, lon_col, cell_deg)
    pa = centred.select(F.col("_vid").alias("a"), F.col("_d").alias("_da"))
    pb = centred.select(F.col("_vid").alias("b"), F.col("_d").alias("_db"))
    psums = (
        pairs.join(pa, "a")
        .join(pb, "b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(
                (F.col("_da") - F.col("_db"))
                * (F.col("_da") - F.col("_db"))
            ).alias("_sp"),
        )
    )
    j = stats.crossJoin(F.broadcast(d2)).crossJoin(F.broadcast(psums))
    nd = F.col("n").cast("double")
    delta = (
        F.col("_s") - F.col("n") * F.col("_m0")
    ).cast("double") / nd
    npd = F.coalesce(F.col("n_pairs"), F.lit(0)).cast("double")
    spd = F.coalesce(F.col("_sp").cast("double"), F.lit(0.0))
    den = F.col("_d2").cast("double") - nd * (delta * delta)
    w = F.lit(2.0) * npd
    c = (((nd - F.lit(1.0)) / (F.lit(2.0) * w)) * (F.lit(2.0) * spd)) / den
    ok = (npd > 0.0) & (den > 0.0)
    return j.select(
        "n",
        F.coalesce(F.col("n_pairs"), F.lit(0)).alias("n_pairs"),
        w.alias("w"),
        F.when(ok, c).alias("c_geary"),
        F.when(F.col("n") > 1, F.lit(1.0)).alias("e_c"),
    )


def getis_gi_star(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    value_col: str,
    cell_deg: float = 1.0,
    scale: int = 4,
) -> DataFrame:
    """``(cx, cy, x_cell, w_i, gi_star)`` — Getis-Ord Gi* hot-spot
    z-scores (L370) over grid cells: WHERE is the clustering the
    global statistics (L253 Moran / L369 Geary) only attest exists —
    each cell's 3×3-neighborhood (self included, hence the star) sum
    compared against what a random scatter of the cell values would
    give:

        Gi* = (Σ_j w_ij·xⱼ − x̄·Wᵢ)
              / (S·sqrt((n·Wᵢ − Wᵢ²)/(n−1)))

    with x the per-cell value sums, n the number of OCCUPIED cells,
    Wᵢ the count of occupied neighbor cells (empty cells are not
    invented), x̄ and S = sqrt(Σx²/n − x̄²) the global cell moments.
    |Gi*| ≳ 1.96 flags hot (positive) / cold (negative) spots.  Cell
    sums and the global moments are exact decimals; every z is one
    fixed IEEE tree.  Wᵢ = n (degenerate grid) or S = 0 → NULL.
    Longitude wraps at the antimeridian exactly as in L212 when
    cell_deg tiles 360.

    Scale shape: one groupBy to cells, a bounded ×9 explode on the
    CELL table (already tiny), one equi-join, one broadcast of the
    1-row moments — no window, no n² anything.

    No reference counterpart; spatial analytics per SURVEY §2.11.
    """
    if cell_deg <= 0:
        raise ValueError("getis_gi_star: cell_deg must be > 0")
    dec = f"decimal(12,{scale})"
    flt = df.filter(
        F.col(lat_col).isNotNull()
        & F.col(lon_col).isNotNull()
        & F.col(value_col).isNotNull()
    )
    if validation_enabled():
        n_bad = flt.filter(
            (F.col(lat_col) < -90)
            | (F.col(lat_col) > 90)
            | (F.col(lon_col) < -180)
            | (F.col(lon_col) > 180)
        ).count()
        if n_bad:
            raise ValueError(
                f"getis_gi_star: {n_bad} row(s) outside lat/lon bounds"
            )
    ring = 360.0 / cell_deg
    wraps = float(ring).is_integer()
    cy_raw = F.floor(F.col(lon_col) / cell_deg).cast("long")
    cy = F.pmod(cy_raw, F.lit(int(ring))) if wraps else cy_raw
    cells = flt.select(
        F.floor(F.col(lat_col) / cell_deg).cast("long").alias("cx"),
        cy.alias("cy"),
        F.col(value_col).cast(dec).alias("_x"),
    ).groupBy("cx", "cy").agg(F.sum("_x").alias("_xc"))
    # cell sums re-narrow to (18,scale) before squaring: a (22,s)
    # product would exceed precision 38 and Spark silently rounds the
    # scale down (the 8fe91f8 pitfall); the narrow cast is ANSI-loud.
    d18 = f"decimal(18,{scale})"
    stats = cells.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_xc").alias("_sx"),
        F.sum(
            F.col("_xc").cast(d18) * F.col("_xc").cast(d18)
        ).alias("_sxx"),
    )
    probes = (
        cells.withColumn(
            "_dx", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)]))
        )
        .withColumn(
            "_dy", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)]))
        )
        .select(
            F.col("cx").alias("_hx"),
            F.col("cy").alias("_hy"),
            (F.col("cx") + F.col("_dx")).alias("_jx"),
            (
                F.pmod(F.col("cy") + F.col("_dy"), F.lit(int(ring)))
                if wraps
                else (F.col("cy") + F.col("_dy"))
            ).alias("_jy"),
        )
    )
    nbr = probes.join(
        cells.select(
            F.col("cx").alias("_jx"),
            F.col("cy").alias("_jy"),
            F.col("_xc").alias("_xn"),
        ),
        ["_jx", "_jy"],
    ).groupBy("_hx", "_hy").agg(
        F.count(F.lit(1)).alias("w_i"),
        F.sum("_xn").alias("_nsum"),
    )
    out = (
        cells.join(
            nbr,
            (F.col("cx") == F.col("_hx")) & (F.col("cy") == F.col("_hy")),
        )
        .crossJoin(F.broadcast(stats))
    )
    nd = F.col("_n").cast("double")
    xbar = F.col("_sx").cast("double") / nd
    s = F.sqrt(F.col("_sxx").cast("double") / nd - xbar * xbar)
    wid = F.col("w_i").cast("double")
    gi = (F.col("_nsum").cast("double") - xbar * wid) / (
        s * F.sqrt((nd * wid - wid * wid) / (nd - F.lit(1.0)))
    )
    ok = (
        (F.col("_n") >= 2)
        & ~F.isnan(s)
        & (s > 0.0)
        & (F.col("w_i") < F.col("_n"))
    )
    return out.select(
        "cx",
        "cy",
        F.col("_xc").alias("x_cell"),
        "w_i",
        F.when(ok, gi).alias("gi_star"),
    )


def point_in_polygon(
    points: DataFrame,
    polygons: list[dict],
    x_col: str,
    y_col: str,
    scale: int = 6,
) -> DataFrame:
    """Point-in-polygon tagging (L435): input columns preserved plus
    ``(polygon, on_boundary)`` — geofencing/region assignment (which
    sales region, which service area, which census zone), the
    membership primitive the grid family (L212/L213) deliberately
    skips.

    ``polygons`` is a bounded BROADCAST list of ``{"name": str,
    "vertices": [(x, y), ...]}`` dicts (simple polygons, ≥ 3
    vertices, ≤ 64 each, ≤ 64 polygons — region tables are small by
    nature; vertices are pinned as decimal literals at ``scale``).
    The even-odd ray-casting test is evaluated WITHOUT divisions:
    for the horizontal ray from (px, py), edge (a, b) crosses iff
    (ay > py) ≠ (by > py) and the exact-decimal cross product
    (bx−ax)·(py−ay) − (by−ay)·(px−ax) has the correct sign relative
    to the edge's direction — EXACT integer-scaled arithmetic, so
    membership cannot knife-edge on an IEEE intersection-x.  Points
    exactly ON an edge or vertex set ``on_boundary`` true and count
    as INSIDE (pinned convention).  First matching polygon in list
    order wins (pinned — callers order by precedence); no match →
    NULL polygon.  NULL coordinates refused.

    Scale shape: per-row bounded fold over the broadcast vertex
    lists — zero shuffle, embarrassingly parallel at 100 TB.

    No reference counterpart; spatial analytics per SURVEY §2.11."""
    from decimal import Decimal

    if not polygons or len(polygons) > 64:
        raise ValueError(
            "point_in_polygon: need 1..64 polygons"
        )
    for pg in polygons:
        if len(pg["vertices"]) < 3 or len(pg["vertices"]) > 64:
            raise ValueError(
                f"point_in_polygon: polygon {pg['name']!r} needs "
                "3..64 vertices"
            )
    if validation_enabled():
        n_null = points.filter(
            F.col(x_col).isNull() | F.col(y_col).isNull()
        ).count()
        if n_null:
            raise ValueError(
                f"point_in_polygon: {n_null} NULL coordinate row(s)"
            )
    dec = f"decimal(18,{scale})"
    px = F.col(x_col).cast(dec)
    py = F.col(y_col).cast(dec)
    q = Decimal(1).scaleb(-scale)

    def lit(v):
        return F.lit(str(Decimal(str(v)).quantize(q))).cast(dec)

    def poly_exprs(pg):
        vs = pg["vertices"]
        inside = F.lit(False)
        on_edge = F.lit(False)
        for i in range(len(vs)):
            ax, ay = vs[i]
            bx, by = vs[(i + 1) % len(vs)]
            axl, ayl, bxl, byl = lit(ax), lit(ay), lit(bx), lit(by)
            cross = (bxl - axl) * (py - ayl) - (byl - ayl) * (
                px - axl
            )
            within_y = ((ayl > py) & (byl <= py)) | (
                (byl > py) & (ayl <= py)
            )
            crosses = within_y & F.when(
                byl > ayl, cross > 0
            ).otherwise(cross < 0)
            inside = inside != crosses
            colinear = cross == 0
            in_box = (
                (px >= F.least(axl, bxl))
                & (px <= F.greatest(axl, bxl))
                & (py >= F.least(ayl, byl))
                & (py <= F.greatest(ayl, byl))
            )
            on_edge = on_edge | (colinear & in_box)
        return inside | on_edge, on_edge

    name_expr = F.lit(None).cast("string")
    bound_expr = F.lit(None).cast("boolean")
    for pg in reversed(polygons):
        member, edge = poly_exprs(pg)
        name_expr = F.when(member, F.lit(pg["name"])).otherwise(
            name_expr
        )
        bound_expr = F.when(member, edge).otherwise(bound_expr)
    return points.select(
        "*", name_expr.alias("polygon"), bound_expr.alias("on_boundary")
    )


def polygon_metrics(
    df: DataFrame,
    by: list[str],
    order_col: str,
    x_col: str,
    y_col: str,
    scale: int = 6,
    max_vertices: int = 10_000,
) -> DataFrame:
    """Polygon metrics via the shoelace formula (L436): ``(by..., n,
    area2, area, cx, cy, perimeter)`` — exact-decimal area and
    centroid of per-key vertex rings (service-area sizing, zone
    comparison; the measurement companion to L435's membership):

        2A = Σ (xᵢ·yᵢ₊₁ − xᵢ₊₁·yᵢ)       (signed; ring closes
                                            last→first)
        C = (1/(6A))·Σ (vᵢ + vᵢ₊₁)·(xᵢ·yᵢ₊₁ − xᵢ₊₁·yᵢ)

    The doubled signed area ``area2`` is an EXACT decimal sum (the
    order-free headline number — its sign is the ring orientation);
    ``area`` = |area2|/2 and the centroid are fixed trees with ONE
    division each; the perimeter's per-edge square roots fold over
    the bounded sorted ring (max_vertices REFUSED — the L180
    contract).  Rings need ≥ 3 vertices (fewer → NULL everything but
    n); zero area (degenerate ring) → NULL centroid.  Duplicate
    order keys refused (ring order would be nondeterministic).

    No reference counterpart; spatial analytics per SURVEY §2.11."""
    dec = f"decimal(18,{scale})"
    if validation_enabled():
        n_null = df.filter(
            F.col(x_col).isNull()
            | F.col(y_col).isNull()
            | F.col(order_col).isNull()
        ).count()
        if n_null:
            raise ValueError(f"polygon_metrics: {n_null} NULL row(s)")
    if validation_enabled():
        dups = (
            df.groupBy(*by, order_col)
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        if dups:
            raise ValueError(
                f"polygon_metrics: {dups} duplicate ring order key(s)"
            )
    base = df.select(
        *by,
        F.col(order_col).cast("double").alias("_o"),
        F.col(x_col).cast(dec).alias("_x"),
        F.col(y_col).cast(dec).alias("_y"),
    )
    sizes = base.groupBy(*by).count()
    if validation_enabled():
        over = sizes.filter(F.col("count") > max_vertices).count()
        if over:
            raise ValueError(
                f"polygon_metrics: a ring exceeds max_vertices="
                f"{max_vertices}"
            )
    packed = base.groupBy(*by).agg(
        F.sort_array(
            F.collect_list(F.struct("_o", "_x", "_y"))
        ).alias("_a"),
        F.count(F.lit(1)).alias("n"),
    )
    n = F.size("_a")
    vx = lambda i: F.element_at(F.col("_a"), i)["_x"]  # noqa: E731
    vy = lambda i: F.element_at(F.col("_a"), i)["_y"]  # noqa: E731
    nxt = lambda i: F.when(i == n, F.lit(1)).otherwise(i + 1)  # noqa: E731
    zero = F.lit(0).cast("decimal(38,12)")
    wd = "decimal(38,12)"
    area2 = F.aggregate(
        F.sequence(F.lit(1), n),
        zero,
        lambda acc, i: (
            acc + (vx(i) * vy(nxt(i)) - vx(nxt(i)) * vy(i)).cast(wd)
        ).cast(wd),
    )
    cx_num = F.aggregate(
        F.sequence(F.lit(1), n),
        zero,
        lambda acc, i: (
            acc
            + (
                (vx(i) + vx(nxt(i)))
                * (vx(i) * vy(nxt(i)) - vx(nxt(i)) * vy(i))
            ).cast(wd)
        ).cast(wd),
    )
    cy_num = F.aggregate(
        F.sequence(F.lit(1), n),
        zero,
        lambda acc, i: (
            acc
            + (
                (vy(i) + vy(nxt(i)))
                * (vx(i) * vy(nxt(i)) - vx(nxt(i)) * vy(i))
            ).cast(wd)
        ).cast(wd),
    )
    per = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0.0),
        lambda acc, i: acc
        + F.sqrt(
            (
                (vx(nxt(i)) - vx(i)) * (vx(nxt(i)) - vx(i))
                + (vy(nxt(i)) - vy(i)) * (vy(nxt(i)) - vy(i))
            ).cast("double")
        ),
    )
    a2d = area2.cast("double")
    ok = F.col("n") >= 3
    nonzero = ok & (area2 != zero)
    return packed.select(
        *by,
        "n",
        F.when(ok, a2d).alias("area2"),
        F.when(ok, F.abs(a2d) / F.lit(2.0)).alias("area"),
        F.when(
            nonzero, cx_num.cast("double") / (F.lit(3.0) * a2d)
        ).alias("cx"),
        F.when(
            nonzero, cy_num.cast("double") / (F.lit(3.0) * a2d)
        ).alias("cy"),
        F.when(ok, per).alias("perimeter"),
    )
