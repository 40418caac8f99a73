"""Hotspot detection: Getis-Ord Gi* over the occupied-cell grid.

The classic GIS hotspot statistic (Getis & Ord 1992, "The Analysis of
Spatial Association by Use of Distance Statistics"; the ArcGIS "Hot Spot
Analysis" tool) re-expressed for Spark: points bucket to z-tiles, each
OCCUPIED cell gets a Gi* z-score of its 8-neighborhood count sum against
the global count distribution, with binary weights over occupied cells
(the pragmatic large-data contract — a dense-universe variant would
enumerate every empty cell of the study area).

Scale shape (the same three-piece pattern as grid_dbscan):

* one shuffle of points on cell for the counts;
* the 9-offset neighborhood is an EQUI-join on (x, y) — the probe side
  explodes its nine (dx, dy) offsets (antimeridian x-wrap), never a
  theta join;
* the global (n, sum, sumsq) moments are ONE tiny row broadcast back —
  integer-exact, so the float z-score expression evaluates in one
  deterministic order on every engine (the DuckDB oracle runs the
  byte-identical formula; the emitted score is quantized to micro-z).

Gi* (binary weights, self included):

    mean = sum / n            sd = sqrt(sumsq/n - mean^2)
    gi   = (s_i - mean * w_i) / (sd * sqrt((n*w_i - w_i^2) / (n-1)))

where w_i = occupied neighbors of cell i (incl. itself) and s_i = their
count sum.  Cells where the denominator degenerates (n < 2, sd == 0, or
w_i == n) are excluded — the statistic is undefined there, identically
in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fagi_gis_spark.index import tiles


#: two-tailed normal critical values in micro-z — the ArcGIS hotspot
#: confidence bins (90/95/99%), compared against gi_micro as integers so
#: the classification is engine-exact by construction
GI_Z90_MICRO = 1_644_854  # z_{0.95}  = 1.6448536...
GI_Z95_MICRO = 1_959_964  # z_{0.975} = 1.9599640...
GI_Z99_MICRO = 2_575_829  # z_{0.995} = 2.5758293...


def _cell_neighborhood(
    cells: DataFrame,
    z: int,
    include_self: bool,
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """(cell, [keys...,] cnt, w, s): occupied-neighbor count and count
    sum per cell over the 8-neighborhood (antimeridian x-wrap), as one
    exploded-offset EQUI-join on (x, y[, keys]) — the shared adjacency
    stage of Gi* (self included), LISA (self excluded) and the per-period
    emerging-hotspot slices.  ``cells`` must carry (x, y, cell, cnt) plus
    ``keys``.  Raises for z < MIN_NEIGHBOR_RES, where the x-wrap folds
    dx=-1 and dx=+1 onto the same column and would double-count."""
    if z < tiles.MIN_NEIGHBOR_RES:
        raise ValueError(
            f"neighborhood joins need z >= {tiles.MIN_NEIGHBOR_RES} "
            "(x-wrap aliases the 8-neighborhood below that)"
        )
    n_tiles = 2**z
    probe = cells.select(
        "cell",
        "cnt",
        *keys,
        tiles.neighbor_offsets_col().alias("o"),
        F.col("x").alias("cx"),
        F.col("y").alias("cy"),
    )
    if not include_self:
        probe = probe.filter(~((F.col("o.dx") == 0) & (F.col("o.dy") == 0)))
    probe = probe.select(
        "cell",
        "cnt",
        *keys,
        F.pmod(F.col("cx") + F.col("o.dx"), F.lit(n_tiles)).alias("nx"),
        (F.col("cy") + F.col("o.dy")).alias("ny"),
    )
    nbr = cells.select(
        F.col("x").alias("nx"),
        F.col("y").alias("ny"),
        *keys,
        F.col("cnt").alias("ncnt"),
    )
    return (
        probe.join(nbr, ["nx", "ny", *keys])
        .groupBy("cell", *keys, "cnt")
        .agg(F.count("*").alias("w"), F.sum("ncnt").alias("s"))
    )


def hotspot_gi(
    points: DataFrame,
    z: int = 9,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """(cell, cnt, w, s, gi_micro): Gi* per occupied z-cell, the z-score
    quantized to integer micro-units (round(gi * 1e6)) so Spark and the
    DuckDB oracle compare exactly."""
    g = points.select(
        tiles.tile_x_col(F.col(lon_col), z).alias("x"),
        tiles.tile_y_col(F.col(lat_col), z).alias("y"),
        tiles.cell_id_col(F.col(lon_col), F.col(lat_col), z).alias("cell"),
    )
    cells = g.groupBy("x", "y", "cell").agg(F.count("*").alias("cnt"))
    # global moments: one tiny integer row, broadcast onto every cell
    stats = cells.agg(
        F.count("*").alias("n"),
        F.sum("cnt").alias("sum_c"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sumsq_c"),
    )
    hood = _cell_neighborhood(cells, z, include_self=True)
    n = F.col("n").cast("double")
    w = F.col("w").cast("double")
    s = F.col("s").cast("double")
    mean = F.col("sum_c").cast("double") / n
    sd = F.sqrt(F.col("sumsq_c").cast("double") / n - mean * mean)
    gi = (s - mean * w) / (sd * F.sqrt((n * w - w * w) / (n - F.lit(1.0))))
    out = (
        hood.join(F.broadcast(stats))
        .filter(
            (F.col("n") >= 2)
            & (F.col("w") < F.col("n"))
            & (F.col("sumsq_c").cast("double") / n - mean * mean > 0)
        )
        .select(
            "cell",
            "cnt",
            "w",
            "s",
            F.round(gi * F.lit(1e6)).cast("long").alias("gi_micro"),
        )
    )
    g = F.col("gi_micro")
    cls = (
        F.when(g >= GI_Z99_MICRO, "hot99")
        .when(g >= GI_Z95_MICRO, "hot95")
        .when(g >= GI_Z90_MICRO, "hot90")
        .when(g <= -GI_Z99_MICRO, "cold99")
        .when(g <= -GI_Z95_MICRO, "cold95")
        .when(g <= -GI_Z90_MICRO, "cold90")
        .otherwise("ns")
    )
    return out.withColumn("gi_class", cls)


def local_morans_i(
    points: DataFrame,
    z: int = 9,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Local Moran's I (Anselin 1995, "Local Indicators of Spatial
    Association — LISA") per occupied z-cell with binary 8-neighborhood
    weights, self EXCLUDED (the statistic's standard contract, unlike
    Gi*'s self-included star):

        I_i = ((c_i - mean) / m2) * sum_j w_ij (c_j - mean)
        m2  = sum_k (c_k - mean)^2 / n

    plus the quadrant label the Moran scatterplot assigns: HH (hot
    surrounded by hot), LL, HL (high outlier), LH (low outlier) by the
    signs of (c_i - mean) and the neighbor mean deviation; cells with
    no occupied neighbor are excluded (lag undefined).

    Same scale shape as :func:`hotspot_gi` (one counts shuffle, one
    9-offset equi-join, one broadcast moments row); emitted quantized to
    micro-I.  Output: (cell, cnt, w, s, i_micro, quadrant)."""
    g = points.select(
        tiles.tile_x_col(F.col(lon_col), z).alias("x"),
        tiles.tile_y_col(F.col(lat_col), z).alias("y"),
        tiles.cell_id_col(F.col(lon_col), F.col(lat_col), z).alias("cell"),
    )
    cells = g.groupBy("x", "y", "cell").agg(F.count("*").alias("cnt"))
    stats = cells.agg(
        F.count("*").alias("n"),
        F.sum("cnt").alias("sum_c"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sumsq_c"),
    )
    hood = _cell_neighborhood(cells, z, include_self=False)
    n = F.col("n").cast("double")
    w = F.col("w").cast("double")
    s = F.col("s").cast("double")
    c = F.col("cnt").cast("double")
    mean = F.col("sum_c").cast("double") / n
    # m2 from integer moments: sumsq/n - mean^2 (one deterministic order)
    m2 = F.col("sumsq_c").cast("double") / n - mean * mean
    dev = c - mean
    lag_dev = s - mean * w
    i_val = dev / m2 * lag_dev
    quadrant = (
        F.when((dev >= 0) & (lag_dev >= 0), "HH")
        .when((dev < 0) & (lag_dev < 0), "LL")
        .when((dev >= 0) & (lag_dev < 0), "HL")
        .otherwise("LH")
    )
    return (
        hood.join(F.broadcast(stats))
        .filter((F.col("n") >= 2) & (m2 > 0))
        .select(
            "cell",
            "cnt",
            "w",
            "s",
            F.round(i_val * F.lit(1e6)).cast("long").alias("i_micro"),
            quadrant.alias("quadrant"),
        )
    )


def local_morans_i_sql(source_sql: str, z: int = 9) -> str:
    """DuckDB twin of :func:`local_morans_i` (same evaluation order)."""
    n_tiles = 2**z
    mean = "(CAST(sum_c AS DOUBLE) / CAST(n AS DOUBLE))"
    m2 = f"(CAST(sumsq_c AS DOUBLE) / CAST(n AS DOUBLE) - {mean} * {mean})"
    dev = f"(CAST(cnt AS DOUBLE) - {mean})"
    lag_dev = f"(CAST(s AS DOUBLE) - {mean} * CAST(w AS DOUBLE))"
    return (
        "WITH g AS (\n"
        f"  SELECT {tiles.tile_x_sql('lon', z)} AS x,\n"
        f"    {tiles.tile_y_sql('lat', z)} AS y,\n"
        f"    {tiles.cell_id_sql('lon', 'lat', z)} AS cell\n"
        f"  FROM ({source_sql}) src\n"
        "),\n"
        "cells AS (SELECT x, y, cell, count(*) AS cnt FROM g GROUP BY 1, 2, 3),\n"
        "stats AS (SELECT count(*) AS n, sum(cnt) AS sum_c,\n"
        "  sum(cnt * cnt) AS sumsq_c FROM cells),\n"
        "hood AS (\n"
        "  SELECT a.cell, a.cnt, count(*) AS w, sum(b.cnt) AS s\n"
        "  FROM cells a JOIN cells b\n"
        f"    ON b.x IN (a.x, (a.x + 1) % {n_tiles}, (a.x + {n_tiles - 1}) % {n_tiles})\n"
        "   AND b.y BETWEEN a.y - 1 AND a.y + 1\n"
        "   AND a.cell <> b.cell\n"
        "  GROUP BY a.cell, a.cnt\n"
        ")\n"
        "SELECT cell, cnt, w, s,\n"
        f"  CAST(round({dev} / {m2} * {lag_dev} * 1e6) AS BIGINT) AS i_micro,\n"
        f"  CASE WHEN {dev} >= 0 AND {lag_dev} >= 0 THEN 'HH'\n"
        f"       WHEN {dev} < 0 AND {lag_dev} < 0 THEN 'LL'\n"
        f"       WHEN {dev} >= 0 AND {lag_dev} < 0 THEN 'HL'\n"
        "       ELSE 'LH' END AS quadrant\n"
        f"FROM hood, stats WHERE n >= 2 AND {m2} > 0"
    )


def cell_trend(
    points: DataFrame,
    z: int = 9,
    bucket_s: int = 86400,
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Per-cell temporal trend via the Mann-Kendall S statistic — the
    core of ArcGIS-style "emerging hot spot analysis" (Mann 1945,
    Kendall 1975; the space-time-cube trend test): for each z-cell,
    bucket points into ``bucket_s`` periods, then

        S = sum over period pairs (i < j) of sign(c_j - c_i)

    S > 0 = intensifying cell, S < 0 = cooling, 0 = flat.  INTEGER-exact
    end to end (counts and signs only — no float anywhere), so the
    DuckDB oracle matches bit-for-bit by construction.

    Scale shape: points shuffle once on (cell, period); the pairwise
    stage joins the counts table to itself on cell with period < period
    — per-cell work is bounded by the CALENDAR (periods per horizon),
    not by data volume, so the quadratic term is a constant (~465 pairs
    for a 31-day month) however many points land in the cell.

    Output: (cell, n_periods, total, mk_s, trend)."""
    d = points.select(
        tiles.cell_id_col(F.col(lon_col), F.col(lat_col), z).alias("cell"),
        F.floor(F.unix_timestamp(ts_col) / F.lit(bucket_s)).cast("long").alias("prd"),
    )
    counts = d.groupBy("cell", "prd").agg(F.count("*").alias("c"))
    a = counts.select(
        "cell", F.col("prd").alias("pa"), F.col("c").alias("ca")
    )
    b = counts.select(
        "cell", F.col("prd").alias("pb"), F.col("c").alias("cb")
    )
    s = (
        a.join(b, "cell")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("cell")
        .agg(
            F.sum(
                F.when(F.col("cb") > F.col("ca"), 1)
                .when(F.col("cb") < F.col("ca"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("mk_s")
        )
    )
    per_cell = counts.groupBy("cell").agg(
        F.count("*").alias("n_periods"), F.sum("c").alias("total")
    )
    mk = F.coalesce(F.col("mk_s"), F.lit(0)).cast("long")
    return (
        per_cell.join(s, "cell", "left")
        .select(
            "cell",
            "n_periods",
            "total",
            mk.alias("mk_s"),
            F.when(mk > 0, F.lit("up"))
            .when(mk < 0, F.lit("down"))
            .otherwise(F.lit("flat"))
            .alias("trend"),
        )
    )


def cell_trend_sql(source_sql: str, z: int = 9, bucket_s: int = 86400) -> str:
    """DuckDB twin of :func:`cell_trend`; ``source_sql`` must yield
    (ts, lon, lat) rows."""
    return (
        "WITH d AS (\n"
        f"  SELECT {tiles.cell_id_sql('lon', 'lat', z)} AS cell,\n"
        f"    CAST(floor(epoch(ts) / {bucket_s}) AS BIGINT) AS prd\n"
        f"  FROM ({source_sql}) src\n"
        "),\n"
        "counts AS (SELECT cell, prd, count(*) AS c FROM d GROUP BY 1, 2),\n"
        "s AS (\n"
        "  SELECT a.cell, CAST(sum(sign(b.c - a.c)) AS BIGINT) AS mk_s\n"
        "  FROM counts a JOIN counts b ON a.cell = b.cell AND a.prd < b.prd\n"
        "  GROUP BY a.cell\n"
        ")\n"
        "SELECT p.cell, p.n_periods, p.total,\n"
        "  CAST(coalesce(s.mk_s, 0) AS BIGINT) AS mk_s,\n"
        "  CASE WHEN coalesce(s.mk_s, 0) > 0 THEN 'up'\n"
        "       WHEN coalesce(s.mk_s, 0) < 0 THEN 'down'\n"
        "       ELSE 'flat' END AS trend\n"
        "FROM (SELECT cell, count(*) AS n_periods, CAST(sum(c) AS BIGINT) AS total\n"
        "      FROM counts GROUP BY cell) p\n"
        "LEFT JOIN s ON p.cell = s.cell"
    )


def ripleys_k(
    points: DataFrame,
    radii_m: tuple[float, ...] = (50.0, 100.0, 150.0),
    area_m2: float = 1.0,
    point_cols: tuple[str, str, str] = ("subject", "lon", "lat"),
) -> DataFrame:
    """Ripley's K point-pattern statistic (Ripley 1976; the standard
    clustering-vs-CSR diagnostic): K̂(r) = A * 2 * P(r) / (n * (n - 1))
    with P(r) = unordered point pairs within distance r, border-
    uncorrected, in the repo's planar-degree metric (deg x 111195 — the
    reference's D5 convention, so "area" is in that same planar m²).

    ONE salted cell self-join at max(radii) produces every candidate
    pair; each smaller radius is a conditional count over the same pair
    set (no re-join per radius).  Under CSR, K̂(r) ~ pi r²; excess =
    clustering at that scale.

    Output: (radius_m, n_pairs, k_micro) — one row per requested radius,
    k quantized to micro-m² via round(k * 1e6)."""
    from fagi_gis_spark.operators.spatial_join import radius_join

    pk = point_cols[0]
    r_max = max(radii_m)
    pairs = radius_join(
        points, points, r_max, left_cols=point_cols, right_cols=point_cols
    ).filter(F.col("l_key") < F.col("r_key"))
    counts = pairs.agg(
        *[
            F.sum((F.col("dist_m") <= F.lit(r)).cast("long")).alias(f"p{i}")
            for i, r in enumerate(radii_m)
        ]
    )
    # n < 2 leaves K undefined (0/0): emit nothing, identically to the
    # SQL twin's WHERE n >= 2
    n_row = points.select(F.count(F.col(pk)).alias("n")).filter(F.col("n") >= 2)
    both = counts.join(F.broadcast(n_row))
    per_radius = [
        both.select(
            F.lit(r).alias("radius_m"),
            F.coalesce(F.col(f"p{i}"), F.lit(0)).cast("long").alias("n_pairs"),
            F.round(
                F.lit(area_m2)
                * F.lit(2.0)
                * F.coalesce(F.col(f"p{i}"), F.lit(0)).cast("double")
                / (F.col("n").cast("double") * (F.col("n").cast("double") - F.lit(1.0)))
                * F.lit(1e6)
            )
            .cast("long")
            .alias("k_micro"),
        )
        for i, r in enumerate(radii_m)
    ]
    out = per_radius[0]
    for df in per_radius[1:]:
        out = out.unionByName(df)
    return out


def ripleys_k_sql(
    source_sql: str,
    radii_m: tuple[float, ...] = (50.0, 100.0, 150.0),
    area_m2: float = 1.0,
    embed: bool = False,
) -> str:
    """DuckDB twin of :func:`ripleys_k`; ``source_sql`` must yield
    (subject, lon, lat) rows.  Closed-form theta join (the Spark side's
    cell join is an equi-join re-expression of the same predicate).
    ``embed=True`` emits ", cte, ... SELECT" (no WITH keyword) so the
    text can append to an existing WITH clause."""
    dist = (
        "sqrt((a.lon - b.lon) * (a.lon - b.lon)"
        " + (a.lat - b.lat) * (a.lat - b.lat)) * 111195.0"
    )
    r_max = max(radii_m)
    selects = []
    for i, r in enumerate(radii_m):
        selects.append(
            f"SELECT CAST({r!r} AS DOUBLE) AS radius_m,\n"
            f"  CAST(coalesce(p{i}, 0) AS BIGINT) AS n_pairs,\n"
            f"  CAST(round({area_m2!r} * 2.0 * CAST(coalesce(p{i}, 0) AS DOUBLE)\n"
            "    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) * 1e6) AS BIGINT)"
            " AS k_micro\n"
            "FROM counts, nn WHERE n >= 2"
        )
    count_cols = ",\n    ".join(
        f"sum(CASE WHEN {dist} <= {r!r} THEN 1 ELSE 0 END) AS p{i}"
        for i, r in enumerate(radii_m)
    )
    body = (
        f"pts AS ({source_sql}),\n"
        "counts AS (\n"
        f"  SELECT {count_cols}\n"
        "  FROM pts a JOIN pts b ON a.subject < b.subject\n"
        f"    AND {dist} <= {r_max!r}\n"
        "),\n"
        "nn AS (SELECT count(subject) AS n FROM pts)\n"
        + "\nUNION ALL\n".join(selects)
    )
    return (", " if embed else "WITH ") + body


def emerging_hotspots(
    points: DataFrame,
    z: int = 9,
    bucket_s: int = 86400,
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Emerging Hot Spot Analysis — the ArcGIS space-time-cube tool
    proper: a Gi* z-score per (cell, period) slice (each period scored
    against ITS OWN day's occupied-cell moments), then the Mann-Kendall
    trend over each cell's Gi* time series.  A cell that is hot and
    getting hotter reads (sum_gi_micro > 0, trend = 'up') — the
    "intensifying hot spot" class; cooling hot spots, emerging cold
    spots etc. fall out of the same two columns.

    Composition of :func:`hotspot_gi` (per-slice) and :func:`cell_trend`
    (integer-exact MK over the QUANTIZED micro-z series, so the trend
    sign is engine-exact even though Gi* itself is a float statistic).
    Scale shape: counts shuffle once on (cell, period); the neighbor
    join adds period to the (x, y) equi-key; per-period moments are a
    ~periods-row broadcast; the MK stage is the calendar-bounded
    pairwise join.

    Output: (cell, n_periods, sum_gi_micro, mk_s, trend)."""
    d = points.select(
        tiles.tile_x_col(F.col(lon_col), z).alias("x"),
        tiles.tile_y_col(F.col(lat_col), z).alias("y"),
        tiles.cell_id_col(F.col(lon_col), F.col(lat_col), z).alias("cell"),
        F.floor(F.unix_timestamp(ts_col) / F.lit(bucket_s)).cast("long").alias("prd"),
    )
    counts = d.groupBy("x", "y", "cell", "prd").agg(F.count("*").alias("cnt"))
    stats = counts.groupBy("prd").agg(
        F.count("*").alias("n"),
        F.sum("cnt").alias("sum_c"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sumsq_c"),
    )
    hood = _cell_neighborhood(counts, z, include_self=True, keys=("prd",))
    n = F.col("n").cast("double")
    w = F.col("w").cast("double")
    s = F.col("s").cast("double")
    mean = F.col("sum_c").cast("double") / n
    sd = F.sqrt(F.col("sumsq_c").cast("double") / n - mean * mean)
    gi = (s - mean * w) / (sd * F.sqrt((n * w - w * w) / (n - F.lit(1.0))))
    slices = (
        hood.join(F.broadcast(stats), "prd")
        .filter(
            (F.col("n") >= 2)
            & (F.col("w") < F.col("n"))
            & (F.col("sumsq_c").cast("double") / n - mean * mean > 0)
        )
        .select(
            "cell",
            "prd",
            F.round(gi * F.lit(1e6)).cast("long").alias("gi_micro"),
        )
    )
    a = slices.select("cell", F.col("prd").alias("pa"), F.col("gi_micro").alias("ga"))
    b = slices.select("cell", F.col("prd").alias("pb"), F.col("gi_micro").alias("gb"))
    mk = (
        a.join(b, "cell")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("cell")
        .agg(
            F.sum(
                F.when(F.col("gb") > F.col("ga"), 1)
                .when(F.col("gb") < F.col("ga"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("mk_s")
        )
    )
    per_cell = slices.groupBy("cell").agg(
        F.count("*").alias("n_periods"),
        F.sum("gi_micro").cast("long").alias("sum_gi_micro"),
    )
    mks = F.coalesce(F.col("mk_s"), F.lit(0)).cast("long")
    return (
        per_cell.join(mk, "cell", "left")
        .select(
            "cell",
            "n_periods",
            "sum_gi_micro",
            mks.alias("mk_s"),
            F.when(mks > 0, F.lit("up"))
            .when(mks < 0, F.lit("down"))
            .otherwise(F.lit("flat"))
            .alias("trend"),
        )
    )


def emerging_hotspots_sql(source_sql: str, z: int = 9, bucket_s: int = 86400) -> str:
    """DuckDB twin of :func:`emerging_hotspots`; ``source_sql`` must
    yield (ts, lon, lat) rows.  Same evaluation order as the Column
    version for the float Gi* slice, integer-exact MK on top."""
    n_tiles = 2**z
    mean = "(CAST(sum_c AS DOUBLE) / CAST(n AS DOUBLE))"
    var = f"(CAST(sumsq_c AS DOUBLE) / CAST(n AS DOUBLE) - {mean} * {mean})"
    gi = (
        f"(CAST(s AS DOUBLE) - {mean} * CAST(w AS DOUBLE))"
        f" / (sqrt({var})"
        " * sqrt((CAST(n AS DOUBLE) * CAST(w AS DOUBLE)"
        " - CAST(w AS DOUBLE) * CAST(w AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)))"
    )
    return (
        "WITH d AS (\n"
        f"  SELECT {tiles.tile_x_sql('lon', z)} AS x,\n"
        f"    {tiles.tile_y_sql('lat', z)} AS y,\n"
        f"    {tiles.cell_id_sql('lon', 'lat', z)} AS cell,\n"
        f"    CAST(floor(epoch(ts) / {bucket_s}) AS BIGINT) AS prd\n"
        f"  FROM ({source_sql}) src\n"
        "),\n"
        "counts AS (SELECT x, y, cell, prd, count(*) AS cnt FROM d GROUP BY 1,2,3,4),\n"
        "stats AS (SELECT prd, count(*) AS n, sum(cnt) AS sum_c,\n"
        "  sum(cnt * cnt) AS sumsq_c FROM counts GROUP BY prd),\n"
        "hood AS (\n"
        "  SELECT a.cell, a.prd, a.cnt, count(*) AS w, sum(b.cnt) AS s\n"
        "  FROM counts a JOIN counts b\n"
        "    ON a.prd = b.prd\n"
        f"   AND b.x IN (a.x, (a.x + 1) % {n_tiles}, (a.x + {n_tiles - 1}) % {n_tiles})\n"
        "   AND b.y BETWEEN a.y - 1 AND a.y + 1\n"
        "  GROUP BY a.cell, a.prd, a.cnt\n"
        "),\n"
        "slices AS (\n"
        f"  SELECT h.cell, h.prd, CAST(round({gi} * 1e6) AS BIGINT) AS gi_micro\n"
        "  FROM hood h JOIN stats USING (prd)\n"
        f"  WHERE n >= 2 AND w < n AND {var} > 0\n"
        "),\n"
        "mk AS (\n"
        "  SELECT a.cell, CAST(sum(CASE WHEN b.gi_micro > a.gi_micro THEN 1\n"
        "    WHEN b.gi_micro < a.gi_micro THEN -1 ELSE 0 END) AS BIGINT) AS mk_s\n"
        "  FROM slices a JOIN slices b ON a.cell = b.cell AND a.prd < b.prd\n"
        "  GROUP BY a.cell\n"
        ")\n"
        "SELECT p.cell, p.n_periods, p.sum_gi_micro,\n"
        "  CAST(coalesce(mk.mk_s, 0) AS BIGINT) AS mk_s,\n"
        "  CASE WHEN coalesce(mk.mk_s, 0) > 0 THEN 'up'\n"
        "       WHEN coalesce(mk.mk_s, 0) < 0 THEN 'down'\n"
        "       ELSE 'flat' END AS trend\n"
        "FROM (SELECT cell, count(*) AS n_periods,\n"
        "  CAST(sum(gi_micro) AS BIGINT) AS sum_gi_micro FROM slices GROUP BY cell) p\n"
        "LEFT JOIN mk ON p.cell = mk.cell"
    )


def hotspot_gi_sql(source_sql: str, z: int = 9) -> str:
    """DuckDB twin: ``source_sql`` must yield (lon, lat) rows.  The float
    z-score expression is written in the SAME evaluation order as the
    Column version above."""
    n_tiles = 2**z
    return (
        "WITH g AS (\n"
        f"  SELECT {tiles.tile_x_sql('lon', z)} AS x,\n"
        f"    {tiles.tile_y_sql('lat', z)} AS y,\n"
        f"    {tiles.cell_id_sql('lon', 'lat', z)} AS cell\n"
        f"  FROM ({source_sql}) src\n"
        "),\n"
        "cells AS (SELECT x, y, cell, count(*) AS cnt FROM g GROUP BY 1, 2, 3),\n"
        "stats AS (SELECT count(*) AS n, sum(cnt) AS sum_c,\n"
        "  sum(cnt * cnt) AS sumsq_c FROM cells),\n"
        "hood AS (\n"
        "  SELECT a.cell, a.cnt, count(*) AS w, sum(b.cnt) AS s\n"
        "  FROM cells a JOIN cells b\n"
        f"    ON b.x IN (a.x, (a.x + 1) % {n_tiles}, (a.x + {n_tiles - 1}) % {n_tiles})\n"
        "   AND b.y BETWEEN a.y - 1 AND a.y + 1\n"
        "  GROUP BY a.cell, a.cnt\n"
        "),\n"
        "scored AS (\n"
        "SELECT cell, cnt, w, s,\n"
        "  CAST(round((CAST(s AS DOUBLE) - (CAST(sum_c AS DOUBLE) / CAST(n AS DOUBLE))"
        " * CAST(w AS DOUBLE))\n"
        "    / (sqrt(CAST(sumsq_c AS DOUBLE) / CAST(n AS DOUBLE)"
        " - (CAST(sum_c AS DOUBLE) / CAST(n AS DOUBLE))"
        " * (CAST(sum_c AS DOUBLE) / CAST(n AS DOUBLE)))\n"
        "       * sqrt((CAST(n AS DOUBLE) * CAST(w AS DOUBLE)"
        " - CAST(w AS DOUBLE) * CAST(w AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)))"
        " * 1e6) AS BIGINT) AS gi_micro\n"
        "FROM hood, stats\n"
        "WHERE n >= 2 AND w < n\n"
        "  AND CAST(sumsq_c AS DOUBLE) / CAST(n AS DOUBLE)"
        " - (CAST(sum_c AS DOUBLE) / CAST(n AS DOUBLE))"
        " * (CAST(sum_c AS DOUBLE) / CAST(n AS DOUBLE)) > 0\n"
        ") SELECT cell, cnt, w, s, gi_micro,\n"
        f"  CASE WHEN gi_micro >= {GI_Z99_MICRO} THEN 'hot99'\n"
        f"       WHEN gi_micro >= {GI_Z95_MICRO} THEN 'hot95'\n"
        f"       WHEN gi_micro >= {GI_Z90_MICRO} THEN 'hot90'\n"
        f"       WHEN gi_micro <= -{GI_Z99_MICRO} THEN 'cold99'\n"
        f"       WHEN gi_micro <= -{GI_Z95_MICRO} THEN 'cold95'\n"
        f"       WHEN gi_micro <= -{GI_Z90_MICRO} THEN 'cold90'\n"
        "       ELSE 'ns' END AS gi_class\n"
        "FROM scored"
    )
