"""Trajectory / movement analytics over the events stream.

The events table (input_hint shape: event_id, ts, user_id, event_type,
value, props) carries no coordinates, so — like every other geo surface
in this repo — pings are SYNTHESIZED deterministically from the ids on
the micro-degree lattice (integer arithmetic + one final /1e6, replayed
verbatim by the DuckDB oracles; same device as operators/geotag.py).
Each user gets a stable home cell from ``user_id`` and each event a
±0.01-degree jitter from ``event_id``: per-user locality with real
movement between pings.

Operators:

* :func:`user_travel` — per-user total travel distance: one window pass
  (lag over (ts, event_id) within user), step distances on the
  reference's D5 equirectangular convention (deg × 111195), each step
  quantized to integer MILLIMETERS before the sum so Spark and DuckDB
  aggregate identically (the quantized-inputs parity rule).
* :func:`od_matrix` — origin→destination flows: per (user, hour) the
  first and last ping's z-tile cell, counted per (origin, dest) pair.
  Two window functions + one partial-agg groupBy.
* :func:`grid_dbscan` — grid-based DBSCAN (the published GriDBSCAN /
  cell-dense approximation): points bucket to z-tiles, cells with
  >= min_pts are core, 8-connected core cells (antimeridian wrap
  included) merge via star-contraction connected components, points in
  core cells take their component's min cell id as cluster label,
  everything else is noise (-1).  The cluster graph lives on CELLS, so
  the CC loop's state is bounded by occupied-cell count, not points —
  the property that makes density clustering feasible at 100 TB.

Scale shape: travel/OD shuffle once on user_id (the natural partition
key; windows are per-user); DBSCAN shuffles points once on cell, and
the core-cell graph (tiny) does the iterative work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fagi_gis_spark.index import tiles

#: micro-degree lattice constants shared with the SQL twins
_HOME_LON_M = 74747
_HOME_LAT_M = 15485863
_JIT_LON_M = 101
_JIT_LAT_M = 919
_UMOD = 99991
_EMOD = 999983


def event_ping_cols(user_id: Column, event_id: Column) -> tuple[Column, Column]:
    """(lon, lat) for an event: user home + per-event jitter, exact on
    the micro-degree lattice.  Inner pmods bound every product well
    inside int64 (ANSI mode throws on overflow)."""
    u = F.pmod(user_id, F.lit(_UMOD))
    e = F.pmod(event_id, F.lit(_EMOD))
    lon = (
        F.pmod(u * F.lit(_HOME_LON_M), F.lit(40_000_000)) / F.lit(1e6)
        - F.lit(20.0)
        + (F.pmod(e * F.lit(_JIT_LON_M), F.lit(20001)) - F.lit(10000)) / F.lit(1e6)
    )
    lat = (
        F.lit(40.0)
        + F.pmod(u * F.lit(_HOME_LAT_M), F.lit(10_000_000)) / F.lit(1e6)
        + (F.pmod(e * F.lit(_JIT_LAT_M), F.lit(20001)) - F.lit(10000)) / F.lit(1e6)
    )
    return lon, lat


def event_ping_sql(user_expr: str = "user_id", event_expr: str = "event_id") -> tuple[str, str]:
    """DuckDB twin of :func:`event_ping_cols` (ids are nonnegative, so
    plain ``%`` equals pmod)."""
    u = f"(({user_expr}) % {_UMOD})"
    e = f"(({event_expr}) % {_EMOD})"
    lon = (
        f"(({u} * {_HOME_LON_M}) % 40000000) / 1e6 - 20.0"
        f" + ((({e} * {_JIT_LON_M}) % 20001) - 10000) / 1e6"
    )
    lat = (
        f"40.0 + (({u} * {_HOME_LAT_M}) % 10000000) / 1e6"
        f" + ((({e} * {_JIT_LAT_M}) % 20001) - 10000) / 1e6"
    )
    return lon, lat


def with_pings(events: DataFrame) -> DataFrame:
    lon, lat = event_ping_cols(F.col("user_id"), F.col("event_id"))
    return events.withColumn("lon", lon).withColumn("lat", lat)


def _lagged_steps(events: DataFrame) -> DataFrame:
    """Pings + previous ping (per user, (ts, event_id) order) + the
    quantized D5 step: ``step_mm`` = round(deg-distance x 111195 x 1000)
    as int64 — the ONE definition of the parity-critical step expression
    both :func:`user_travel` and :func:`stay_points` (and their DuckDB
    oracles) replay."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = with_pings(events).select(
        "user_id",
        "ts",
        "event_id",
        "lon",
        "lat",
        F.lag("lon").over(w).alias("plon"),
        F.lag("lat").over(w).alias("plat"),
    )
    dlon = F.col("lon") - F.col("plon")
    dlat = F.col("lat") - F.col("plat")
    step_mm = F.round(
        F.sqrt(dlon * dlon + dlat * dlat) * F.lit(111195.0) * F.lit(1000.0)
    ).cast("long")
    return p.withColumn("step_mm", step_mm)


def user_travel(events: DataFrame) -> DataFrame:
    """Per-user movement stats: (user_id, n_pings, total_mm, max_step_mm).

    Step = D5 equirectangular distance (deg × 111195) to the previous
    ping in (ts, event_id) order; each step rounds to int64 millimeters
    BEFORE aggregation so the sums are engine-exact."""
    return (
        _lagged_steps(events)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_pings"),
            F.coalesce(F.sum("step_mm"), F.lit(0)).cast("long").alias("total_mm"),
            F.coalesce(F.max("step_mm"), F.lit(0)).cast("long").alias("max_step_mm"),
        )
    )


def od_matrix(events: DataFrame, z: int = 10, win_s: int = 3600) -> DataFrame:
    """Origin→destination flow counts: per (user, tumbling hour) the
    first and last ping's z-tile cell; one row per (origin_cell,
    dest_cell) with the flow count (self-flows kept — they are the
    stayed-home diagonal a flow matrix needs)."""
    win = F.floor(F.unix_timestamp("ts") / F.lit(win_s)).cast("long")
    p = with_pings(events).withColumn(
        "cell", tiles.cell_id_col(F.col("lon"), F.col("lat"), z)
    )
    w = (
        Window.partitionBy("user_id", "win")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        p.withColumn("win", win)
        .select(
            "user_id",
            "win",
            F.first("cell").over(w).alias("origin_cell"),
            F.last("cell").over(w).alias("dest_cell"),
        )
        .dropDuplicates(["user_id", "win"])
        .groupBy("origin_cell", "dest_cell")
        .agg(F.count("*").alias("n_trips"))
    )


def colocation(events: DataFrame, z: int = 8, win_s: int = 900) -> DataFrame:
    """User co-location pairs: events of DIFFERENT users in the same
    z-tile within ``win_s`` seconds -> (user_a, user_b, n_hits) with
    user_a < user_b and n_hits = the number of qualifying event pairs.

    The |dt| <= win_s band join runs as an EQUI-join on (cell, time
    bucket): bucket = floor(t / win_s), the probe side explodes buckets
    {b-1, b, b+1}, and since |dt| <= win_s forces the bucket difference
    into {-1, 0, 1}, every qualifying event pair matches on EXACTLY one
    (cell, bucket) key — counted once, no post-dedup.  One shuffle on a
    composite key both sides share; never a theta/cross join, so the
    contact-tracing-style join survives any event volume (skew = hot
    cells x hot windows, bounded by the bucket grain)."""
    p = with_pings(events).select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("t"),
        tiles.cell_id_col(F.col("lon"), F.col("lat"), z).alias("cell"),
    )
    b = F.floor(F.col("t") / F.lit(win_s)).cast("long")
    probe = p.select(
        F.col("user_id").alias("user_a"),
        F.col("t").alias("t_a"),
        "cell",
        F.explode(F.array(b - 1, b, b + 1)).alias("bkt"),
    )
    build = p.select(
        F.col("user_id").alias("user_b"),
        F.col("t").alias("t_b"),
        "cell",
        b.alias("bkt"),
    )
    return (
        probe.join(build, ["cell", "bkt"])
        .filter(
            (F.col("user_a") < F.col("user_b"))
            & (F.abs(F.col("t_a") - F.col("t_b")) <= F.lit(win_s))
        )
        .groupBy("user_a", "user_b")
        .agg(F.count("*").alias("n_hits"))
    )


def stay_points(
    events: DataFrame,
    eps_mm: int = 1_000_000,
    min_dur_s: int = 1800,
    min_pings: int = 3,
) -> DataFrame:
    """Stay-point (dwell) detection, chain variant: a stay is a maximal
    run of consecutive pings whose per-step distance stays <= ``eps_mm``
    (same quantized D5 millimeter steps as :func:`user_travel`), kept
    when it spans >= ``min_dur_s`` seconds and >= ``min_pings`` pings.

    This is the window-expressible chain form of the Li et al. 2008
    stay-point detector (the anchor-based form chains on distance to the
    segment's FIRST ping — a data-dependent scan no window captures);
    segment ids are a running sum over the break flag, the canonical
    sessionize shape (one shuffle on user_id).  Centroids are emitted as
    integer MICRO-degrees (pings are exact micro-degree lattice points,
    so the per-segment sum and floor-divide are engine-exact integers).

    Output: (user_id, stay_id, n_pings, dur_s, c_lon_micro, c_lat_micro).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = _lagged_steps(events)
    brk = F.when(
        F.col("plon").isNull() | (F.col("step_mm") > F.lit(eps_mm)), 1
    ).otherwise(0)
    seg = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    t = F.unix_timestamp("ts")
    return (
        p.withColumn("stay_id", seg.cast("long"))
        .groupBy("user_id", "stay_id")
        .agg(
            F.count("*").alias("n_pings"),
            (F.max(t) - F.min(t)).cast("long").alias("dur_s"),
            F.floor(
                F.sum(F.round(F.col("lon") * F.lit(1e6)).cast("long"))
                / F.count("*")
            ).cast("long").alias("c_lon_micro"),
            F.floor(
                F.sum(F.round(F.col("lat") * F.lit(1e6)).cast("long"))
                / F.count("*")
            ).cast("long").alias("c_lat_micro"),
        )
        .filter(
            (F.col("dur_s") >= F.lit(min_dur_s))
            & (F.col("n_pings") >= F.lit(min_pings))
        )
    )


def grid_dbscan(
    points: DataFrame,
    z: int = 13,
    min_pts: int = 3,
    id_col: str = "subject",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Grid-based DBSCAN: (id, cluster_label) with label = min core-cell
    id of the 8-connected dense-cell component, or -1 for noise.

    Dense ("core") cells have >= min_pts points; adjacency is the
    8-neighborhood with antimeridian x-wrap.  Components run on the
    CELL graph via star contraction (functions.dedup), so iterative
    state is bounded by occupied cells.  This is the standard grid
    approximation of DBSCAN with eps ~ the cell size: exact DBSCAN
    point-level border cases are intentionally out of contract (the
    docs of every grid variant say the same)."""
    from fagi_gis_spark.functions.dedup import connected_components_star

    if z < tiles.MIN_NEIGHBOR_RES:
        raise ValueError(
            f"grid_dbscan needs z >= {tiles.MIN_NEIGHBOR_RES} "
            "(x-wrap aliases the 8-neighborhood below that)"
        )
    n = 2**z
    g = points.select(
        F.col(id_col).alias("pid"),
        tiles.tile_x_col(F.col(lon_col), z).alias("x"),
        tiles.tile_y_col(F.col(lat_col), z).alias("y"),
        tiles.cell_id_col(F.col(lon_col), F.col(lat_col), z).alias("cell"),
    )
    core = (
        g.groupBy("x", "y", "cell").agg(F.count("*").alias("n_pts"))
        .filter(F.col("n_pts") >= min_pts)
    )
    # 8-neighborhood as an EQUI-join: each core cell explodes its nine
    # (dx, dy) offsets (x wraps at the antimeridian) and probes the core
    # set on (x, y) — never a theta/cross join, so the cell graph builds
    # in one shuffle however many dense cells exist
    probe = (
        core.select("cell", "x", "y", tiles.neighbor_offsets_col().alias("o"))
        .select(
            "cell",
            F.pmod(F.col("x") + F.col("o.dx"), F.lit(n)).alias("nx"),
            (F.col("y") + F.col("o.dy")).alias("ny"),
        )
    )
    edges = (
        probe.join(
            core.select(F.col("cell").alias("v"), F.col("x").alias("nx"), F.col("y").alias("ny")),
            ["nx", "ny"],
        )
        .filter(F.col("cell") != F.col("v"))
        .select(F.col("cell").alias("u"), "v")
    )
    labels = connected_components_star(edges, src_col="u", dst_col="v")
    lab = core.join(
        labels.withColumnRenamed("doc_id", "cell"), "cell", "left"
    ).select(
        "cell", F.coalesce("component_id", "cell").alias("cluster_label")
    )
    return (
        g.join(lab, "cell", "left")
        .select(
            F.col("pid").alias(id_col),
            F.coalesce("cluster_label", F.lit(-1)).cast("long").alias("cluster_label"),
        )
    )


def hausdorff_by_key(
    points: DataFrame,
    key_col: str = "user_id",
    side_col: str = "side",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Discrete Hausdorff distance between the two point sets of every
    key, EXACT on an integer lattice: inputs are int64 coordinates
    (micro-degrees here), all distances are int64 SQUARED distances
    (dx²+dy² — bounded by construction well inside int64), so max-of-
    min-of-integers has no float tolerance and a plain SQL min/max
    aggregation replays it bit-for-bit.

    Output per key with BOTH sides non-empty: the two directed values
    ``h_ab2`` (max over side-0 points of the min squared distance to a
    side-1 point), ``h_ba2`` (the reverse), and their max ``h2_udeg2``
    — the classic trajectory-conflation similarity (Alt & Guibas,
    Handbook of Computational Geometry ch. 3; the reference's
    conflation scoring uses point distance only,
    fagi-gis FuserWorker distance scoring).

    Scale shape: one shuffle on the key, then a per-key Arrow batch
    computes the nA×nB distance matrix vectorized — cost is bounded by
    the trajectory length, never the corpus; a billion keys fan out
    embarrassingly.  For very long single trajectories, pre-thin with
    ``stay_points`` or a cell-level rollup before pairing."""
    import numpy as np
    import pandas as pd

    def one(pdf: pd.DataFrame) -> pd.DataFrame:
        a = pdf[pdf[side_col] == 0]
        b = pdf[pdf[side_col] == 1]
        if len(a) == 0 or len(b) == 0:
            return pd.DataFrame(
                columns=["key", "n_a", "n_b", "h_ab2", "h_ba2", "h2_udeg2"]
            )
        ax = a[x_col].to_numpy(np.int64)[:, None]
        ay = a[y_col].to_numpy(np.int64)[:, None]
        bx = b[x_col].to_numpy(np.int64)[None, :]
        by = b[y_col].to_numpy(np.int64)[None, :]
        d2 = (ax - bx) ** 2 + (ay - by) ** 2  # exact int64
        h_ab2 = int(d2.min(axis=1).max())
        h_ba2 = int(d2.min(axis=0).max())
        return pd.DataFrame(
            {
                "key": [pdf[key_col].iloc[0]],
                "n_a": [len(a)],
                "n_b": [len(b)],
                "h_ab2": [h_ab2],
                "h_ba2": [h_ba2],
                "h2_udeg2": [max(h_ab2, h_ba2)],
            }
        )

    out = points.groupBy(key_col).applyInPandas(
        one,
        schema=(
            "key long, n_a long, n_b long, h_ab2 long, h_ba2 long, h2_udeg2 long"
        ),
    )
    return out.withColumnRenamed("key", key_col)


def frechet_by_key(
    points: DataFrame,
    key_col: str = "user_id",
    side_col: str = "side",
    order_col: str = "seq",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Discrete Fréchet distance (squared, exact int64) between the two
    ORDERED polylines of every key — the coupling-aware upgrade of
    :func:`hausdorff_by_key` (Eiter & Mannila 1994 free-space DP).
    DP is O(nA·nB) per key, vectorized one row at a time (numpy
    running-min along the inner axis); Fréchet ≥ Hausdorff always,
    which the pytest twin asserts alongside a brute-force recursive
    reference."""
    import numpy as np
    import pandas as pd

    def one(pdf: pd.DataFrame) -> pd.DataFrame:
        a = pdf[pdf[side_col] == 0].sort_values(order_col)
        b = pdf[pdf[side_col] == 1].sort_values(order_col)
        if len(a) == 0 or len(b) == 0:
            return pd.DataFrame(columns=["key", "n_a", "n_b", "f2_udeg2"])
        ax = a[x_col].to_numpy(np.int64)[:, None]
        ay = a[y_col].to_numpy(np.int64)[:, None]
        bx = b[x_col].to_numpy(np.int64)[None, :]
        by = b[y_col].to_numpy(np.int64)[None, :]
        d2 = (ax - bx) ** 2 + (ay - by) ** 2
        n_b = d2.shape[1]
        # DP row by row: ca[j] = max(d2[i,j], min(ca[j-1], prev[j], prev[j-1]))
        prev = np.maximum.accumulate(d2[0])
        for i in range(1, d2.shape[0]):
            cur = np.empty(n_b, dtype=np.int64)
            cur[0] = max(d2[i, 0], prev[0])
            for j in range(1, n_b):
                cur[j] = max(
                    d2[i, j], min(cur[j - 1], prev[j], prev[j - 1])
                )
            prev = cur
        return pd.DataFrame(
            {
                "key": [pdf[key_col].iloc[0]],
                "n_a": [len(a)],
                "n_b": [len(b)],
                "f2_udeg2": [int(prev[-1])],
            }
        )

    out = points.groupBy(key_col).applyInPandas(
        one, schema="key long, n_a long, n_b long, f2_udeg2 long"
    )
    return out.withColumnRenamed("key", key_col)


def trajectory_split_points(events: DataFrame) -> DataFrame:
    """Per-event lattice point + the even/odd split used by the
    similarity queries: side 0 = even event_id, side 1 = odd — two
    interleaved revisit traces of the same user's territory."""
    p = with_pings(events)
    return p.select(
        "user_id",
        F.pmod(F.col("event_id"), F.lit(2)).cast("int").alias("side"),
        F.col("event_id").alias("seq"),
        F.floor(F.col("lon") * F.lit(1e6) + F.lit(0.5)).cast("long").alias("x"),
        F.floor(F.col("lat") * F.lit(1e6) + F.lit(0.5)).cast("long").alias("y"),
    )
