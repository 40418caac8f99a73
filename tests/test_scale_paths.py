"""Scale-path tests: salted skew join equivalence, bucketed co-located
join (no Exchange), stateful streaming sessionization."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_salted_radius_join_equals_unsalted(spark):
    """Explicit hot-cell salting must be a pure physical optimization —
    identical result set, including on heavily skewed input."""
    from fagi_gis_spark.operators.spatial_join import radius_join

    # skewed layer: 2000 points piled into one cell + a spread tail
    n_hot, n_tail = 2000, 500
    hot = spark.range(n_hot).select(
        F.concat(F.lit("h"), F.col("id")).alias("subject"),
        (F.lit(0.1) + (F.col("id") % 50).cast("double") / 1e6).alias("lon"),
        (F.lit(50.5) + ((F.col("id") * 7) % 50).cast("double") / 1e6).alias("lat"),
    )
    tail = spark.range(n_tail).select(
        F.concat(F.lit("t"), F.col("id")).alias("subject"),
        (F.lit(-0.9) + F.col("id").cast("double") * 31 / 1e6).alias("lon"),
        (F.lit(51.0) + F.col("id").cast("double") * 17 / 1e6).alias("lat"),
    )
    left = hot.unionByName(tail)
    right = left.withColumn("lon", F.col("lon") + 0.00002).withColumnRenamed(
        "subject", "subject"
    )

    plain = radius_join(left, right, 50.0).select("l_key", "r_key").toPandas()
    salted = radius_join(left, right, 50.0, salt_threshold=100, n_salt=8).select(
        "l_key", "r_key"
    ).toPandas()
    a = set(map(tuple, plain.itertuples(index=False)))
    b = set(map(tuple, salted.itertuples(index=False)))
    assert len(a) > n_hot  # the hot cell really collides
    assert a == b


def test_auto_salting_is_adaptive(spark):
    """auto mode must engage the salted two-key join ONLY when a hot cell
    exists: uniform input short-circuits to the plain cell join (no salt
    column in the executed plan), skewed input salts."""
    from fagi_gis_spark.operators.spatial_join import radius_join

    uniform = spark.range(2000).select(
        F.concat(F.lit("u"), F.col("id")).alias("subject"),
        (F.lit(-0.9) + F.col("id").cast("double") * 31 / 1e6).alias("lon"),
        (F.lit(51.0) + F.col("id").cast("double") * 17 / 1e6).alias("lat"),
    )
    # hot pile + spread tail: auto's threshold is 8x the MEAN cell count,
    # so a tail of singleton cells is needed for the pile to register as hot
    skewed = spark.range(3000).select(
        F.concat(F.lit("s"), F.col("id")).alias("subject"),
        (F.lit(0.1) + (F.col("id") % 50).cast("double") / 1e6).alias("lon"),
        (F.lit(50.5) + ((F.col("id") * 7) % 50).cast("double") / 1e6).alias("lat"),
    ).unionByName(
        spark.range(2000).select(
            F.concat(F.lit("t"), F.col("id")).alias("subject"),
            (F.lit(-0.9) + F.col("id").cast("double") * 97 / 1e6).alias("lon"),
            (F.lit(51.0) + F.col("id").cast("double") * 53 / 1e6).alias("lat"),
        )
    )

    def join_plan(df):
        out = radius_join(df, df.withColumn("lon", F.col("lon") + 0.00001), 50.0)
        return out._jdf.queryExecution().executedPlan().toString()

    assert "salt" not in join_plan(uniform)
    assert "salt" in join_plan(skewed)


@pytest.mark.parametrize("strategy", ["tile", "hex", "s2"])
def test_salting_shared_across_strategies(spark, strategy):
    """Hot-cell salting is wired into ALL three radius-join strategies
    (r3 gap: hex/S2 had none): on a skewed fixture (one cell >10x the
    mean) each strategy's salted join equals its unsalted join row-for-
    row, and the executed plan really contains the salt key."""
    from fagi_gis_spark.operators.spatial_join import (
        hex_radius_join,
        radius_join,
        s2_radius_join,
    )

    fn = {"tile": radius_join, "hex": hex_radius_join, "s2": s2_radius_join}[strategy]
    # hot pile in one cell + singleton-cell tail so mean << max
    left = spark.range(2000).select(
        F.concat(F.lit("h"), F.col("id")).alias("subject"),
        (F.lit(0.1) + (F.col("id") % 50).cast("double") / 1e6).alias("lon"),
        (F.lit(50.5) + ((F.col("id") * 7) % 50).cast("double") / 1e6).alias("lat"),
    ).unionByName(
        spark.range(500).select(
            F.concat(F.lit("t"), F.col("id")).alias("subject"),
            (F.lit(-0.9) + F.col("id").cast("double") * 31 / 1e6).alias("lon"),
            (F.lit(51.0) + F.col("id").cast("double") * 17 / 1e6).alias("lat"),
        )
    )
    right = left.withColumn("lon", F.col("lon") + 0.00002)

    plain = fn(left, right, 50.0, salt_threshold=None)
    salted = fn(left, right, 50.0, salt_threshold=100, n_salt=8)
    assert "salt" in salted._jdf.queryExecution().executedPlan().toString()
    a = set(map(tuple, plain.select("l_key", "r_key").toPandas().itertuples(index=False)))
    b = set(map(tuple, salted.select("l_key", "r_key").toPandas().itertuples(index=False)))
    assert len(a) > 2000  # the hot cell really collides
    assert a == b


def test_knn_join_strategy_kwarg_routing(spark):
    """knn_join drops resolution kwargs that belong to a different
    strategy (z/res/level) instead of raising, and still rejects kwargs
    no strategy accepts."""
    from fagi_gis_spark.operators.spatial_join import knn_join

    pts = spark.range(50).select(
        F.concat(F.lit("p"), F.col("id")).alias("subject"),
        (F.lit(0.1) + F.col("id").cast("double") * 13 / 1e6).alias("lon"),
        (F.lit(50.5) + F.col("id").cast("double") * 7 / 1e6).alias("lat"),
    )
    base = knn_join(pts, pts, k=2, radius_m=100.0, exclude_self=True)
    routed = knn_join(
        pts, pts, k=2, radius_m=100.0, exclude_self=True, strategy="s2",
        z=12, salt_threshold=None,  # z is tile-only: dropped for s2
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, routed.collect()))
    with pytest.raises(TypeError, match="no strategy accepts"):
        knn_join(pts, pts, k=2, radius_m=100.0, bogus_knob=1)


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketing by the join key co-locates both sides: the join plan must
    contain no Exchange — the storage-level answer to the reference's
    GiST+CLUSTER physical ordering (SURVEY.md §4)."""
    from fagi_gis_spark.registry import layers

    import shutil

    L = layers(spark, SF)
    for t in ("poi_a_bkt", "links_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    L["poi_a"].select("subject", "geom_wkt").write.bucketBy(8, "subject").sortBy(
        "subject"
    ).mode("overwrite").saveAsTable("poi_a_bkt")
    L["links"].withColumnRenamed("node_a", "subject").write.bucketBy(8, "subject").sortBy(
        "subject"
    ).mode("overwrite").saveAsTable("links_bkt")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("links_bkt").join(spark.table("poi_a_bkt"), "subject")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_stateful_streaming_sessionize(spark, tmp_path):
    """applyInPandasWithState sessionizer: session counts per user match
    the batch sessionization logic on the same rows."""
    from fagi_gis_spark.streaming.stateful import sessionize_stream

    events = spark.read.parquet(f"{SF}/events.parquet")
    src = str(tmp_path / "ev")
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        sessionize_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # a session may emit several progress rows across batches; its final
    # count is the max per (user, session)
    got = spark.sql(
        "SELECT user_id, sum(n) AS n FROM (SELECT user_id, session_id,"
        " max(n_events) AS n FROM sess_out GROUP BY 1, 2) GROUP BY user_id"
    ).toPandas()
    # every event lands in exactly one session
    expect = events.groupBy("user_id").agg(F.count("*").alias("n")).toPandas()
    g = dict(zip(got.user_id, got.n))
    e = dict(zip(expect.user_id, expect.n))
    assert g == e


def test_radius_join_antimeridian_and_polar(spark):
    """Points straddling lon ±180 (and near the WebMercator lat clamp)
    must round-trip the cell-bucketed radius join against a brute-force
    wrapped-distance oracle — the ring-1 x offset wraps modulo 2^z and
    tile_y is clamped, so the seam behaves like any other meridian."""
    from fagi_gis_spark.geometry.measures import DEG_TO_M
    from fagi_gis_spark.operators.spatial_join import radius_join

    rows = []
    # pairs across the antimeridian at several latitudes incl. near-polar
    for i, lat in enumerate([0.0, 45.0, 60.0, 84.9, 85.3, -85.3]):
        rows.append((f"w{i}", 179.99995, lat))      # west of the seam
        rows.append((f"e{i}", -179.99995, lat))     # east of the seam
    # a control pair away from the seam + an isolated point
    rows += [("c1", 10.0, 10.0), ("c2", 10.00005, 10.0), ("far", 90.0, 0.0)]
    df = spark.createDataFrame(rows, "subject string, lon double, lat double")

    got = radius_join(df, df, 50.0).select("l_key", "r_key").toPandas()
    got_pairs = {(a, b) for a, b in got.itertuples(index=False) if a != b}

    import math

    def wdist(p, q):
        dl = abs(p[1] - q[1])
        dl = min(dl, 360.0 - dl)
        return math.sqrt(dl * dl + (p[2] - q[2]) ** 2) * DEG_TO_M

    expect = {
        (p[0], q[0])
        for p in rows
        for q in rows
        if p[0] != q[0] and wdist(p, q) <= 50.0
    }
    assert ("w0", "e0") in expect  # the seam pair is a real candidate
    assert got_pairs == expect


def test_ngram_jaccard_minhash_blocking_finds_cross_band_pairs(spark):
    """The default (MinHash-bucket) blocking must find duplicate pairs
    whose token counts straddle a length band — pairs the closed-form
    lenband blocking structurally misses — and find at least every pair
    lenband finds."""
    from fagi_gis_spark.functions.dedup import ngram_jaccard_pairs

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar"
    docs = [
        (1, base),                                  # 15 tokens -> band 1
        (2, base + " papa quebec"),                 # 17 tokens -> band 2 (cross-band dup)
        (3, base + " papa"),                        # 16 tokens -> band 2
        (4, "zulu yankee xray whiskey victor uniform tango sierra romeo quebec papa oscar nov mike lima"),
        (5, "one two three"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    lenband = ngram_jaccard_pairs(df, threshold=0.5, blocking="lenband").toPandas()
    bucketed = ngram_jaccard_pairs(df, threshold=0.5, blocking="minhash").toPandas()
    lb = {(a, b) for a, b, _ in lenband.itertuples(index=False)}
    mk = {(a, b) for a, b, _ in bucketed.itertuples(index=False)}

    assert (1, 2) not in lb          # cross-band: lenband structurally blind
    assert (1, 2) in mk              # minhash blocking finds it
    assert lb <= mk                  # and misses nothing lenband found


def test_owl_class_triples(spark):
    """OWL class insertion (FuseLinkServlet.java:225-270): one typing
    triple per accepted row, one owl:Class + rdfs:label pair per distinct
    class."""
    from fagi_gis_spark.operators.owl import OWL_CLASS, RDF_TYPE, RDFS_LABEL, owl_class_triples

    acc = spark.createDataFrame(
        [("a:1", "cafe"), ("a:2", "cafe"), ("a:3", "park")], "node string, cls string"
    )
    out = owl_class_triples(acc, "http://a.example/").toPandas()
    triples = set(map(tuple, out.itertuples(index=False)))
    assert triples == {
        ("a:1", RDF_TYPE, "http://a.example/cafe"),
        ("a:2", RDF_TYPE, "http://a.example/cafe"),
        ("a:3", RDF_TYPE, "http://a.example/park"),
        ("http://a.example/cafe", RDF_TYPE, OWL_CLASS),
        ("http://a.example/park", RDF_TYPE, OWL_CLASS),
        ("http://a.example/cafe", RDFS_LABEL, "cafe"),
        ("http://a.example/park", RDFS_LABEL, "park"),
    }


def test_broadcast_pois_uses_broadcast_join_and_matches(spark):
    """J7 (smaller-side probe choice): broadcast_pois must put a
    BroadcastHashJoin in the physical plan and return the identical
    result set as the default (sort-merge / AQE) strategy."""
    from fagi_gis_spark.operators.fusion import fuse, linked_pairs
    from fagi_gis_spark.registry import layers

    L = layers(spark, SF)
    default_pairs = linked_pairs(L["links"], L["poi_a"], L["poi_b"])
    bcast_pairs = linked_pairs(L["links"], L["poi_a"], L["poi_b"], broadcast_pois=True)

    plan = bcast_pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    a = fuse(default_pairs, "most_points").toPandas()
    b = fuse(bcast_pairs, "most_points").toPandas()
    key = lambda df: sorted(map(tuple, df.itertuples(index=False)))
    assert key(a) == key(b)
    assert len(a) > 0


def test_connected_components_chains_cycles_isolated(spark):
    """Min-label propagation must handle multi-hop chains, cycles and
    separate components; survivors keep exactly one doc per component."""
    from fagi_gis_spark.functions.dedup import connected_components, dedup_survivors

    edges = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 4), (4, 5),        # 5-chain -> comp 1
            (10, 11), (11, 12), (12, 10),           # cycle -> comp 10
            (20, 21),                               # pair -> comp 20
        ],
        "doc_a long, doc_b long",
    )
    comp = connected_components(edges).toPandas()
    got = dict(zip(comp.doc_id, comp.component_id))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in [1, 2, 3, 4, 5, 10, 11, 12, 20, 21, 99]],
        "doc_id long, text string",
    )
    kept = dedup_survivors(docs, connected_components(edges)).toPandas()
    assert sorted(kept.doc_id) == [1, 10, 20, 99]  # min per comp + untouched 99


def test_connected_components_star_contraction(spark):
    """Star contraction (large-star/small-star) is the diameter-robust
    CC variant: a 10k-node path graph — the adversarial topology where
    min-label propagation needs 10k rounds — converges in O(log n)
    rounds with the correct single component, and on a mixed
    chain/cycle/pair graph it matches label propagation exactly."""
    from fagi_gis_spark.functions.dedup import (
        connected_components,
        connected_components_star,
    )

    n = 10_000
    path = spark.range(n - 1).selectExpr("id AS doc_a", "id + 1 AS doc_b")
    labels, rounds = connected_components_star(path, return_rounds=True)
    out = labels.toPandas()
    assert len(out) == n
    assert (out.component_id == 0).all()
    # diameter 10k, rounds logarithmic (log2(10k) ~ 13.3; alternating
    # stars need a small multiple of that)
    assert rounds <= 30, f"star contraction took {rounds} rounds"

    mixed = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (12, 10), (20, 21)],
        "doc_a long, doc_b long",
    )
    star = connected_components_star(mixed).toPandas()
    prop = connected_components(mixed).toPandas()
    assert dict(zip(star.doc_id, star.component_id)) == dict(
        zip(prop.doc_id, prop.component_id)
    )


def test_knn_adaptive_equals_bruteforce(spark):
    """Adaptive ring-doubling kNN must equal the unbounded brute-force
    top-k wherever probes reach k neighbors — including probes whose k-th
    neighbor lies beyond the initial radius."""
    import numpy as np

    from fagi_gis_spark.operators.spatial_join import knn_join_adaptive

    rng = np.random.default_rng(5)
    # dense blob + sparse outliers (outliers need several doublings)
    pts = [(f"d{i}", -0.5 + rng.uniform(0, 0.01), 50.5 + rng.uniform(0, 0.01)) for i in range(150)]
    pts += [(f"s{i}", -0.2 + i * 0.05, 51.5 + i * 0.03) for i in range(6)]
    left = spark.createDataFrame(pts, "subject string, lon double, lat double")
    right = left

    got = knn_join_adaptive(
        left, right, k=3, init_radius_m=50.0, max_doublings=12, exclude_self=True
    ).toPandas()

    import math

    def brute(k=3):
        out = {}
        for s, x, y in pts:
            d = sorted(
                (math.hypot(x - x2, y - y2) * 111195.0, s2)
                for s2, x2, y2 in pts if s2 != s
            )[:k]
            out[s] = [s2 for _, s2 in d]
        return out

    expect = brute()
    got_sorted = got.sort_values(["l_key", "knn_rank"]).groupby("l_key")["r_key"].apply(list)
    for key, exp in expect.items():
        assert list(got_sorted[key]) == exp, key


def test_radius_join_randomized_completeness(spark):
    """Randomized differential check: the cell-bucketed radius join must
    return exactly the brute-force pair set for random point clouds and
    radii (ring-1 completeness depends on the z choice — this guards
    join_res_for_radius)."""
    import numpy as np

    rng = np.random.default_rng(123)
    for trial in range(5):
        n = 120
        lon0, lat0 = rng.uniform(-170, 170), rng.uniform(-55, 55)
        lons = lon0 + rng.uniform(0, 0.02, n)
        lats = lat0 + rng.uniform(0, 0.02, n)
        radius = float(rng.uniform(50, 800))
        rows = [(f"p{i}", float(lons[i]), float(lats[i])) for i in range(n)]
        df = spark.createDataFrame(rows, "subject string, lon double, lat double")

        from fagi_gis_spark.operators.spatial_join import radius_join

        got = {
            (a, b)
            for a, b in radius_join(df, df, radius)
            .select("l_key", "r_key")
            .toPandas()
            .itertuples(index=False)
        }
        dx = lons[:, None] - lons[None, :]
        dy = lats[:, None] - lats[None, :]
        d = np.sqrt(dx * dx + dy * dy) * 111195.0
        ii, jj = np.nonzero(d <= radius)
        expect = {(f"p{i}", f"p{j}") for i, j in zip(ii, jj)}
        assert got == expect, f"trial {trial}: lon0={lon0} lat0={lat0} r={radius}"


def test_hex_radius_join_randomized_equals_bruteforce(spark):
    """The aperture-7 hex-bucketed radius join returns exactly the
    brute-force pair set (gridDisk(1) completeness holds whenever
    radius <= hex circumradius — guards hex_res_for_radius), including
    across the antimeridian seam and at high latitude."""
    import numpy as np

    from fagi_gis_spark.operators.spatial_join import hex_radius_join

    rng = np.random.default_rng(77)
    windows = [(rng.uniform(-170, 170), rng.uniform(-55, 55)) for _ in range(3)]
    windows += [(179.985, 10.0), (-179.995, -62.0)]  # seam straddles
    for trial, (lon0, lat0) in enumerate(windows):
        n = 120
        lons = lon0 + rng.uniform(0, 0.02, n)
        lons = (lons + 180.0) % 360.0 - 180.0  # wrap into [-180, 180)
        lats = lat0 + rng.uniform(0, 0.02, n)
        radius = float(rng.uniform(50, 800))
        rows = [(f"p{i}", float(lons[i]), float(lats[i])) for i in range(n)]
        df = spark.createDataFrame(rows, "subject string, lon double, lat double")
        got = {
            (a, b)
            for a, b in hex_radius_join(df, df, radius)
            .select("l_key", "r_key")
            .toPandas()
            .itertuples(index=False)
        }
        dx = np.abs(lons[:, None] - lons[None, :])
        dx = np.minimum(dx, 360.0 - dx)
        dy = lats[:, None] - lats[None, :]
        d = np.sqrt(dx * dx + dy * dy) * 111195.0
        ii, jj = np.nonzero(d <= radius)
        expect = {(f"p{i}", f"p{j}") for i, j in zip(ii, jj)}
        assert got == expect, f"trial {trial}: lon0={lon0} lat0={lat0} r={radius}"


def test_hex_radius_join_equals_square_cell_join(spark):
    """Same logical op, two physical strategies: hex gridDisk(1) and
    square ring-1 produce identical (pair, dist) outputs."""
    import numpy as np

    from fagi_gis_spark.operators.spatial_join import hex_radius_join, radius_join

    rng = np.random.default_rng(5150)
    n = 250
    lons = 23.0 + rng.uniform(0, 0.05, n)
    lats = 37.9 + rng.uniform(0, 0.05, n)
    rows = [(f"p{i}", float(lons[i]), float(lats[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "subject string, lon double, lat double")
    hexed = hex_radius_join(df, df, 150.0).select("l_key", "r_key", "dist_m").toPandas()
    squared = radius_join(df, df, 150.0).select("l_key", "r_key", "dist_m").toPandas()
    key = lambda t: (t.l_key, t.r_key, round(t.dist_m, 9))  # noqa: E731
    assert {key(t) for t in hexed.itertuples()} == {key(t) for t in squared.itertuples()}


def test_hex_radius_join_wider_disk_still_complete(spark):
    """Forcing a finer res than the base (so gridDisk(k >= 2) kicks in
    via hex_disk_k_for) must still return exactly the brute-force pair
    set — guards the 1.5*R*m center-spacing completeness bound."""
    import numpy as np

    from fagi_gis_spark.operators.spatial_join import (
        hex_disk_k_for,
        hex_radius_join,
        hex_res_for_radius,
    )

    rng = np.random.default_rng(99)
    n = 150
    lons = -0.9 + rng.uniform(0, 0.03, n)
    lats = 50.4 + rng.uniform(0, 0.03, n)
    radius = 400.0
    base = hex_res_for_radius(radius)
    rows = [(f"p{i}", float(lons[i]), float(lats[i])) for i in range(n)]
    df = spark.createDataFrame(rows, "subject string, lon double, lat double")
    dx = np.abs(lons[:, None] - lons[None, :])
    dy = lats[:, None] - lats[None, :]
    d = np.sqrt(dx * dx + dy * dy) * 111195.0
    ii, jj = np.nonzero(d <= radius)
    expect = {(f"p{i}", f"p{j}") for i, j in zip(ii, jj)}
    for res in (base + 1, base + 2):
        assert hex_disk_k_for(radius, res) >= 2
        got = {
            (a, b)
            for a, b in hex_radius_join(df, df, radius, res=res)
            .select("l_key", "r_key")
            .toPandas()
            .itertuples(index=False)
        }
        assert got == expect, f"res {res}"


def test_hex_res_auto_scales_with_density(spark):
    """The cost model picks the base res at low density and a finer res
    (wider disk) once expected per-cell occupancy dominates; res=auto
    end-to-end equals brute force."""
    import numpy as np

    from fagi_gis_spark.operators.spatial_join import (
        hex_radius_join,
        hex_res_auto,
        hex_res_for_radius,
    )

    base = hex_res_for_radius(150.0)
    assert hex_res_auto(150.0, 10.0) == base  # ~sparse: fan-out dominates
    assert hex_res_auto(150.0, 1e9) > base  # dense: pair volume dominates
    rng = np.random.default_rng(11)
    n = 200
    rows = [
        (f"p{i}", float(-0.5 + rng.uniform(0, 0.01)), float(50.2 + rng.uniform(0, 0.01)))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "subject string, lon double, lat double")
    lon = np.array([r[1] for r in rows]); lat = np.array([r[2] for r in rows])
    d = np.sqrt((lon[:, None] - lon[None, :]) ** 2 + (lat[:, None] - lat[None, :]) ** 2) * 111195.0
    expect = {(f"p{i}", f"p{j}") for i, j in zip(*np.nonzero(d <= 150.0))}
    got = {
        (a, b)
        for a, b in hex_radius_join(df, df, 150.0, res="auto")
        .select("l_key", "r_key")
        .toPandas()
        .itertuples(index=False)
    }
    assert got == expect


def test_s2_radius_join_randomized_completeness(spark):
    """The S2-bucketed radius join returns exactly the brute-force pair
    set for random windows INCLUDING cube-face edges (lon 45), the
    antimeridian, and high latitude — the cross-face neighbor wrap and
    the kMinWidth level bound carry the completeness proof."""
    import numpy as np

    from fagi_gis_spark.operators.spatial_join import s2_radius_join

    rng = np.random.default_rng(31)
    windows = [
        (rng.uniform(-170, 170), rng.uniform(-55, 55)),
        (44.995, 10.0),     # face 0/1 edge
        (179.99, -20.0),    # antimeridian (face 3 interior — no seam)
        (-0.005, 83.0),     # near-polar, face 2 vicinity
    ]
    for trial, (lon0, lat0) in enumerate(windows):
        n = 120
        lons = lon0 + rng.uniform(0, 0.02, n)
        lons = (lons + 180.0) % 360.0 - 180.0
        lats = lat0 + rng.uniform(0, 0.02, n)
        radius = float(rng.uniform(50, 800))
        rows = [(f"p{i}", float(lons[i]), float(lats[i])) for i in range(n)]
        df = spark.createDataFrame(rows, "subject string, lon double, lat double")
        got = {
            (a, b)
            for a, b in s2_radius_join(df, df, radius)
            .select("l_key", "r_key")
            .toPandas()
            .itertuples(index=False)
        }
        dx = np.abs(lons[:, None] - lons[None, :])
        dx = np.minimum(dx, 360.0 - dx)
        dy = lats[:, None] - lats[None, :]
        d = np.sqrt(dx * dx + dy * dy) * 111195.0
        ii, jj = np.nonzero(d <= radius)
        expect = {(f"p{i}", f"p{j}") for i, j in zip(ii, jj)}
        assert got == expect, f"trial {trial}: lon0={lon0} lat0={lat0} r={radius}"


def test_bbox_partition_pruning(spark, tmp_path):
    """Viewport queries over a cell-partitioned layer must read ONLY the
    covering partitions (planning-time pruning: inputFiles shrinks and
    the scan shows PartitionFilters) and return exactly the plain bbox
    filter's rows."""
    from fagi_gis_spark.operators.pruning import (
        bbox_scan_pruned,
        covering_tiles,
        write_cell_partitioned,
    )
    from fagi_gis_spark.registry import layers

    L = layers(spark, SF)
    path = str(tmp_path / "poi_a_cells")
    write_cell_partitioned(L["poi_a"].select("subject", "lon", "lat"), path, z=7)

    bbox = (-0.6, 50.2, -0.1, 50.9)
    pruned = bbox_scan_pruned(spark, path, *bbox, z=7)
    all_files = spark.read.parquet(path).inputFiles()
    # inputFiles() lists the base relation pre-pruning; the files the
    # pruned scan ACTUALLY touches come from input_file_name()
    pruned_files = {
        r[0] for r in pruned.select(F.input_file_name()).distinct().collect()
    }
    assert len(pruned_files) < len(all_files)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell_part" in plan

    expect = (
        L["poi_a"]
        .filter(
            (F.col("lon") >= bbox[0]) & (F.col("lon") <= bbox[2])
            & (F.col("lat") >= bbox[1]) & (F.col("lat") <= bbox[3])
        )
        .select("subject")
    )
    got = {r.subject for r in pruned.select("subject").collect()}
    assert got == {r.subject for r in expect.collect()} and len(got) > 0
    # the covering is exact: every selected row's cell is in the list
    cells = set(covering_tiles(*bbox, z=7))
    in_cells = {r.cell_part for r in pruned.select("cell_part").distinct().collect()}
    assert in_cells <= cells


def test_cell_bucketed_radius_join_build_side_no_exchange(spark, tmp_path):
    """With the build layer bucketed BY CELL at the join resolution, the
    radius join's build side reads shuffle-free (bucketing provides the
    HashPartitioning): exactly one Exchange remains (probe side) in the
    sort-merge plan — the storage layout a 100TB deployment would use."""
    import shutil

    from fagi_gis_spark.index.tiles import cell_id_col
    from fagi_gis_spark.operators.spatial_join import join_res_for_radius
    from fagi_gis_spark.registry import layers

    L = layers(spark, SF)
    z = join_res_for_radius(150.0)
    spark.sql("DROP TABLE IF EXISTS poi_b_cellbkt")
    shutil.rmtree("spark-warehouse/poi_b_cellbkt", ignore_errors=True)
    (
        L["poi_b"]
        .select(
            F.col("subject").alias("r_key"),
            F.col("lon").alias("r_lon"),
            F.col("lat").alias("r_lat"),
        )
        .withColumn("cell", cell_id_col(F.col("r_lon"), F.col("r_lat"), z))
        .write.bucketBy(8, "cell")
        .sortBy("cell")
        .mode("overwrite")
        .saveAsTable("poi_b_cellbkt")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        from fagi_gis_spark.operators.spatial_join import radius_join, radius_join_bucketed

        j = radius_join_bucketed(
            L["poi_a"], spark.table("poi_b_cellbkt"), 150.0
        ).select("l_key", "r_key")
        rows = j.collect()
        assert len(rows) > 0  # executes THIS queryExecution (AQE final)
        # and the storage-aware variant is output-identical to the
        # in-memory strategy
        plain = radius_join(L["poi_a"], L["poi_b"], 150.0).select("l_key", "r_key")
        assert set(map(tuple, rows)) == set(map(tuple, plain.collect()))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SelectedBucketsCount" in plan  # build side read via buckets
        # exactly ONE shuffle keyed on cell: the probe side aligning to
        # the bucket partitioning. The bucketed build side contributes
        # none (a second cell exchange would mean bucketing was ignored).
        # (The probe chain also holds the layer-dedup window exchange on
        # subject — unrelated to the join key.)
        final = plan.split("== Initial Plan ==")[0]  # AQE prints both
        assert final.count("Exchange hashpartitioning(cell") == 1, final[:3000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_knn_join_strategy_equivalence(spark):
    """kNN over any of the three candidate strategies (tile / hex / S2)
    returns identical (probe, neighbor, rank) sets — the strategies'
    output-identical contract carried through the top-k consumer."""
    import numpy as np

    from fagi_gis_spark.operators.spatial_join import knn_join

    rng = np.random.default_rng(41)
    n = 200
    rows = [
        (f"p{i}", float(12.0 + rng.uniform(0, 0.04)), float(47.0 + rng.uniform(0, 0.04)))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "subject string, lon double, lat double")
    results = {}
    for strat in ("tile", "hex", "s2"):
        out = knn_join(df, df, k=3, radius_m=400.0, exclude_self=True, strategy=strat)
        results[strat] = {
            (r.l_key, r.r_key, r.knn_rank) for r in out.collect()
        }
    assert results["tile"] == results["hex"] == results["s2"]
    assert len(results["tile"]) > 0


def test_parent_cell_col_exact_rollup(spark):
    """tiles.parent_cell_col is the EXACT quadtree ancestor: for any
    point, rolling its finest-z cell id up to a coarser z equals
    computing the cell id at that z directly (the invariant that lets
    knn_join_adaptive reuse one counts pass across doubling rounds)."""
    from fagi_gis_spark.index.tiles import cell_id_col, parent_cell_col

    pts = spark.range(5000).select(
        (F.lit(-179.9) + F.pmod(F.xxhash64("id"), F.lit(3_500_000)).cast("double") / 1e4).alias("lon"),
        (F.lit(-84.0) + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_680_000)).cast("double") / 1e4).alias("lat"),
    )
    for z_from, z_to in [(14, 14), (14, 12), (14, 9), (16, 7)]:
        mism = pts.select(
            parent_cell_col(cell_id_col(F.col("lon"), F.col("lat"), z_from), z_from, z_to).alias("up"),
            cell_id_col(F.col("lon"), F.col("lat"), z_to).alias("direct"),
        ).filter(F.col("up") != F.col("direct"))
        assert mism.isEmpty(), (z_from, z_to)


def test_precomputed_hot_cells_matches_detection(spark):
    """build_hot_cells run ONCE and passed via hot_cells= must produce
    the same salted plan and identical rows as per-join detection — the
    suite-level amortization contract (VERDICT r4 ask #1)."""
    from fagi_gis_spark.operators.spatial_join import build_hot_cells, radius_join

    left = spark.range(2000).select(
        F.concat(F.lit("h"), F.col("id")).alias("subject"),
        (F.lit(0.1) + (F.col("id") % 50).cast("double") / 1e6).alias("lon"),
        (F.lit(50.5) + ((F.col("id") * 7) % 50).cast("double") / 1e6).alias("lat"),
    ).unionByName(
        spark.range(500).select(
            F.concat(F.lit("t"), F.col("id")).alias("subject"),
            (F.lit(-0.9) + F.col("id").cast("double") * 31 / 1e6).alias("lon"),
            (F.lit(51.0) + F.col("id").cast("double") * 17 / 1e6).alias("lat"),
        )
    )
    right = left.withColumn("lon", F.col("lon") + 0.00002)

    hot = build_hot_cells(right, 50.0, strategy="tile", salt_threshold=100)
    assert hot is not None  # the pile really registers as hot
    pre = radius_join(left, right, 50.0, salt_threshold=100, hot_cells=hot)
    det = radius_join(left, right, 50.0, salt_threshold=100)
    assert "salt" in pre._jdf.queryExecution().executedPlan().toString()
    a = set(map(tuple, pre.select("l_key", "r_key").toPandas().itertuples(index=False)))
    b = set(map(tuple, det.select("l_key", "r_key").toPandas().itertuples(index=False)))
    assert a == b and len(a) > 2000

    # uniform layer: detection returns None (empty hot set) and the
    # explicit-None pass-through short-circuits to the plain join
    uniform = spark.range(1500).select(
        F.concat(F.lit("u"), F.col("id")).alias("subject"),
        (F.lit(-0.9) + F.col("id").cast("double") * 31 / 1e6).alias("lon"),
        (F.lit(51.0) + F.col("id").cast("double") * 17 / 1e6).alias("lat"),
    )
    assert build_hot_cells(uniform, 50.0, strategy="tile") is None
    plain = radius_join(uniform, uniform, 50.0, hot_cells=None)
    assert "salt" not in plain._jdf.queryExecution().executedPlan().toString()


def test_knn_adaptive_counts_rollup_matches_unsalted(spark):
    """knn_join_adaptive's one-scan skew reuse (finest-z counts + exact
    parent rollup per doubling round) returns the same neighbor set as
    a salting-free run on a skewed fixture."""
    from fagi_gis_spark.operators.spatial_join import knn_join_adaptive

    left = spark.range(1200).select(
        F.concat(F.lit("h"), F.col("id")).alias("subject"),
        (F.lit(0.1) + (F.col("id") % 40).cast("double") / 1e6).alias("lon"),
        (F.lit(50.5) + ((F.col("id") * 7) % 40).cast("double") / 1e6).alias("lat"),
    ).unionByName(
        spark.range(400).select(
            F.concat(F.lit("t"), F.col("id")).alias("subject"),
            (F.lit(-0.9) + F.col("id").cast("double") * 9000 / 1e6).alias("lon"),
            (F.lit(51.0) + F.col("id").cast("double") * 5000 / 1e6).alias("lat"),
        )
    )
    right = left.withColumn("lon", F.col("lon") + 0.00002)
    reused = knn_join_adaptive(left, right, k=2, init_radius_m=50.0, max_doublings=4)
    plain = knn_join_adaptive(
        left, right, k=2, init_radius_m=50.0, max_doublings=4, salt_threshold=None
    )
    a = {(r.l_key, r.r_key, r.knn_rank) for r in reused.collect()}
    b = {(r.l_key, r.r_key, r.knn_rank) for r in plain.collect()}
    assert a == b and len(a) > 1000


def test_materialized_layers_equal_fresh_derivation(spark, tmp_path):
    """The bootstrap-once import (S4 materialization) must be row-identical
    to deriving the layers in-plan, including the precedence dedup baked
    into the stored poi_a, and a second call must reuse the written tables
    (memo hit — same DataFrame content, no rewrite)."""
    import os

    from fagi_gis_spark.operators.dedup_precedence import precedence_dedup
    from fagi_gis_spark.sources.layers import (
        MATERIALIZED_LAYER_KEYS,
        materialized_layers,
        spark_layers,
    )

    root = str(tmp_path / "layer_cache")
    mat = materialized_layers(spark, SF, cache_root=root)
    fresh = spark_layers(spark, SF)
    fresh["poi_a"] = precedence_dedup(fresh["poi_a_raw"])
    for k in MATERIALIZED_LAYER_KEYS:
        assert mat[k].exceptAll(fresh[k]).isEmpty(), k
        assert fresh[k].exceptAll(mat[k]).isEmpty(), k

    (base,) = [d for d in os.listdir(root) if not d.endswith(".tmp")]
    mtime = os.path.getmtime(os.path.join(root, base))
    again = materialized_layers(spark, SF, cache_root=root)
    assert os.path.getmtime(os.path.join(root, base)) == mtime  # no rewrite
    assert again["poi_a"].count() == mat["poi_a"].count()


def test_incremental_minhash_equals_full_batch(spark):
    """Day-2 dedup contract: a new batch deduped against itself + the
    persisted corpus index must emit EXACTLY the full-batch LSH pairs
    restricted to pairs touching a new doc (same jaccard_est values),
    with pair_type telling the two origins apart."""
    import shutil

    from fagi_gis_spark.functions.dedup import (
        build_minhash_index,
        incremental_minhash_pairs,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    for t in ("test_mh_idx_buckets", "test_mh_idx_sigs", "test_mh_idx_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    build_minhash_index(minhash_signatures(corpus), "test_mh_idx")

    inc = incremental_minhash_pairs(
        minhash_signatures(new), "test_mh_idx", jaccard_threshold=0.35
    )
    rows = inc.collect()
    full = minhash_lsh_pairs(
        minhash_signatures(docs), jaccard_threshold=0.35
    ).collect()
    want = {
        (r.doc_a, r.doc_b, r.jaccard_est)
        for r in full
        if r.doc_a % 5 == 0 or r.doc_b % 5 == 0
    }
    got = {(r.doc_a, r.doc_b, r.jaccard_est) for r in rows}
    assert got == want and len(got) > 0
    for r in rows:
        expect = "new_new" if (r.doc_a % 5 == 0 and r.doc_b % 5 == 0) else "new_corpus"
        assert r.pair_type == expect
    assert any(r.pair_type == "new_corpus" for r in rows)


def test_incremental_minhash_corpus_side_reads_buckets(spark):
    """The candidate join against the stored index must read the corpus
    side through its storage buckets: exactly one (band, bucket)
    exchange — the new batch aligning to the bucket layout.  A second
    one would mean the 100 TB corpus reshuffles on every day-2 batch."""
    from fagi_gis_spark.functions.dedup import (
        _band_buckets,
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    # index tables exist from the preceding test (same session) or are
    # rebuilt here
    if not spark.catalog.tableExists("test_mh_idx_buckets"):
        from fagi_gis_spark.functions.dedup import build_minhash_index

        build_minhash_index(
            minhash_signatures(docs.filter(F.col("doc_id") % 5 != 0)), "test_mh_idx"
        )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        nb = _band_buckets(minhash_signatures(new), 16, 4)
        j = (
            nb.select("band", "bucket", F.col("doc_id").alias("doc_n"))
            .join(
                spark.table("test_mh_idx_buckets").select(
                    "band", "bucket", F.col("doc_id").alias("doc_c")
                ),
                ["band", "bucket"],
            )
            .select("doc_n", "doc_c")
        )
        assert j.count() > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        # NOTE: do not split at "== Initial Plan ==" — when a previous
        # test left the probe-side signatures persisted, the probe scan
        # is an InMemoryRelation whose NESTED cached AQE plan prints its
        # own Final/Initial sections before the corpus scan line, and a
        # prefix split would cut the plan before the corpus side.  The
        # nested sections contain only the signature computation (a
        # round-robin exchange), so asserting over the full string is
        # exact: the corpus side reads through its storage buckets and
        # the ONE (band, bucket) exchange is the new batch aligning.
        assert "SelectedBucketsCount" in plan
        assert plan.count("Exchange hashpartitioning(band") == 1, plan[:3000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_minhash_index_append_grows_corpus(spark):
    """Day-3 contract: after folding batch-1 into the index, batch-2's
    incremental pairs against the grown index equal the full-batch LSH
    pairs over (corpus ∪ batch1 ∪ batch2) restricted to pairs touching
    batch-2 — i.e. append keeps the index exactly equivalent to a
    from-scratch rebuild."""
    import shutil

    from fagi_gis_spark.functions.dedup import (
        append_to_minhash_index,
        build_minhash_index,
        incremental_minhash_pairs,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 5 > 1)      # 60%
    batch1 = docs.filter(F.col("doc_id") % 5 == 1)     # 20%
    batch2 = docs.filter(F.col("doc_id") % 5 == 0)     # 20%
    for t in ("test_mh_app_buckets", "test_mh_app_sigs", "test_mh_app_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    build_minhash_index(minhash_signatures(corpus), "test_mh_app")
    append_to_minhash_index(minhash_signatures(batch1), "test_mh_app")

    inc = incremental_minhash_pairs(
        minhash_signatures(batch2), "test_mh_app", jaccard_threshold=0.35
    )
    got = {(r.doc_a, r.doc_b, r.jaccard_est) for r in inc.collect()}
    full = minhash_lsh_pairs(
        minhash_signatures(docs), jaccard_threshold=0.35
    ).collect()
    want = {
        (r.doc_a, r.doc_b, r.jaccard_est)
        for r in full
        if r.doc_a % 5 == 0 or r.doc_b % 5 == 0
    }
    assert got == want and len(got) > 0


def test_incremental_exact_dups_against_digest_index(spark):
    """Exact-family day-2: a new batch's duplicates against itself and
    the stored digest index equal the full digest self-join restricted
    to new docs (fixture carries cross-set and in-batch dup texts)."""
    import shutil

    import pandas as pd

    from fagi_gis_spark.functions.dedup import (
        build_digest_index,
        incremental_exact_dups,
    )

    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 10, 11, 12, 13],
            "text": [
                "alpha beta", "unique one", "Alpha  Beta ", "unique two",
                # new batch (>= 10): one corpus dup (normalized), one
                # in-batch dup pair, one unique
                "ALPHA\tbeta", "same same", "same  SAME", "nothing else",
            ],
        }
    )
    docs = spark.createDataFrame(rows)
    corpus = docs.filter(F.col("doc_id") < 10)
    new = docs.filter(F.col("doc_id") >= 10)
    spark.sql("DROP TABLE IF EXISTS test_dg_idx_digests")
    shutil.rmtree("spark-warehouse/test_dg_idx_digests", ignore_errors=True)
    build_digest_index(corpus, "test_dg_idx")

    got = {
        (r.doc_a, r.doc_b, r.pair_type)
        for r in incremental_exact_dups(new, "test_dg_idx").collect()
    }
    # doc 10 matches corpus docs 1 and 3 (same normalized digest);
    # 11-12 are an in-batch pair; 13 matches nothing
    assert got == {
        (1, 10, "new_corpus"),
        (3, 10, "new_corpus"),
        (11, 12, "new_new"),
    }


def test_incremental_hamming_equals_full_batch(spark):
    """Banded-hamming day-2 (the SimHash/pHash family): a new batch
    against itself + the stored band index equals the full-batch
    simhash_near_pairs restricted to pairs touching a new doc, with the
    same exact hamming values."""
    import shutil

    from fagi_gis_spark.functions.dedup import (
        build_hamming_index,
        incremental_hamming_pairs,
        simhash_near_pairs,
        simhash_signatures,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sigs = simhash_signatures(docs).persist()
    corpus = sigs.filter(F.col("doc_id") % 5 != 0)
    new = sigs.filter(F.col("doc_id") % 5 == 0)
    for t in ("test_hm_idx_bands", "test_hm_idx_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    build_hamming_index(corpus, "test_hm_idx", max_hamming=6)

    got = {
        (r.doc_a, r.doc_b, r.hamming, r.pair_type)
        for r in incremental_hamming_pairs(new, "test_hm_idx", max_hamming=6).collect()
    }
    full = simhash_near_pairs(sigs, max_hamming=6).collect()
    want = {
        (
            r.doc_a,
            r.doc_b,
            r.hamming,
            "new_new" if (r.doc_a % 5 == 0 and r.doc_b % 5 == 0) else "new_corpus",
        )
        for r in full
        if r.doc_a % 5 == 0 or r.doc_b % 5 == 0
    }
    assert got == want and len(got) > 0
    assert any(t == "new_corpus" for (_, _, _, t) in got)


def test_index_layout_mismatch_raises(spark):
    """Querying a day-2 index with different banding parameters than it
    was built with must raise (a mismatched layout joins almost no
    corpus keys — silent recall loss), and re-ingested ids must not
    emit self-pairs."""
    import shutil

    import pytest as _pytest

    from fagi_gis_spark.functions.dedup import (
        build_hamming_index,
        incremental_hamming_pairs,
        incremental_minhash_pairs,
        minhash_signatures,
        simhash_signatures,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sigs = simhash_signatures(docs.filter(F.col("doc_id") < 100))
    for t in ("test_lay_idx_bands", "test_lay_idx_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    build_hamming_index(sigs, "test_lay_idx", max_hamming=3)
    with _pytest.raises(ValueError, match="max_hamming=3"):
        incremental_hamming_pairs(sigs, "test_lay_idx", max_hamming=6).collect()
    # re-ingesting the SAME ids yields no self-pairs
    same = incremental_hamming_pairs(sigs, "test_lay_idx", max_hamming=3)
    assert same.filter(F.col("doc_a") == F.col("doc_b")).count() == 0
    # minhash layout guard (test_mh_idx built by the earlier test at the
    # default 16x4 layout, or rebuilt here)
    if not spark.catalog.tableExists("test_mh_idx_meta"):
        from fagi_gis_spark.functions.dedup import build_minhash_index

        build_minhash_index(
            minhash_signatures(docs.filter(F.col("doc_id") % 5 != 0)), "test_mh_idx"
        )
    with _pytest.raises(ValueError, match="bands=16"):
        incremental_minhash_pairs(
            minhash_signatures(docs.limit(20)), "test_mh_idx", bands=8, rows_per_band=8
        ).collect()


def test_substring_dup_stats_matches_bruteforce(spark):
    """Engine substring-dup stats == a per-corpus brute-force (dict of all
    k-windows) on handcrafted docs with cross-doc, same-doc, and
    overlapping-run duplicates."""
    from collections import Counter

    from fagi_gis_spark.functions.dedup import substring_dup_stats

    k = 10
    texts = {
        1: "the quick brown fox jumps over the lazy dog once",
        2: "xx the quick brown fox sat still yy",   # shares a run with 1
        3: "zzzzzzzzzzzzzzzzzzzz",                  # self-repeating run
        4: "completely unique text w/o any repeats",
        5: "short",                                  # < k: no windows
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    wins = Counter()
    for t in texts.values():
        for i in range(len(t) - k + 1):
            wins[t[i : i + k]] += 1
    want = {}
    for did, t in texts.items():
        pos = [i for i in range(len(t) - k + 1) if wins[t[i : i + k]] >= 2]
        if not pos:
            continue
        cov = set()
        for p in pos:
            cov.update(range(p, p + k))
        want[did] = (len(pos), len(cov))
    got = {
        r.doc_id: (r.dup_windows, r.dup_chars)
        for r in substring_dup_stats(docs, k=k).collect()
    }
    assert got == want
    assert 3 in got and 4 not in got and 5 not in got


def test_stratified_sample_partition_invariant(spark):
    """The hash-gated stratified sample is a function of the data alone:
    identical kept sets at 1 and 13 partitions; over-mean strata shrink,
    under-mean strata keep every row."""
    from fagi_gis_spark.functions.text import stratified_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {
        (r.doc_id, r.lang)
        for r in stratified_sample(docs.repartition(1), "lang").collect()
    }
    b = {
        (r.doc_id, r.lang)
        for r in stratified_sample(docs.repartition(13), "lang").collect()
    }
    assert a == b and len(a) > 0
    cnts = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    cap = sum(cnts.values()) // len(cnts)
    kept = {}
    for _, lang in a:
        kept[lang] = kept.get(lang, 0) + 1
    for lang, n in cnts.items():
        if n <= cap:
            assert kept.get(lang, 0) == n          # under-mean: all kept
        else:
            assert kept.get(lang, 0) < n           # over-mean: downsampled


def test_incremental_cosine_equals_full_batch(spark):
    """Embedding-cosine day-2 (the fourth incremental-dedup quadrant): a
    new batch against itself + the stored hyperplane-bucket index equals
    the full-batch cosine_near_dup_pairs(blocking='lsh') restricted to
    pairs touching a new vector, with bit-identical cos_sim — new-side
    multiprobe covers both probe directions (flip adjacency is
    symmetric).  Layout comes from the index meta; mismatch impossible
    by construction (no caller-supplied layout)."""
    import shutil

    from fagi_gis_spark.functions.ann import (
        build_cosine_index,
        cosine_near_dup_pairs,
        incremental_cosine_pairs,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    for t in ("test_cs_idx_buckets", "test_cs_idx_vecs", "test_cs_idx_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    build_cosine_index(corpus, "test_cs_idx", bits_per_table=6)

    thr = 0.3  # synthetic embeddings: neighbor cos ~0.29-0.4
    got = {
        (r.id_a, r.id_b, round(r.cos_sim, 12), r.pair_type)
        for r in incremental_cosine_pairs(new, "test_cs_idx", threshold=thr).collect()
    }
    full = cosine_near_dup_pairs(
        emb, threshold=thr, blocking="lsh", bits_per_table=6
    ).collect()
    want = {
        (
            r.id_a,
            r.id_b,
            round(r.cos_sim, 12),
            "new_new" if (r.id_a % 5 == 0 and r.id_b % 5 == 0) else "new_corpus",
        )
        for r in full
        if r.id_a % 5 == 0 or r.id_b % 5 == 0
    }
    assert got == want and len(got) > 0
    assert any(t == "new_corpus" for (_, _, _, t) in got)
    # re-ingesting ids already in the index emits no self-pairs
    same = incremental_cosine_pairs(corpus.limit(20), "test_cs_idx", threshold=thr)
    assert same.filter(F.col("id_a") == F.col("id_b")).count() == 0
    # the corpus side of the candidate join reads pre-bucketed storage
    plan = incremental_cosine_pairs(new, "test_cs_idx", threshold=thr)._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount" in plan


def test_stream_incremental_cosine_matches_batch(spark, tmp_path):
    """Streaming day-2 for the embedding family: arriving vectors vs the
    stored hyperplane-bucket index equal the batch incremental path's
    new-corpus pairs exactly (same cos_sim) — the whole plan is
    stateless stream-static joins plus one per-pair collapse."""
    from fagi_gis_spark.functions.ann import (
        build_cosine_index,
        incremental_cosine_pairs,
    )
    from fagi_gis_spark.streaming.windowed import (
        start_memory_sink,
        stream_incremental_cosine,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")
    corpus = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    if not spark.catalog.tableExists("test_cs_idx_meta"):
        # standalone run in a fresh session: stale warehouse dirs from a
        # previous run are invisible to the in-memory catalog but block
        # saveAsTable — clear them before building
        import shutil

        for t in ("test_cs_idx_buckets", "test_cs_idx_vecs", "test_cs_idx_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
        build_cosine_index(corpus, "test_cs_idx", bits_per_table=6)

    src = str(tmp_path / "vec_stream_src")
    new.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(new.schema).parquet(src)
    out = stream_incremental_cosine(stream, "test_cs_idx", threshold=0.3)
    q = start_memory_sink(out, "cs_day2_out", output_mode="complete")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.vec_n, r.vec_c, round(r.cos_sim, 12))
        for r in spark.sql("SELECT * FROM cs_day2_out").collect()
    }
    want = {
        (
            r.id_a if r.id_a % 5 == 0 else r.id_b,
            r.id_b if r.id_a % 5 == 0 else r.id_a,
            round(r.cos_sim, 12),
        )
        for r in incremental_cosine_pairs(new, "test_cs_idx", threshold=0.3)
        .filter(F.col("pair_type") == "new_corpus")
        .collect()
    }
    assert got == want and len(got) > 0
