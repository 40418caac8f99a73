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
