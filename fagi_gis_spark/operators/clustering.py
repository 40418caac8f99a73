"""Link clustering by geometric displacement features — SURVEY.md §2.6 A7.

Reference (/root/reference/fagi-gis/src/main/java/gr/athenainnovation/imis/fusion/gis/clustering/GeoClusterer.java):
features per linked pair = centroid-displacement length
(calculateDistance:255-287, metric SRID), displacement unit vector
(calculateDirection:289-324), ST_Intersects coverage bit
(calculateCoverage:326-354); min-max normalized (normalize:91-98,
rangeChange:69-79); clustered with Weka EM (-I 100, optional -N k,
cluster:100-253). Spark-first: features as columns over the J3 pair join,
MLlib GaussianMixture (EM for mixtures; KMeans option mirrors the
commented-out reference path GeoClusterer.java:227).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fagi_gis_spark.geometry.measures import DEG_TO_M
from fagi_gis_spark.operators.fusion import _with_centroids, linked_pairs


@F.pandas_udf(T.DoubleType())
def u_intersects(wkt_a: pd.Series, wkt_b: pd.Series) -> pd.Series:
    """CAST(ST_Intersects(a_g, b_g) AS integer) — the real JTS relate
    predicate (GeoClusterer.calculateCoverage:326-354), not a distance
    proxy. Called only for envelope-overlapping pairs (see
    displacement_features), so the per-row parse touches a small subset."""
    from fagi_gis_spark.geometry.topology import intersects
    from fagi_gis_spark.geometry.wkt import parse_wkt

    out = []
    for a, b in zip(wkt_a, wkt_b):
        ga = parse_wkt(a) if a else None
        gb = parse_wkt(b) if b else None
        if ga is None or gb is None:
            out.append(0.0)
            continue
        try:
            out.append(1.0 if intersects(ga, gb) else 0.0)
        except ValueError:
            out.append(0.0)
    return pd.Series(out, dtype="float64")


def displacement_features(pairs: DataFrame, metric_srid: int | None = None) -> DataFrame:
    """(subject_a, subject_b, dist_m, dir_x, dir_y, coverage) — the
    reference's 4 clustering features. Coverage is the REAL
    ST_Intersects bit: pairs whose envelopes are disjoint short-circuit
    to 0 in pure JVM column math (disjoint envelopes => disjoint
    geometries), and only the remaining candidates run the relate
    kernel. Pairs from ``linked_pairs(..., feature_primitives=True)``
    carry the envelopes; ad-hoc pair tables fall back to running the
    kernel on every row."""
    c = _with_centroids(pairs)
    dx = F.col("cbx") - F.col("cax")
    dy = F.col("cby") - F.col("cay")
    dist = F.sqrt(dx * dx + dy * dy)
    if metric_srid is not None:
        # the reference's exact frame: ST_Distance of the two centroids
        # AFTER ST_Transform(geom, 2163) (GeoClusterer.calculateDistance:257)
        from fagi_gis_spark.operators.fusion import u_metric_centroid_dist

        dist_m_col = u_metric_centroid_dist(metric_srid)(F.col("wkt_a"), F.col("wkt_b"))
    else:
        dist_m_col = dist * F.lit(DEG_TO_M)
    if "__pa" in c.columns:
        env_disjoint = (
            (F.col("__pa.maxx") < F.col("__pb.minx"))
            | (F.col("__pb.maxx") < F.col("__pa.minx"))
            | (F.col("__pa.maxy") < F.col("__pb.miny"))
            | (F.col("__pb.maxy") < F.col("__pa.miny"))
        )
        coverage = F.when(
            env_disjoint | F.col("__pa.gtype").isNull() | F.col("__pb.gtype").isNull(),
            F.lit(0.0),
        ).otherwise(u_intersects(F.col("wkt_a"), F.col("wkt_b")))
    else:
        coverage = u_intersects(F.col("wkt_a"), F.col("wkt_b"))
    return (
        c.withColumn("dist_m", dist_m_col)
        .withColumn("dir_x", F.when(dist > 0, dx / dist).otherwise(F.lit(0.0)))
        .withColumn("dir_y", F.when(dist > 0, dy / dist).otherwise(F.lit(0.0)))
        .withColumn("coverage", coverage)
        .select("subject_a", "subject_b", "dist_m", "dir_x", "dir_y", "coverage")
    )


def normalize_min_max(feats: DataFrame, cols: list[str]) -> DataFrame:
    """Min-max rescale to [0,1] (GeoClusterer.normalize:91-98) — one
    distributed agg, no driver loops."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    stats = feats.agg(*aggs)
    out = feats.crossJoin(F.broadcast(stats))
    for c in cols:
        rng = F.col(f"__max_{c}") - F.col(f"__min_{c}")
        out = out.withColumn(
            c, F.when(rng > 0, (F.col(c) - F.col(f"__min_{c}")) / rng).otherwise(F.lit(0.0))
        )
    return out.drop(*[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])


def cluster_links(
    links: DataFrame,
    poi_a: DataFrame,
    poi_b: DataFrame,
    k: int = 4,
    algo: str = "gmm",
    seed: int = 42,
    max_iter: int = 100,
    tol: float = 0.01,
    metric_srid: int | None = None,
) -> DataFrame:
    """Assign each link a cluster id. Output:
    (node_a, node_b, cluster_id) — the reference's ``cluster`` relation
    (schema.sql:92-95) that fuseCluster consumes.

    Fit cost is bounded explicitly (the r3 replay spent 34s here): the
    assembled feature table is PERSISTED before the EM loop — without
    it every EM iteration re-executes the feature lineage (two layer
    joins + the displacement/coverage kernels); ``max_iter=100`` +
    ``tol`` mirror Weka EM's -I 100 / minLogLikelihoodImprovement stop
    (GeoClusterer.java:100-253).  Deliberately NOT repartitioned: GMM's
    initialization is partition-layout-dependent, and an r4 coalesce(8)
    produced a near-singular component whose dsyev eigensolve spun for
    half an hour in LAPACK dlascl — keep the natural layout the fit has
    been stable on since r1."""
    from pyspark.ml.clustering import GaussianMixture, KMeans
    from pyspark.ml.feature import VectorAssembler

    pairs = linked_pairs(links, poi_a, poi_b, feature_primitives=True)
    feats = normalize_min_max(
        displacement_features(pairs, metric_srid=metric_srid),
        ["dist_m", "dir_x", "dir_y", "coverage"],
    )
    va = VectorAssembler(
        inputCols=["dist_m", "dir_x", "dir_y", "coverage"], outputCol="features"
    )
    vec = va.transform(feats).persist()
    try:
        if algo == "gmm":  # Weka EM analogue, -I 100
            model = GaussianMixture(k=k, maxIter=max_iter, tol=tol, seed=seed).fit(vec)
        elif algo == "kmeans":  # the commented-out reference option
            model = KMeans(k=k, maxIter=max_iter, seed=seed).fit(vec)
        else:
            raise ValueError(algo)
        return (
            model.transform(vec)
            .select(
                F.col("subject_a").alias("node_a"),
                F.col("subject_b").alias("node_b"),
                F.col("prediction").cast("int").alias("cluster_id"),
            )
            .localCheckpoint()
        )
    finally:
        vec.unpersist()
