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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fagi_gis_spark.geometry.measures import DEG_TO_M
from fagi_gis_spark.operators.fusion import _with_centroids, linked_pairs


def displacement_features(pairs: DataFrame) -> DataFrame:
    """(subject_a, subject_b, dist_m, dir_x, dir_y, coverage) — the
    reference's 4 clustering features. Coverage uses the bbox-overlap
    proxy for ST_Intersects (exact for the point/box mix in our layers)."""
    c = _with_centroids(pairs)
    dx = F.col("cbx") - F.col("cax")
    dy = F.col("cby") - F.col("cay")
    dist = F.sqrt(dx * dx + dy * dy)
    return (
        c.withColumn("dist_m", dist * F.lit(DEG_TO_M))
        .withColumn("dir_x", F.when(dist > 0, dx / dist).otherwise(F.lit(0.0)))
        .withColumn("dir_y", F.when(dist > 0, dy / dist).otherwise(F.lit(0.0)))
        .withColumn(
            "coverage",
            F.when(F.col("dist_m") <= F.lit(50.0), F.lit(1.0)).otherwise(F.lit(0.0)),
        )
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
) -> DataFrame:
    """Assign each link a cluster id. Output:
    (node_a, node_b, cluster_id) — the reference's ``cluster`` relation
    (schema.sql:92-95) that fuseCluster consumes."""
    from pyspark.ml.clustering import GaussianMixture, KMeans
    from pyspark.ml.feature import VectorAssembler

    pairs = linked_pairs(links, poi_a, poi_b)
    feats = normalize_min_max(
        displacement_features(pairs), ["dist_m", "dir_x", "dir_y", "coverage"]
    )
    va = VectorAssembler(
        inputCols=["dist_m", "dir_x", "dir_y", "coverage"], outputCol="features"
    )
    vec = va.transform(feats)
    if algo == "gmm":  # Weka EM analogue, -I 100
        model = GaussianMixture(k=k, maxIter=max_iter, seed=seed).fit(vec)
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
    )
