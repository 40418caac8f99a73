"""Fused write-back — S5 of the operator inventory.

Reference: VirtuosoImporter.importGeometriesToVirtuoso
(/root/reference/fagi-gis/src/main/java/gr/athenainnovation/imis/fusion/gis/virtuoso/VirtuosoImporter.java:481-552):
SELECT DISTINCT over fused_geometries, pick the dominant subject, DELETE
the subject's old WGS/geometry triples, INSERT the new WKT triple.
"Keep both" relies on a first-row-delete-then-append order (:511-529) —
nondeterministic in the reference; here both rows survive deterministically
(documented divergence, SURVEY.md §2.9).

Spark-first: delete-then-insert on a triple store becomes one plan —
  new_geoms  = fused.dropDuplicates -> (dom_subject, asWKT, wkt)
  kept_old   = triples anti-join (geo predicates of fused subjects)
  result     = kept_old UNION new_geoms
which is exactly an Iceberg MERGE/dynamic-overwrite by subject at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GEO_WKT_PRED = "http://www.opengis.net/ont/geosparql#asWKT"
GEO_PREDICATES_RX = r"(asWKT|hasGeometry|wgs84_pos#lat|wgs84_pos#long)"


def geometry_triples(fused: DataFrame, dominant: str = "a") -> DataFrame:
    """DISTINCT fused rows -> geometry triples on the dominant subject."""
    dom = F.col("subject_a") if dominant == "a" else F.col("subject_b")
    return (
        fused.select(
            dom.alias("subject"),
            F.lit(GEO_WKT_PRED).alias("predicate"),
            F.col("geom_wkt").alias("object"),
        )
        # triple-set semantics: inserting the same triple twice is a no-op
        # in an RDF store, so duplicate-target links collapse here
        .dropDuplicates()
    )


def write_back(triples: DataFrame, fused: DataFrame, dominant: str = "a") -> DataFrame:
    """The post-write-back triple table: old geometry triples of fused
    subjects removed, new WKT triples appended (delete-then-insert as one
    declarative plan)."""
    new_geoms = geometry_triples(fused, dominant)
    fused_subjects = new_geoms.select("subject").dropDuplicates()
    old_geo = F.col("predicate").rlike(GEO_PREDICATES_RX)
    kept = triples.join(
        fused_subjects.withColumnRenamed("subject", "__fs"),
        (F.col("subject") == F.col("__fs")),
        "left",
    ).filter(~(old_geo & F.col("__fs").isNotNull())).drop("__fs")
    return kept.select("subject", "predicate", "object").unionByName(new_geoms)
