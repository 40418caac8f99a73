"""Geometry import (S3): serialization auto-detection + WGS point
synthesis + linked-only restriction + precedence dedup.

Reference flow (/root/reference/fagi-gis/src/main/java/gr/athenainnovation/imis/fusion/gis/core/Importer.java:190-426):
ASK-probe whether the dataset carries WGS84 point properties
(geo:lat / geo:long, Constants.java:40-41, probe :479-507) or GeoSPARQL
WKT (hasGeometry -> asWKT, probe :509-538); WGS rows synthesize
``POINT (long lat)`` text (:316-318); only *linked* subjects import
(:222-287); one geometry per subject by type precedence (:306-379).

Spark-first: probes are `limit(1)` scans; synthesis is a self-join of the
lat and long triples; linked-only is a semi-join; precedence dedup is the
window operator (operators.dedup_precedence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fagi_gis_spark.operators.dedup_precedence import precedence_dedup
from fagi_gis_spark.operators.spatial_join import linked_semi_join

WGS_LAT = "http://www.w3.org/2003/01/geo/wgs84_pos#lat"
WGS_LONG = "http://www.w3.org/2003/01/geo/wgs84_pos#long"
GEOSPARQL_WKT = "http://www.opengis.net/ont/geosparql#asWKT"


def detect_serialization(triples: DataFrame) -> str:
    """The ASK-probe analog: 'wgs', 'wkt', or 'none'."""
    if not triples.filter(F.col("predicate") == WGS_LAT).limit(1).isEmpty():
        return "wgs"
    if not triples.filter(F.col("predicate") == GEOSPARQL_WKT).limit(1).isEmpty():
        return "wkt"
    return "none"


def synth_wgs_points(triples: DataFrame) -> DataFrame:
    """WGS lat/long property pairs -> (subject, geom_wkt) with the
    reference's exact text form ``POINT (long lat)`` (Importer.java:316-318)."""
    lat = triples.filter(F.col("predicate") == WGS_LAT).select(
        "subject", F.col("object").alias("lat_s")
    )
    lon = triples.filter(F.col("predicate") == WGS_LONG).select(
        "subject", F.col("object").alias("lon_s")
    )
    return lat.join(lon, "subject", "inner").select(
        "subject",
        F.concat(F.lit("POINT ("), F.col("lon_s"), F.lit(" "), F.col("lat_s"), F.lit(")")).alias(
            "geom_wkt"
        ),
    )


def wkt_geometries(triples: DataFrame) -> DataFrame:
    """GeoSPARQL serialization: subject -> asWKT literal (the blank-node
    hop hasGeometry -> asWKT is flattened by the chain join upstream)."""
    return triples.filter(F.col("predicate") == GEOSPARQL_WKT).select(
        "subject", F.col("object").alias("geom_wkt")
    )


def import_geometries(
    triples: DataFrame, links: DataFrame, side: str, linked_only: bool = True
) -> DataFrame:
    """The full S3 pipeline: detect -> extract/synthesize -> restrict to
    linked subjects -> one geometry per subject by precedence."""
    ser = detect_serialization(triples)
    if ser == "wgs":
        geoms = synth_wgs_points(triples)
    elif ser == "wkt":
        geoms = wkt_geometries(triples)
    else:
        raise ValueError("no geometry serialization detected")
    if linked_only:
        geoms = linked_semi_join(geoms, links, side)
    return precedence_dedup(geoms)
