"""One-geometry-per-subject precedence dedup (ingest-time).

Reference: geometry-type precedence MULTIPOLYGON(0) > POLYGON(1) >
MULTILINESTRING(2) > LINESTRING(3) > MULTIPOINT(4) > POINT(5), lower
wins — /root/reference/fagi-gis/src/main/java/gr/athenainnovation/imis/fusion/gis/utils/Constants.java:85-95,
applied with driver-side HashMaps in core/Importer.java:306-379.

Spark-first: a window ``row_number() OVER (PARTITION BY subject ORDER BY
precedence, geom_wkt)`` — fully distributed, no driver state; the extra
``geom_wkt`` sort key makes ties deterministic (the reference's HashMap
iteration order is not). This is the engine's only window operator, and
it runs map-side cheap: partition count follows the shuffle setting and
AQE coalesces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PRECEDENCE = [
    ("MULTIPOLYGON", 0),
    ("POLYGON", 1),
    ("MULTILINESTRING", 2),
    ("LINESTRING", 3),
    ("MULTIPOINT", 4),
    ("POINT", 5),
]


def gtype_col(wkt: Column) -> Column:
    """Geometry type from canonical WKT — JVM regexp, no Python."""
    return F.regexp_extract(wkt, r"^([A-Z]+)", 1)


def precedence_col(wkt: Column) -> Column:
    gt = gtype_col(wkt)
    expr = F.lit(6)
    for name, p in reversed(_PRECEDENCE):
        expr = F.when(gt == name, p).otherwise(expr)
    return expr


def precedence_dedup(poi_raw: DataFrame, subject_col: str = "subject") -> DataFrame:
    """Keep exactly one geometry per subject by type precedence."""
    w = Window.partitionBy(subject_col).orderBy(
        precedence_col(F.col("geom_wkt")), F.col("geom_wkt")
    )
    return (
        poi_raw.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
