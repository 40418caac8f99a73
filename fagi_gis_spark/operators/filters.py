"""Validated user-supplied link filters — the SPARQL-filter surface.

Reference: SPARQLFilterServlet accepts a user SPARQL filter and
syntax-validates that it binds ``?subjectA ?subjectB``
(/root/reference/fagi-gis-service/src/main/java/gr/athenainnovation/imis/fusion/gis/servlets/SPARQLFilterServlet.java:295-339).
Spark-first: the filter becomes a validated SQL predicate applied to the
pair view (links ⋈ A ⋈ B with distance columns) — Catalyst pushes it
down; validation whitelists column references and rejects statements.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fagi_gis_spark.geometry.measures import DEG_TO_M

#: columns a user predicate may reference (the ?subjectA/?subjectB analog)
ALLOWED_COLUMNS = {
    "node_a", "node_b", "lon_a", "lat_a", "lon_b", "lat_b", "dist_m",
}
_FORBIDDEN = re.compile(r";|--|/\*|\b(select|insert|update|delete|drop|create|merge)\b", re.I)
_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_SQL_WORDS = {
    "and", "or", "not", "like", "in", "between", "is", "null", "true",
    "false", "case", "when", "then", "else", "end", "cast", "as", "double",
    "bigint", "string", "abs", "sqrt", "least", "greatest",
}


def validate_filter(predicate: str) -> None:
    """Reject anything but a boolean expression over the pair view —
    the analog of the reference's ?subjectA/?subjectB syntax check."""
    if _FORBIDDEN.search(predicate):
        raise ValueError("filter must be a boolean expression, not a statement")
    idents = {m.group(0).lower() for m in _IDENT.finditer(predicate)}
    cols = idents - _SQL_WORDS
    unknown = {c for c in cols if c not in ALLOWED_COLUMNS and not c.isdigit()}
    if unknown - {"a", "b"}:
        raise ValueError(f"filter references unknown columns: {sorted(unknown)}")
    if not ({"node_a", "node_b"} & idents or "dist_m" in idents):
        raise ValueError("filter must reference the link pair (node_a/node_b/dist_m)")


def pair_view(links: DataFrame, poi_a: DataFrame, poi_b: DataFrame) -> DataFrame:
    a = poi_a.select(
        F.col("subject").alias("node_a"), F.col("lon").alias("lon_a"), F.col("lat").alias("lat_a")
    )
    b = poi_b.select(
        F.col("subject").alias("node_b"), F.col("lon").alias("lon_b"), F.col("lat").alias("lat_b")
    )
    j = links.join(a, "node_a", "inner").join(b, "node_b", "inner")
    dist = (
        F.sqrt(
            (F.col("lon_a") - F.col("lon_b")) * (F.col("lon_a") - F.col("lon_b"))
            + (F.col("lat_a") - F.col("lat_b")) * (F.col("lat_a") - F.col("lat_b"))
        )
        * F.lit(DEG_TO_M)
    )
    return j.withColumn("dist_m", dist)


def filter_links(
    links: DataFrame, poi_a: DataFrame, poi_b: DataFrame, predicate: str
) -> DataFrame:
    """Apply a validated user predicate to the pair view; returns the
    surviving links."""
    validate_filter(predicate)
    return pair_view(links, poi_a, poi_b).filter(F.expr(predicate)).select("node_a", "node_b")
