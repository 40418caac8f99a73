"""N-Triples sources — S1/S2 of the operator inventory.

Reference: GeometryFuser.parseLinksFile reads an N-Triples links file with
Jena and keeps the subject/object of every ``owl:sameAs`` statement
(/root/reference/fagi-gis/src/main/java/gr/athenainnovation/imis/fusion/gis/core/GeometryFuser.java:155-180;
the sameAs requirement: utils/Constants.java:49, cli/FusionGISCLI.java:52).
Spark-first: N-Triples is line-oriented, so ``spark.read.text`` +
``regexp_extract`` — a distributed scan, no RDF library needed for the
link/triple subsets FAGI consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OWL_SAME_AS = "http://www.w3.org/2002/07/owl#sameAs"

_LINK_RX = r"^\s*<([^>]+)>\s*<" + OWL_SAME_AS.replace("/", "/") + r">\s*<([^>]+)>\s*\.\s*$"
_TRIPLE_RX = r"^\s*<([^>]+)>\s*<([^>]+)>\s*(.+?)\s*\.\s*$"


def read_links_nt(spark: SparkSession, path: str) -> DataFrame:
    """Parse owl:sameAs statements -> links(node_a, node_b)."""
    lines = spark.read.text(path)
    return (
        lines.select(
            F.regexp_extract("value", _LINK_RX, 1).alias("node_a"),
            F.regexp_extract("value", _LINK_RX, 2).alias("node_b"),
        )
        .filter((F.col("node_a") != "") & (F.col("node_b") != ""))
    )


def read_triples_nt(spark: SparkSession, path: str) -> DataFrame:
    """Parse general N-Triples -> (subject, predicate, object, lang, dtype).
    Object keeps URI form <...> stripped; literals keep quoted value with
    language/datatype split out (the reference's metadata row shape,
    schema.sql:20-27)."""
    lines = spark.read.text(path).filter(~F.col("value").startswith("#"))
    s = F.regexp_extract("value", _TRIPLE_RX, 1)
    p = F.regexp_extract("value", _TRIPLE_RX, 2)
    o_raw = F.regexp_extract("value", _TRIPLE_RX, 3)
    is_uri = o_raw.startswith("<")
    lit = F.regexp_extract(o_raw, r'^"((?:[^"\\]|\\.)*)"', 1)
    lang = F.regexp_extract(o_raw, r'^"(?:[^"\\]|\\.)*"@([A-Za-z\-]+)', 1)
    dtype = F.regexp_extract(o_raw, r'^"(?:[^"\\]|\\.)*"\^\^<([^>]+)>', 1)
    return (
        lines.select(
            s.alias("subject"),
            p.alias("predicate"),
            F.when(is_uri, F.regexp_extract(o_raw, r"^<([^>]+)>", 1)).otherwise(lit).alias("object"),
            lang.alias("lang"),
            dtype.alias("dtype"),
        )
        .filter((F.col("subject") != "") & (F.col("predicate") != ""))
    )


def write_links_nt(links: DataFrame, path: str) -> None:
    """S2: links -> N-Triples text (the reference bulk-loads this file via
    TTLP_MT, FusionGISCLI.java:374-421; here it is just a distributed
    text write)."""
    links.select(
        F.concat(
            F.lit("<"), F.col("node_a"), F.lit(f"> <{OWL_SAME_AS}> <"), F.col("node_b"), F.lit("> .")
        ).alias("value")
    ).write.mode("overwrite").text(path)
