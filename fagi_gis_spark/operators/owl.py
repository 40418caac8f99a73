"""OWL class insertion: write accepted class recommendations as triples.

Reference: FuseLinkServlet.java:225-270
(/root/reference/fagi-gis-service/src/main/java/gr/athenainnovation/imis/fagi/gis/service/FuseLinkServlet.java)
— for each accepted class ``c`` on a fused node the servlet INSERTs into
the fused named graph:

    <node>       rdf:type    <domOnto + c>
    <domOnto+c>  rdf:type    owl:Class
    <domOnto+c>  rdfs:label  "c"

with ``domOnto`` the dominant side's ontology prefix. URI constants from
fagi-gis/src/main/java/gr/athenainnovation/imis/fusion/gis/utils/Constants.java:25,44,45.

Spark-first shape: the servlet loops per node and re-INSERTs the class
declaration triples every time (idempotent in a triple store); here the
node typings come straight from the accepted-recommendation DataFrame and
the per-class declaration rows are emitted once (distinct) — identical
resulting graph, one pass, no loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
OWL_CLASS = "http://www.w3.org/2002/07/owl#Class"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"


def owl_class_triples(
    accepted: DataFrame,
    dom_onto: str,
    node_col: str = "node",
    class_col: str = "cls",
) -> DataFrame:
    """Triples for accepted class recommendations.

    ``accepted``: one row per (node, class-name) the user accepted.
    Returns (subject, predicate, object) rows: one typing triple per
    accepted row plus one (owl:Class + rdfs:label) declaration pair per
    distinct class. Union the result into the fused triples output.
    """
    cls_uri = F.concat(F.lit(dom_onto), F.col(class_col))
    node_t = accepted.select(
        F.col(node_col).alias("subject"),
        F.lit(RDF_TYPE).alias("predicate"),
        cls_uri.alias("object"),
    )
    decl = accepted.select(cls_uri.alias("cls_uri"), F.col(class_col).alias("cls")).distinct()
    class_t = decl.select(
        F.col("cls_uri").alias("subject"),
        F.lit(RDF_TYPE).alias("predicate"),
        F.lit(OWL_CLASS).alias("object"),
    )
    label_t = decl.select(
        F.col("cls_uri").alias("subject"),
        F.lit(RDFS_LABEL).alias("predicate"),
        F.col("cls").alias("object"),
    )
    return node_t.unionByName(class_t).unionByName(label_t)
