"""Metadata (attribute) fusion actions — SURVEY.md §2.5.

Reference: servlet-side SPARQL templates
(/root/reference/fagi-gis-service/src/main/java/gr/athenainnovation/imis/fusion/gis/servlets/BatchFusionServlet.java,
dispatch handleMetadataFusion:1622-1658). Actions re-root a linked
subject's property values onto the dominant subject under a renamed
predicate ``<domOnto><newPred>``:

* keep A / keep B      (metadataKeepLeft:2889-2996 / KeepRight:2997-3108)
* keep both            (both inserts, :1630-1634)
* keep concatenated    (collect leaf literals per subject, string-join;
                        metadataKeepConcatLeft:2669-2888)
* concatenation        (both sides' literals into one value,
                        metadataConcatenation:2107-2450)
* flattened            (re-emit chain leaves under <pred>_<leafLocal>,
                        metadataKeepFlatLeft:1778-1931)
* rest-properties      (unmatched predicates copied or dropped,
                        insertRemaining:656-709)

The reference's concat value order is SPARQL result order
(nondeterministic); this engine sorts values lexicographically —
documented determinism fix (SURVEY.md §2.5 ordering caveat).

Property chains (subject -> blank node -> leaf) are expanded by iterative
self-joins up to depth 6 (Constants.java:76 MAX_METADATA_DEPTH).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GEO_PREDICATE_RX = r"(asWKT|hasGeometry|wgs84_pos#lat|wgs84_pos#long)"
MAX_METADATA_DEPTH = 6


def expand_chains(triples: DataFrame, max_depth: int = MAX_METADATA_DEPTH) -> DataFrame:
    """M1: property-chain expansion. Returns
    (subject, chain, object, depth) where chain = 'p1,p2,...' — the
    reference's comma-joined chain notation (BatchFusionServlet.java:1793-1822).
    Blank-node intermediates ('_:...') are traversed, literals terminate.
    """
    cur = triples.select(
        "subject",
        F.col("predicate").alias("chain"),
        "object",
        F.lit(1).alias("depth"),
    )
    out = cur.filter(~F.col("object").startswith("_:"))
    frontier = cur.filter(F.col("object").startswith("_:"))
    persisted = []
    for depth in range(2, max_depth + 1):
        # persist before the emptiness probe: isEmpty() is an action, and
        # without the persist each probe re-executes the growing join
        # lineage (depth d re-runs all d-1 joins).
        frontier = frontier.persist()
        persisted.append(frontier)
        if frontier.isEmpty():
            break
        nxt = (
            frontier.alias("f")
            .join(triples.alias("t"), F.col("f.object") == F.col("t.subject"), "inner")
            .select(
                F.col("f.subject").alias("subject"),
                F.concat(F.col("f.chain"), F.lit(","), F.col("t.predicate")).alias("chain"),
                F.col("t.object").alias("object"),
                F.lit(depth).alias("depth"),
            )
        )
        out = out.unionByName(nxt.filter(~F.col("object").startswith("_:")))
        frontier = nxt.filter(F.col("object").startswith("_:"))
    # the returned plan reads only `out`; drop the probe caches eagerly so
    # long pipelines don't accumulate blocks (out's lineage re-derives from
    # `triples`, which callers persist if they reuse).
    for df in persisted:
        df.unpersist()
    return out


def _local_name(pred_col):
    """Local name of a URI (text after the last '/' or '#')."""
    return F.element_at(F.split(pred_col, r"[/#]"), -1)


def _dominant_subject(links: DataFrame, dominant: str) -> DataFrame:
    """Map each linked subject to the dominant-side output subject."""
    if dominant == "a":
        return links.select(
            F.col("node_a").alias("dom_subject"),
            F.col("node_a").alias("sub_a"),
            F.col("node_b").alias("sub_b"),
        )
    return links.select(
        F.col("node_b").alias("dom_subject"),
        F.col("node_a").alias("sub_a"),
        F.col("node_b").alias("sub_b"),
    )


def metadata_keep(
    links: DataFrame,
    triples: DataFrame,
    side: str,
    chain: str,
    dom_onto: str,
    new_pred: str,
    dominant: str = "a",
) -> DataFrame:
    """Keep A / Keep B for one matched property chain: copy the chain's
    leaf values for linked subjects, re-rooted on the dominant subject,
    predicate renamed to <dom_onto><new_pred>."""
    key = "sub_a" if side == "a" else "sub_b"
    dom = _dominant_subject(links, dominant)
    chains = expand_chains(triples).filter(F.col("chain") == chain)
    return (
        dom.join(chains, dom[key] == chains.subject, "inner")
        .select(
            F.col("dom_subject").alias("subject"),
            F.concat(F.lit(dom_onto), F.lit(new_pred)).alias("predicate"),
            "object",
        )
    )


def metadata_keep_both(
    links, triples_a, triples_b, chain_a, chain_b, dom_onto, new_pred, dominant="a"
) -> DataFrame:
    a = metadata_keep(links, triples_a, "a", chain_a, dom_onto, new_pred, dominant)
    b = metadata_keep(links, triples_b, "b", chain_b, dom_onto, new_pred, dominant)
    return a.unionByName(b)


def metadata_keep_concat(
    links: DataFrame,
    triples: DataFrame,
    side: str,
    chain: str,
    dom_onto: str,
    new_pred: str,
    dominant: str = "a",
    sep: str = " ",
) -> DataFrame:
    """Keep Concatenated: leaf literals per dominant subject, sorted
    lexicographically (determinism fix) and joined with ``sep``."""
    rows = metadata_keep(links, triples, side, chain, dom_onto, new_pred, dominant)
    return rows.groupBy("subject", "predicate").agg(
        F.array_join(F.array_sort(F.collect_list("object")), sep).alias("object")
    )


def metadata_concatenation(
    links, triples_a, triples_b, chain_a, chain_b, dom_onto, new_pred, dominant="a", sep=" "
) -> DataFrame:
    """Concatenation: both sides' leaf literals gathered per dominant
    subject into one value (metadataConcatenation:2107-2450)."""
    both = metadata_keep_both(
        links, triples_a, triples_b, chain_a, chain_b, dom_onto, new_pred, dominant
    )
    return both.groupBy("subject", "predicate").agg(
        F.array_join(F.array_sort(F.collect_list("object")), sep).alias("object")
    )


def metadata_keep_flattened(
    links: DataFrame,
    triples: DataFrame,
    side: str,
    chain_prefix: str,
    dom_onto: str,
    new_pred: str,
    dominant: str = "a",
) -> DataFrame:
    """Keep Flattened: every chain sharing the matched prefix re-emits its
    leaf under ``<dom_onto><new_pred>_<leafLocalName>``
    (metadataKeepFlatLeft:1778-1931, simplified-suffix :1880-1889)."""
    key = "sub_a" if side == "a" else "sub_b"
    dom = _dominant_subject(links, dominant)
    chains = expand_chains(triples).filter(
        (F.col("chain") == chain_prefix) | F.col("chain").startswith(chain_prefix + ",")
    )
    leaf_pred = F.element_at(F.split(F.col("chain"), ","), -1)
    return (
        dom.join(chains, dom[key] == chains.subject, "inner")
        .select(
            F.col("dom_subject").alias("subject"),
            F.when(
                F.col("chain") == chain_prefix,
                F.concat(F.lit(dom_onto), F.lit(new_pred)),
            )
            .otherwise(
                F.concat(F.lit(dom_onto), F.lit(new_pred), F.lit("_"), _local_name(leaf_pred))
            )
            .alias("predicate"),
            "object",
        )
    )


def rest_properties(
    links: DataFrame,
    triples: DataFrame,
    side: str,
    fused_predicates: list[str],
    dominant: str = "a",
) -> DataFrame:
    """restAction Keep: copy unmatched (not-yet-fused) predicates of linked
    subjects to the dominant subject (insertRemaining:656-709); geo
    predicates always excluded (VirtuosoImporter.java:1330-1340)."""
    key = "sub_a" if side == "a" else "sub_b"
    dom = _dominant_subject(links, dominant)
    t = triples.filter(
        ~F.col("predicate").isin(fused_predicates)
        & ~F.col("predicate").rlike(GEO_PREDICATE_RX)
    )
    return (
        dom.join(t, dom[key] == t.subject, "inner")
        .select(F.col("dom_subject").alias("subject"), "predicate", "object")
    )
