"""fagi_gis_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query/data-processing capabilities of GeoBIMpro/FAGI-gis
(POI-pair geometry fusion, link discovery, metadata fusion, clustering,
spatial joins) as idiomatic Spark DataFrame pipelines over image+caption
tables, plus the large-scale training-data operators (dedup, ANN,
text analysis) a 100 TB pipeline needs.

Reference semantics are cited per-operator as ``file:line`` paths under
``/root/reference`` (study-only; no code is copied — the reference is a
Java/PostGIS/Virtuoso system, this engine is DataFrame-first).
"""

__version__ = "0.1.0"
