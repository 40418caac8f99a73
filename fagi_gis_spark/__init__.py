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

import os as _os

# Pin numeric libraries to one thread per process as early as possible:
# N python workers each spawning a full OpenBLAS pool oversubscribes the
# host N*cores-fold and inverts scaling (see session.py). Workers import
# this package before touching numpy kernels, so the setting lands even
# when the SparkSession was created outside fagi_gis_spark.session.
for _var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    _os.environ.setdefault(_var, "1")

__version__ = "0.1.0"
