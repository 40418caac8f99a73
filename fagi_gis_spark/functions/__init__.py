"""Column-level function library: Arrow-batched geometry UDFs, similarity
functions, text-analysis and dedup primitives.

Design rule (BASELINE.json input_hint): no per-row Python anywhere — every
Python-side function is a pandas UDF over Arrow batches; everything
expressible as built-in ``pyspark.sql.functions`` stays JVM-side.
"""
