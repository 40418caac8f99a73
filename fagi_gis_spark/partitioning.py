"""Scale-adaptive parallelism floor for unsplittable inputs.

Single-file parquet tables written with one row group cannot be split by
the scan (a byte-range split only yields rows to the task holding the
row-group start), so a 32-core session runs every pre-shuffle stage —
including Arrow/pandas UDF evaluation — on one or two tasks.  At real
scale inputs arrive as many files and this floor is a no-op; on the
sandbox's single-file tables it is the difference between using 2 cores
and using all of them (guide §2: make partitioning scale-adaptive —
derive from input size / core count, never a constant).

``ensure_min_parallelism`` round-robin repartitions ONLY when the frame
has fewer partitions than the session's default parallelism.  It never
changes row content, so no query result can change — placement only.
The keyless repartition is deterministic (Spark sorts before round-robin
repartitioning by default, SPARK-23207).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``target`` partitions (default: the
    session's ``defaultParallelism``) when it currently has fewer.
    Returns ``df`` unchanged when it is already at least that wide —
    large inputs with healthy splits never pay the shuffle."""
    spark = df.sparkSession
    if target is None:
        target = spark.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive: unplannable frame
        return df.repartition(target)
    if n >= target:
        return df
    return df.repartition(target)
