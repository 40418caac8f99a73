"""Table catalog facade: Iceberg when available, parquet+manifest otherwise.

Production target is Iceberg (snapshot commits, MERGE INTO, partition
evolution). The sandbox image carries no Iceberg jars, so the same call
surface degrades to parquet directories with the lineage layer's atomic
JSON manifests (pipeline/lineage.py) standing in for snapshot commits —
the write/read/overwrite-by-key semantics the engine relies on are
identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001
        return False


class Catalog:
    def __init__(self, spark: SparkSession, base: str):
        self.spark = spark
        self.base = base
        self.use_iceberg = iceberg_available(spark)
        os.makedirs(base, exist_ok=True)

    def _path(self, table: str) -> str:
        return os.path.join(self.base, table)

    def write(self, df: DataFrame, table: str, partition_by: list[str] | None = None) -> None:
        if self.use_iceberg:  # pragma: no cover — jars absent in sandbox
            w = df.writeTo(table).using("iceberg")
            if partition_by:
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
            return
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(table))

    def read(self, table: str) -> DataFrame:
        if self.use_iceberg:  # pragma: no cover
            return self.spark.table(table)
        return self.spark.read.parquet(self._path(table))

    def merge_by_key(self, table: str, updates: DataFrame, key: str) -> None:
        """MERGE INTO semantics: rows whose key appears in ``updates`` are
        replaced. Without Iceberg this is the anti-join + union rewrite
        (the reference's delete-then-insert write-back, SURVEY.md S5/S8)."""
        if self.use_iceberg:  # pragma: no cover
            updates.createOrReplaceTempView("__updates")
            cols = ", ".join(updates.columns)
            self.spark.sql(
                f"MERGE INTO {table} t USING __updates u ON t.{key} = u.{key} "
                f"WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
            )
            return
        import shutil

        current = self.read(table)
        kept = current.join(updates.select(key), key, "left_anti")
        # can't overwrite a path while reading it: stage to a temp dir,
        # then swap (the manifest-rename commit pattern of lineage.py)
        tmp = self._path(table) + "__staging"
        kept.unionByName(updates).write.mode("overwrite").parquet(tmp)
        shutil.rmtree(self._path(table))
        os.rename(tmp, self._path(table))
