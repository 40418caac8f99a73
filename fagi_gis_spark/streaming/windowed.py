"""Streaming twins of the batch event aggregations.

Patterns per the public Structured Streaming guide: watermark + tumbling
window for late data; ``foreachBatch`` writing through the lineage layer
for exactly-once, resumable sinks (pipeline/lineage.py manifests make the
batch write idempotent, which is what foreachBatch needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """readStream source -> watermarked tumbling-window counts/sums.
    The batch twin is registry.events_windowed_agg."""
    # NTZ timestamps (parquet default) are not valid event-time columns
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), key_col)
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
    )


def geotag_stream(stream: DataFrame, cell_res: int = 9) -> DataFrame:
    """Streaming ingest of input_hint image records: geotag + cell encode
    are pure column expressions, so the same operators apply unchanged to
    a readStream source — this is the streaming front door of the tiling
    pipeline."""
    from fagi_gis_spark.operators.geotag import geotag_images

    return geotag_images(stream, cell_res=cell_res)


def start_memory_sink(df: DataFrame, name: str, output_mode: str = "complete"):
    """Test/debug sink: drive with processAllAvailable()."""
    return (
        df.writeStream.outputMode(output_mode).format("memory").queryName(name).start()
    )


def stream_dedup(
    stream: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked streaming deduplication (the training-data pipeline's
    streaming front door for exact dedup): dropDuplicatesWithinWatermark
    keeps the first arrival per key and expires dedup state once the
    watermark passes — bounded state at any input volume, the streaming
    twin of functions.dedup.exact_dedup_keep."""
    keys = keys or ["event_id"]
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    max_gap: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Watermarked stream-stream interval join: pair each left event with
    right events of the same key within ``max_gap`` AFTER it (the
    standard Structured Streaming inner interval join — both sides
    watermarked so join state is bounded and expired by event time)."""
    l = left.withColumn(ts_col, F.col(ts_col).cast("timestamp")).withWatermark(
        ts_col, watermark
    ).alias("l")
    r = right.withColumn(ts_col, F.col(ts_col).cast("timestamp")).withWatermark(
        ts_col, watermark
    ).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{ts_col}") >= F.col(f"l.{ts_col}"))
        & (F.col(f"r.{ts_col}") <= F.col(f"l.{ts_col}") + F.expr(f"INTERVAL {max_gap}"))
    )
    return l.join(r, cond, "inner").select(
        F.col(f"l.{key}").alias(key),
        F.col(f"l.{ts_col}").alias("ts_l"),
        F.col(f"r.{ts_col}").alias("ts_r"),
        F.col("l.event_id").alias("event_l"),
        F.col("r.event_id").alias("event_r"),
    )


def stream_hex_cell_counts(
    stream: DataFrame,
    res: int = 9,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Live spatial rollup: watermarked tumbling-window counts per
    aperture-7 hex cell.  The hex assignment is the same whole-stage-
    codegen column math the batch join uses (spatial_join._hex_qr_cols),
    so it applies unchanged to a readStream source; state is bounded by
    the watermark x occupied-cell count."""
    from fagi_gis_spark.operators.spatial_join import _hex_pack, _hex_qr_cols

    q, r = _hex_qr_cols(F.col(lon_col), F.col(lat_col), res)
    s = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp")).withColumn(
        "cell_hex", _hex_pack(q, r, res)
    )
    return (
        s.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), "cell_hex")
        .agg(F.count("*").alias("n"))
    )
