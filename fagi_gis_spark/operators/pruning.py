"""Storage-level spatial pruning: bbox queries as partition filters.

At 100 TB the bbox filter (J6) must not scan the table: with the layer
written partitioned by a coarse tile cell, a viewport query reduces to
an IN-filter over the covering tile set, which Spark resolves at
PLANNING time against the partition directory values — only matching
partitions' files are listed and read (PartitionFilters in the scan
node, visible in ``df.inputFiles()``).

The z-tile covering of an axis-aligned bbox is EXACT (tiles are
axis-aligned rectangles): enumerate x in [x(min_lon), x(max_lon)],
y in [y(max_lat), y(min_lat)] (y grows southward in WebMercator).
The fine-grained residual filter still applies on top for rows inside
boundary tiles.  Reference analog: the GiST index + CLUSTER physical
ordering FAGI relies on for viewport fetches (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fagi_gis_spark.index.tiles import pack_cell_zxy, tile_xy_np

import numpy as np


def covering_tiles(
    min_lon: float, min_lat: float, max_lon: float, max_lat: float, z: int
) -> list[int]:
    """Exact tile-cell covering of a bbox at zoom z (packed cell ids).

    Tile coordinates are CLAMPED to [0, 2^z - 1] rather than wrapped:
    tile_xy_np pmod-wraps lon=180 to x=0, which would make the x range
    empty and silently prune every partition for a bbox touching the
    antimeridian (min_lon <= max_lon is assumed, standard J6 semantics;
    a seam-crossing viewport is two bboxes)."""
    n = 1 << z
    x0, y0 = tile_xy_np(np.array([min_lon]), np.array([max_lat]), z)
    x1, y1 = tile_xy_np(np.array([max_lon]), np.array([min_lat]), z)
    xa, xb = int(x0[0]), int(x1[0])
    xcols: list[int]
    if max_lon >= 180.0:
        # the right edge wrapped to column 0 AND rows at exactly lon=180
        # are STORED in column 0 (tile_xy_np pmod) — cover through the
        # last column plus the wrap-target column itself
        xcols = list(range(max(0, min(xa, n - 1)), n)) + [0]
    else:
        xa, xb = max(0, min(xa, n - 1)), max(0, min(xb, n - 1))
        xcols = list(range(xa, xb + 1))
    return [
        pack_cell_zxy(z, x, y)
        for x in sorted(set(xcols))
        for y in range(int(y0[0]), int(y1[0]) + 1)
    ]


def write_cell_partitioned(
    df: DataFrame, path: str, z: int, lon_col: str = "lon", lat_col: str = "lat"
) -> None:
    """Write a layer partitioned by its coarse tile cell — the storage
    layout that turns viewport queries into partition pruning."""
    from fagi_gis_spark.index.tiles import cell_id_col

    df.withColumn("cell_part", cell_id_col(F.col(lon_col), F.col(lat_col), z)).write.partitionBy(
        "cell_part"
    ).mode("overwrite").parquet(path)


def bbox_scan_pruned(
    spark,
    path: str,
    min_lon: float,
    min_lat: float,
    max_lon: float,
    max_lat: float,
    z: int,
) -> DataFrame:
    """Viewport read over a cell-partitioned layer: the covering-tile
    IN-filter prunes partitions at planning time; the residual lon/lat
    range predicates handle boundary tiles (and push down to parquet
    row groups)."""
    cells = covering_tiles(min_lon, min_lat, max_lon, max_lat, z)
    df = spark.read.parquet(path)
    return df.filter(F.col("cell_part").isin(cells)).filter(
        (F.col("lon") >= min_lon)
        & (F.col("lon") <= max_lon)
        & (F.col("lat") >= min_lat)
        & (F.col("lat") <= max_lat)
    )
