"""Tile raster heatmap: rasterize a point layer into per-tile pixel-count
grids, optionally rendered to grayscale PNG tiles — the geospatial→image
sink (the reference's map-panel density rendering, expressed as a Spark
aggregation; cf. reference fusion-gis map tile endpoints).

Two stages, cleanly split so the aggregate stays oracle-checkable:

* :func:`tile_heatmap` — (tile x, tile y, pixel x, pixel y) → count.
  Pure whole-stage-codegen arithmetic (WebMercator formulas shared with
  ``index/tiles.py``) plus ONE partially-aggregated groupBy: map-side
  combine collapses co-located points before the shuffle, and the shuffle
  key space is bounded by tiles × px² regardless of input row count — the
  100 TB shape is a single pass over the points.

* :func:`render_heatmap_png` — per-tile ``applyInPandas`` that scatters
  the sparse counts into a dense (px, px) grid, normalizes to 0..255, and
  encodes with the from-scratch PNG writer (``sources/png.py``).  Group
  key = one tile; state per group is px² bytes, so executor memory is
  flat no matter how many points fed the tile.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fagi_gis_spark.index import tiles


def tile_heatmap(
    points: DataFrame,
    z: int = 9,
    px: int = 64,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Counts per (tile, pixel) at zoom ``z`` with a ``px``×``px`` raster
    per tile.  Output: (x, y, px_x, px_y, cnt)."""
    lon, lat = F.col(lon_col), F.col(lat_col)
    return (
        points.select(
            tiles.tile_x_col(lon, z).alias("x"),
            tiles.tile_y_col(lat, z).alias("y"),
            tiles.pixel_x_col(lon, z, px).alias("px_x"),
            tiles.pixel_y_col(lat, z, px).alias("px_y"),
        )
        .groupBy("x", "y", "px_x", "px_y")
        .agg(F.count("*").alias("cnt"))
    )


def heatmap_pyramid(
    heat: DataFrame, z_base: int, z_min: int, px: int = 64
) -> DataFrame:
    """Tile-pyramid build from the finest-zoom raster: each coarser level
    is the standard 2x2 pixel box-sum of its four child tiles — child
    tile (x, y) fills the (x%2, y%2) quadrant of parent (x/2, y/2), and
    two child pixels collapse into one parent pixel per axis.

    This is how tile servers build zoom pyramids, and the scale shape is
    the right one: each level derives from the PREVIOUS level (bounded
    key space = tiles x px², independent of input row count), never from
    the raw points, so the raw data is scanned exactly once no matter how
    many levels are emitted.  All arithmetic is integer codegen; one
    partially-aggregated groupBy per level.

    Output: (z, x, y, px_x, px_y, cnt) for z in [z_min, z_base].
    """
    half = px // 2
    level = heat.select(
        F.lit(z_base).alias("z"), "x", "y", "px_x", "px_y", "cnt"
    )
    out = level
    for z in range(z_base - 1, z_min - 1, -1):
        level = (
            level.select(
                F.lit(z).alias("z"),
                (F.col("x") / 2).cast("long").alias("x"),
                (F.col("y") / 2).cast("long").alias("y"),
                (F.pmod(F.col("x"), F.lit(2)) * half + (F.col("px_x") / 2).cast("long")).alias(
                    "px_x"
                ),
                (F.pmod(F.col("y"), F.lit(2)) * half + (F.col("px_y") / 2).cast("long")).alias(
                    "px_y"
                ),
                F.col("cnt"),
            )
            .groupBy("z", "x", "y", "px_x", "px_y")
            .agg(F.sum("cnt").alias("cnt"))
        )
        out = out.unionAll(level)
    return out


def render_heatmap_png(heat: DataFrame, px: int = 64) -> DataFrame:
    """Render per-tile count grids to grayscale PNG bytes.  Linear
    normalization: 255 * cnt / max(cnt in tile), rounded half-up; empty
    pixels are 0.  Output: (x, y, n_points, max_cnt, png_size, png)."""
    from fagi_gis_spark.sources.png import encode_png_gray

    def render(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        x, y = int(key[0]), int(key[1])
        grid = np.zeros((px, px), dtype=np.float64)
        grid[pdf["px_y"].to_numpy(), pdf["px_x"].to_numpy()] = pdf["cnt"].to_numpy()
        m = float(grid.max())
        img = (
            np.floor(grid * (255.0 / m) + 0.5).astype(np.uint8)
            if m > 0
            else np.zeros((px, px), dtype=np.uint8)
        )
        png = encode_png_gray(img)
        return pd.DataFrame(
            [
                {
                    "x": x,
                    "y": y,
                    "n_points": int(pdf["cnt"].sum()),
                    "max_cnt": int(m),
                    "png_size": len(png),
                    "png": png,
                }
            ]
        )

    return heat.groupBy("x", "y").applyInPandas(
        render,
        schema="x long, y long, n_points long, max_cnt long, png_size long, png binary",
    )
