"""Geotag: pHash-seeded synthetic lon/lat for image records (north rule:
"geotag each image record by pHash-seeded synthetic lon/lat").

Pure JVM column math over the int64 phash — at 10^12-image scale this is
the first derived column after the scan and must never enter Python. The
window defaults to the engine's 2°x2° test world; production would map
into real extents the same way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fagi_gis_spark.index import tiles


def geotag_cols(phash: Column) -> tuple[Column, Column]:
    """(lon, lat) on the micro-degree lattice derived from phash bits.
    pmod keeps negatives well-defined for signed int64 hashes; inner pmods
    shrink operands so products never overflow int64 (ANSI mode throws on
    overflow in Spark 4)."""
    lon = (F.pmod(phash, F.lit(2000000)) - F.lit(1000000)) / F.lit(1e6)
    mixed = F.pmod(F.pmod(phash, F.lit(2147483647)) * F.lit(2654435761), F.lit(2000000))
    lat = F.lit(50.0) + mixed / F.lit(1e6)
    return lon, lat


def geotag_images(
    images: DataFrame, cell_res: int = 9, cell_indexes: tuple[str, ...] = ()
) -> DataFrame:
    """images(input_hint schema) -> + (lon, lat, cell) columns.

    ``cell_indexes`` optionally adds the north star's named encodings
    alongside the z-tile cell: ``"s2"`` -> ``cell_s2`` (level-12 S2 id,
    Arrow-batched index/s2.py kernel), ``"hex"`` -> ``cell_hex7`` (res-9
    aperture-7 hex id, pure JVM column math — the same half-up rule as
    every other hex surface, see hexgrid.hex_round_np)."""
    lon, lat = geotag_cols(F.col("phash"))
    out = images.withColumn("lon", lon).withColumn("lat", lat)
    out = out.withColumn("cell", tiles.cell_id_col(F.col("lon"), F.col("lat"), cell_res))
    if "s2" in cell_indexes:
        from fagi_gis_spark.functions.geo_udfs import u_s2_cell12

        out = out.withColumn("cell_s2", u_s2_cell12(F.col("lon"), F.col("lat")))
    if "hex" in cell_indexes:
        from fagi_gis_spark.operators.spatial_join import _hex_pack, _hex_qr_cols

        q, r = _hex_qr_cols(F.col("lon"), F.col("lat"), 9)
        out = out.withColumn("cell_hex7", _hex_pack(q, r, 9))
    return out


def image_poi_layers(images: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Derive the two POI-image layers of the conflation flow: layer A at
    the geotag, layer B displaced <= ~150 m (deterministic from phash) —
    the image-table equivalent of sources/layers poi_a/poi_b."""
    g = geotag_images(images)
    a = g.select(
        F.concat(F.lit("a:"), F.col("image_id")).alias("subject"),
        "lon",
        "lat",
        "caption",
        "phash",
    )
    ph_small = F.pmod(F.col("phash"), F.lit(2**40))
    dx = (F.pmod(ph_small * F.lit(97) + F.lit(13), F.lit(2001)) - F.lit(1000)) / F.lit(1e6)
    dy = (F.pmod(ph_small * F.lit(57) + F.lit(7), F.lit(2001)) - F.lit(1000)) / F.lit(1e6)
    b = g.select(
        F.concat(F.lit("b:"), F.col("image_id")).alias("subject"),
        (F.col("lon") + dx).alias("lon"),
        (F.col("lat") + dy).alias("lat"),
        "caption",
        "phash",
    )
    return a, b
