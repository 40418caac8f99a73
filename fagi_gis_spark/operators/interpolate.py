"""Surface interpolation at sample sites: KDE density and IDW values.

The two standard desktop-GIS surface statistics (quartic-kernel density
estimation, Shepard inverse-distance-weighted interpolation), evaluated
at the probe layer's own sites and re-expressed as ONE aggregation over
the proven radius-join pair stream (J5 machinery: ring-1 cell join,
hot-cell salting, exact refine — `operators/spatial_join.radius_join`).
No new shuffle shape and no new distance-parity surface: the pair
stream's ``dist_m`` is the same planar-degree x 111195 metric the
reference uses everywhere (FAGI-gis `FuseLinkServlet.java` distance
annotation), already oracle-proven bit-exact.

Float-parity design (the repo's standard, see registry.py header):
every per-pair kernel weight quantizes to int64 BEFORE aggregation, so
the sum is exact integer math in any order — Spark's partial/final agg
tree and DuckDB's single pass produce the same integer — and the final
double formula consumes identical inputs in both engines.

Scale: weights are plain column arithmetic on the join output (no
Python, no extra shuffle beyond the join's own); the group-by on the
site key is the one aggregation exchange.  Everything inherited from
radius_join (salting, ring-1 completeness, broadcast hot set) applies
unchanged at 100 TB.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: per-pair weights quantize to round(w * 1e9) int64 — exact at any
#: aggregation order, 9 significant digits of kernel resolution
W_SCALE = 1e9


def kde_kconst(radius_m: float) -> float:
    """Constant folding density-e12 into ONE multiplication: density =
    3/(pi R^2) * (wsum / 1e9), emitted as round(density * 1e12) — i.e.
    round(wsum * (1e3 * 3 / (pi R^2))).  Computed driver-side and inlined
    (repr) into BOTH the Spark literal and the DuckDB SQL so the engines
    multiply by the bit-identical double."""
    return 1e3 * 3.0 / (math.pi * radius_m * radius_m)


def kde_at_sites(
    pairs: DataFrame,
    sites: DataFrame,
    radius_m: float,
    site_col: str = "r_key",
    site_key: str = "subject",
) -> DataFrame:
    """(site, n_nbrs, density_e12): quartic-kernel density at each probe
    site from the build points within ``radius_m``.

    ``pairs`` is radius_join output (carries ``dist_m`` and the site key
    in ``site_col``); ``sites`` is the full probe layer so zero-neighbor
    sites emit density 0 (KDE is defined everywhere).  Per-pair weight
    (1 - (d/R)^2)^2 quantizes to e9-int64 pre-sum (see module header);
    the 3/(pi R^2) normalization applies once to the integer sum."""
    d = F.col("dist_m")
    t = F.lit(1.0) - (d / F.lit(radius_m)) * (d / F.lit(radius_m))
    wq = F.round(t * t * F.lit(W_SCALE)).cast("long")
    agg = pairs.groupBy(F.col(site_col).alias("site")).agg(
        F.count("*").alias("n_nbrs"), F.sum(wq).alias("wsum")
    )
    k = F.lit(kde_kconst(radius_m))
    return (
        sites.select(F.col(site_key).alias("site"))
        .join(agg, "site", "left")
        .select(
            "site",
            F.coalesce(F.col("n_nbrs"), F.lit(0).cast("long")).alias("n_nbrs"),
            F.round(F.coalesce(F.col("wsum"), F.lit(0).cast("long")).cast("double") * k)
            .cast("long")
            .alias("density_e12"),
        )
    )


def idw_at_sites(
    pairs: DataFrame,
    values: DataFrame,
    min_dist_m: float = 1.0,
    site_col: str = "r_key",
    point_col: str = "l_key",
    value_col: str = "v",
) -> DataFrame:
    """(site, n_nbrs, idw_e6): Shepard inverse-distance-squared
    interpolation of the build layer's ``value_col`` at each probe site.

    ``values`` maps the build-point key (``point_col``) to its integer
    measurement.  w = 1e9 / max(d, min_dist_m)^2 quantized to int64
    pre-sum (the max() is the standard Shepard regularization: an
    exactly-collocated point would otherwise weight infinity); the
    weighted mean divides the two exact integer sums once.  Sites with
    no neighbor in radius have no defined value and are omitted —
    mirrored by the oracle's inner aggregation."""
    dm = F.greatest(F.col("dist_m"), F.lit(min_dist_m))
    wq = F.round(F.lit(W_SCALE) / (dm * dm)).cast("long")
    joined = pairs.join(values, point_col)
    agg = joined.groupBy(F.col(site_col).alias("site")).agg(
        F.count("*").alias("n_nbrs"),
        F.sum(wq * F.col(value_col)).alias("num"),
        F.sum(wq).alias("den"),
    )
    return agg.select(
        "site",
        "n_nbrs",
        F.round(F.col("num").cast("double") / F.col("den").cast("double") * F.lit(1e6))
        .cast("long")
        .alias("idw_e6"),
    )
