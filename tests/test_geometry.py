"""Unit tests for the from-scratch geometry kernel (no Spark needed)."""

import math

import numpy as np
import pytest

from fagi_gis_spark.geometry.affine import rotate_about, scale_about, translate
from fagi_gis_spark.geometry.measures import area, bbox, centroid, haversine_m, npoints
from fagi_gis_spark.geometry.pip import PolygonIndex, points_in_polygon
from fagi_gis_spark.geometry.wkt import PRECEDENCE, format_wkt, parse_wkt

SQ = "POLYGON ((0.000000 0.000000, 2.000000 0.000000, 2.000000 2.000000, 0.000000 2.000000, 0.000000 0.000000))"


@pytest.mark.parametrize(
    "wkt,gtype,n",
    [
        ("POINT (1.500000 2.500000)", "POINT", 1),
        ("LINESTRING (0.000000 0.000000, 1.000000 1.000000)", "LINESTRING", 2),
        (SQ, "POLYGON", 5),
        ("MULTIPOINT ((1.000000 1.000000), (2.000000 2.000000))", "MULTIPOINT", 2),
        (
            "MULTILINESTRING ((0.000000 0.000000, 1.000000 0.000000), (2.000000 0.000000, 3.000000 0.000000))",
            "MULTILINESTRING",
            4,
        ),
        (
            "MULTIPOLYGON (((0.000000 0.000000, 1.000000 0.000000, 1.000000 1.000000, 0.000000 0.000000)))",
            "MULTIPOLYGON",
            4,
        ),
        (
            "GEOMETRYCOLLECTION (POINT (1.000000 1.000000), LINESTRING (0.000000 0.000000, 1.000000 0.000000))",
            "GEOMETRYCOLLECTION",
            3,
        ),
    ],
)
def test_roundtrip(wkt, gtype, n):
    g = parse_wkt(wkt)
    assert g.gtype == gtype
    assert npoints(g) == n
    assert format_wkt(g) == wkt  # canonical text is a fixed point


def test_parse_tolerates_legacy_forms():
    # PostGIS-style no-space and bare multipoint coordinates
    assert parse_wkt("POINT(1 2)").data.tolist() == [[1.0, 2.0]]
    assert parse_wkt("MULTIPOINT (1 1, 2 2)").data.tolist() == [[1.0, 1.0], [2.0, 2.0]]
    assert parse_wkt(None) is None
    assert parse_wkt("") is None


def test_centroid_semantics():
    assert centroid(parse_wkt("POINT (3 4)")) == (3.0, 4.0)
    cx, cy = centroid(parse_wkt(SQ))
    assert (cx, cy) == pytest.approx((1.0, 1.0))
    # length-weighted line centroid
    cx, cy = centroid(parse_wkt("LINESTRING (0 0, 0 2, 4 2)"))
    assert (cx, cy) == pytest.approx((8 / 6, 10 / 6))
    # collection: highest dimension wins (polygon beats the point)
    cx, cy = centroid(parse_wkt(f"GEOMETRYCOLLECTION (POINT (50 50), {SQ})"))
    assert (cx, cy) == pytest.approx((1.0, 1.0))


def test_polygon_with_hole():
    g = parse_wkt(
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    )
    assert area(g) == pytest.approx(15.0)
    cx, cy = centroid(g)
    # hole pulls the centroid away from (2,2)
    exp = (2 * 16 - 1.5 * 1) / 15
    assert (cx, cy) == pytest.approx((exp, exp))


def test_affine():
    g = parse_wkt("POINT (1 1)")
    assert format_wkt(translate(g, 2, 3)) == "POINT (3.000000 4.000000)"
    sq = parse_wkt(SQ)
    scaled = scale_about(sq, 2.0, 2.0)  # about centroid (1,1)
    assert bbox(scaled) == pytest.approx((-1.0, -1.0, 3.0, 3.0))
    rot = rotate_about(parse_wkt("LINESTRING (0 0, 2 0)"), math.pi / 2)
    assert centroid(rot) == pytest.approx((1.0, 0.0))
    b = bbox(rot)
    assert b == pytest.approx((1.0, -1.0, 1.0, 1.0), abs=1e-12)


def test_precedence_table():
    assert PRECEDENCE["MULTIPOLYGON"] < PRECEDENCE["POLYGON"] < PRECEDENCE["MULTILINESTRING"]
    assert PRECEDENCE["LINESTRING"] < PRECEDENCE["MULTIPOINT"] < PRECEDENCE["POINT"]


def test_point_in_polygon():
    poly = parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
    px = np.array([5.0, 1.0, 11.0, 5.0])
    py = np.array([5.0, 1.0, 5.0, 4.5])
    got = points_in_polygon(px, py, poly)
    assert got.tolist() == [False, True, False, False]  # (5,5) is inside the hole


def test_polygon_index():
    ids, geoms = [], []
    for i in range(4):
        for j in range(4):
            ids.append(f"p{i}{j}")
            geoms.append(
                parse_wkt(
                    f"POLYGON (({i} {j}, {i+1} {j}, {i+1} {j+1}, {i} {j+1}, {i} {j}))"
                )
            )
    idx = PolygonIndex(ids, geoms)
    px = np.array([0.5, 3.5, 2.5, -5.0])
    py = np.array([0.5, 3.5, 1.5, 0.5])
    res = idx.query_batch(px, py)
    assert res[0] == ["p00"]
    assert res[1] == ["p33"]
    assert res[2] == ["p21"]
    assert res[3] == []


def test_haversine():
    # 1 degree of longitude at the equator ~ 111.2 km
    d = haversine_m(0.0, 0.0, 1.0, 0.0)
    assert 110000 < float(d) < 112500
