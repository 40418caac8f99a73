"""Trajectory / movement analytics (operators.trajectory): unit semantics
on hand-crafted fixtures.  The end-to-end lattice parity (Spark vs DuckDB
on the events table) is covered by the three registry oracles
(events_user_travel / events_od_matrix / events_grid_dbscan); these tests
pin the operator CONTRACTS the oracle can't isolate: step ordering, the
stayed-home OD diagonal, DBSCAN noise labeling, and the antimeridian
cell wrap.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from fagi_gis_spark.operators.trajectory import (
    event_ping_cols,
    event_ping_sql,
    grid_dbscan,
    od_matrix,
    user_travel,
    with_pings,
)


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=m)


@pytest.fixture(scope="module")
def tiny_events(spark):
    # user 1: three pings; user 2: one ping (no steps)
    rows = [
        (10, _ts(0), 1, "view", 0.0, ""),
        (11, _ts(1), 1, "view", 0.0, ""),
        (12, _ts(2), 1, "view", 0.0, ""),
        (20, _ts(0), 2, "view", 0.0, ""),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


def test_ping_sql_twin_matches_columns(spark, duck):
    """The SQL text generator and the Column generator are the same
    function on the micro-degree lattice (exact equality, no tolerance)."""
    ids = spark.createDataFrame(
        [(u, e) for u in (0, 1, 7, 99990, 123456) for e in (0, 1, 999982, 31337)],
        "user_id long, event_id long",
    )
    got = {
        (r.user_id, r.event_id): (r.lon, r.lat)
        for r in with_pings(ids).collect()
    }
    lon_sql, lat_sql = event_ping_sql()
    pdf = ids.toPandas()
    duck.register("ping_ids", pdf)
    want = duck.execute(
        f"SELECT user_id, event_id, {lon_sql} AS lon, {lat_sql} AS lat FROM ping_ids"
    ).fetchall()
    duck.unregister("ping_ids")
    for u, e, lon, lat in want:
        assert got[(u, e)] == (lon, lat)
        assert -20.0 - 0.011 <= lon <= 20.0 + 0.011
        assert 40.0 - 0.011 <= lat <= 50.0 + 0.011


def test_user_travel_hand_computed(spark, tiny_events):
    out = {r.user_id: r for r in user_travel(tiny_events).collect()}
    pings = {
        r.event_id: (r.lon, r.lat) for r in with_pings(tiny_events).collect()
    }

    def step_mm(a, b):
        (x0, y0), (x1, y1) = pings[a], pings[b]
        return round(math.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2) * 111195.0 * 1000.0)

    s1, s2 = step_mm(10, 11), step_mm(11, 12)
    assert out[1].n_pings == 3
    assert out[1].total_mm == s1 + s2
    assert out[1].max_step_mm == max(s1, s2)
    # a single ping travels nowhere but still counts
    assert (out[2].n_pings, out[2].total_mm, out[2].max_step_mm) == (1, 0, 0)


def test_od_matrix_first_last_and_diagonal(spark, tiny_events):
    # z=1 tiles are hemispheric: every synthesized ping (lon in [-20, 20),
    # lat in [40, 50]) lands in one cell, so all trips sit on the
    # stayed-home diagonal — and the matrix must keep them.
    out = od_matrix(tiny_events, z=1, win_s=3600).collect()
    assert len(out) == 1
    assert out[0].origin_cell == out[0].dest_cell
    assert out[0].n_trips == 2  # (user 1, hour 0) and (user 2, hour 0)


def test_od_matrix_splits_windows(spark):
    rows = [
        (1, _ts(0), 1, "view", 0.0, ""),
        (2, dt.datetime(2024, 1, 1, 2, 0, 0), 1, "view", 0.0, ""),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = od_matrix(e, z=1, win_s=3600).collect()
    # two separate hours -> two single-ping trips
    assert sum(r.n_trips for r in out) == 2


def test_colocation_bucket_boundary_counts_once(spark):
    from fagi_gis_spark.operators.trajectory import colocation

    # same synthesized cell = same (user % UMOD, ...) home when the
    # jitter is small vs a z4 tile; users 1 and 2 have different homes,
    # so craft co-location via a COARSE z (whole-hemisphere tiles)
    rows = [
        # pair straddling a bucket boundary: t=890 and t=910 are in
        # buckets 0 and 1 but only 20s apart -> must count exactly once
        (1, dt.datetime(2024, 1, 1, 0, 14, 50), 1, "a", 0.0, ""),
        (2, dt.datetime(2024, 1, 1, 0, 15, 10), 2, "a", 0.0, ""),
        # same pair again well inside one bucket
        (3, dt.datetime(2024, 1, 1, 0, 16, 0), 1, "a", 0.0, ""),
        # too far apart in time from everything (> 900s)
        (4, dt.datetime(2024, 1, 1, 5, 0, 0), 2, "a", 0.0, ""),
        # same-user pair never counts
        (5, dt.datetime(2024, 1, 1, 0, 15, 20), 1, "a", 0.0, ""),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = {(r.user_a, r.user_b): r.n_hits for r in colocation(e, z=1, win_s=900).collect()}
    # qualifying event pairs: (1,2), (3,2), (5,2) -> 3 hits for (1,2)
    assert out == {(1, 2): 3}


def test_colocation_inclusive_window_edge(spark):
    from fagi_gis_spark.operators.trajectory import colocation

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 1, "a", 0.0, ""),
        (2, dt.datetime(2024, 1, 1, 0, 15, 0), 2, "a", 0.0, ""),  # exactly 900s
        (3, dt.datetime(2024, 1, 1, 0, 30, 1), 3, "a", 0.0, ""),  # 901s from #2
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = {(r.user_a, r.user_b): r.n_hits for r in colocation(e, z=1, win_s=900).collect()}
    assert out == {(1, 2): 1}  # the 900s pair is in; the 901s pair is out


def test_stay_points_chain_break_and_filters(spark):
    from fagi_gis_spark.operators.trajectory import stay_points, with_pings

    # user 1: 4 pings with tiny jitter (same event modulo class spacing)
    # spanning 2 hours -> one stay; then a huge time gap doesn't break a
    # chain (only distance does) so craft a far hop via a different user
    rows = [(i, _ts(i * 40), 1, "a", 0.0, "") for i in (10, 11, 12, 13)]
    rows += [(20, _ts(0), 2, "a", 0.0, ""), (21, _ts(1), 2, "a", 0.0, "")]
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    pings = {r.event_id: (r.lon, r.lat) for r in with_pings(e).collect()}

    def mm(a, b):
        (x0, y0), (x1, y1) = pings[a], pings[b]
        return round(math.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2) * 111195000.0)

    # choose eps just above the largest step of user 1's chain: one stay
    eps = max(mm(10, 11), mm(11, 12), mm(12, 13)) + 1
    out = stay_points(e, eps_mm=eps, min_dur_s=3600, min_pings=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.user_id, r.n_pings, r.dur_s) == (1, 4, 3 * 40 * 60)
    lon_sum = sum(round(pings[i][0] * 1e6) for i in (10, 11, 12, 13))
    lat_sum = sum(round(pings[i][1] * 1e6) for i in (10, 11, 12, 13))
    assert r.c_lon_micro == math.floor(lon_sum / 4)
    assert r.c_lat_micro == math.floor(lat_sum / 4)
    # with eps below any step (the lattice quantum is ~111 mm) every
    # chain fragments into singletons: nothing survives min_pings=2
    out2 = stay_points(e, eps_mm=1, min_dur_s=1, min_pings=2).collect()
    assert out2 == []


def _points(spark, pts):
    return spark.createDataFrame(pts, "subject long, lon double, lat double")


def test_grid_dbscan_clusters_and_noise(spark):
    # z=2 tiles are 90 degrees wide: cluster A = 4 points in one cell,
    # cluster B = 3 points in a FAR cell (not adjacent), noise = 2 lone
    # points in cells below min_pts
    a = [(i, 10.0 + i * 0.001, 10.0) for i in range(4)]
    b = [(10 + i, -170.0, -10.0 + i * 0.001) for i in range(3)]
    noise = [(100, 10.0, -80.0), (101, -60.0, 10.0)]
    out = {
        r.subject: r.cluster_label
        for r in grid_dbscan(_points(spark, a + b + noise), z=2, min_pts=3).collect()
    }
    a_labels = {out[i] for i in range(4)}
    b_labels = {out[10 + i] for i in range(3)}
    assert len(a_labels) == 1 and len(b_labels) == 1
    assert a_labels != b_labels
    assert a_labels != {-1} and b_labels != {-1}
    assert out[100] == -1 and out[101] == -1


def test_grid_dbscan_merges_adjacent_cells(spark):
    # two dense cells sharing an edge at z=3 (45-degree tiles): one cluster
    left = [(i, 44.0, 10.0 + i * 0.001) for i in range(3)]
    right = [(10 + i, 46.0, 10.0 + i * 0.001) for i in range(3)]
    out = {
        r.subject: r.cluster_label
        for r in grid_dbscan(_points(spark, left + right), z=3, min_pts=3).collect()
    }
    assert len(set(out.values())) == 1 and -1 not in set(out.values())


def test_grid_dbscan_antimeridian_wrap(spark):
    # dense cells on both sides of lon=180 at z=3: x=7 and x=0 are
    # 8-neighbors through the wrap, so the two clusters must merge
    west = [(i, 179.0, 10.0 + i * 0.001) for i in range(3)]
    east = [(10 + i, -179.0, 10.0 + i * 0.001) for i in range(3)]
    out = {
        r.subject: r.cluster_label
        for r in grid_dbscan(_points(spark, west + east), z=3, min_pts=3).collect()
    }
    assert len(set(out.values())) == 1 and -1 not in set(out.values())


def _brute_frechet2(A, B):
    """Textbook recursive discrete Fréchet (Eiter-Mannila), squared."""
    import functools

    def d2(i, j):
        return (A[i][0] - B[j][0]) ** 2 + (A[i][1] - B[j][1]) ** 2

    @functools.lru_cache(maxsize=None)
    def c(i, j):
        if i == 0 and j == 0:
            return d2(0, 0)
        if i == 0:
            return max(c(0, j - 1), d2(0, j))
        if j == 0:
            return max(c(i - 1, 0), d2(i, 0))
        return max(min(c(i - 1, j), c(i - 1, j - 1), c(i, j - 1)), d2(i, j))

    return c(len(A) - 1, len(B) - 1)


def _brute_hausdorff2(A, B):
    def mn(P, Q):
        return max(
            min((p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2 for q in Q) for p in P
        )

    return max(mn(A, B), mn(B, A))


def test_hausdorff_and_frechet_vs_bruteforce(spark):
    """Vectorized kernels == textbook references on random int lattices,
    plus the Fréchet >= Hausdorff invariant and the asymmetric directed
    values coming back separately."""
    import random

    from fagi_gis_spark.operators.trajectory import frechet_by_key, hausdorff_by_key

    rng = random.Random(42)
    rows = []
    cases = {}
    for k in range(12):
        na, nb = rng.randint(1, 9), rng.randint(1, 9)
        A = [(rng.randint(-500, 500), rng.randint(-500, 500)) for _ in range(na)]
        B = [(rng.randint(-500, 500), rng.randint(-500, 500)) for _ in range(nb)]
        cases[k] = (A, B)
        for i, (x, y) in enumerate(A):
            rows.append((k, 0, i, x, y))
        for i, (x, y) in enumerate(B):
            rows.append((k, 1, i, x, y))
    df = spark.createDataFrame(
        rows, "user_id long, side int, seq long, x long, y long"
    )
    h = {r.user_id: r for r in hausdorff_by_key(df).collect()}
    f = {r.user_id: r for r in frechet_by_key(df).collect()}
    assert set(h) == set(cases) and set(f) == set(cases)
    for k, (A, B) in cases.items():
        assert h[k].h2_udeg2 == _brute_hausdorff2(A, B)
        assert f[k].f2_udeg2 == _brute_frechet2(A, B)
        assert f[k].f2_udeg2 >= h[k].h2_udeg2
        # directed values: h_ab2 measures A against B specifically
        assert h[k].h_ab2 == max(
            min((a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2 for b in B) for a in A
        )
        assert (h[k].n_a, h[k].n_b) == (len(A), len(B))


def test_hausdorff_single_sided_user_dropped(spark):
    from fagi_gis_spark.operators.trajectory import frechet_by_key, hausdorff_by_key

    df = spark.createDataFrame(
        [(1, 0, 0, 0, 0), (1, 0, 1, 5, 5), (2, 0, 0, 1, 1), (2, 1, 1, 4, 4)],
        "user_id long, side int, seq long, x long, y long",
    )
    assert [r.user_id for r in hausdorff_by_key(df).collect()] == [2]
    assert [r.user_id for r in frechet_by_key(df).collect()] == [2]


def test_frechet_ordering_matters(spark):
    """Fréchet is order-aware: reversing one polyline changes the value
    (a zigzag forces backtracking), while Hausdorff is set-based and
    cannot see the difference."""
    from fagi_gis_spark.operators.trajectory import frechet_by_key, hausdorff_by_key

    A = [(0, 0), (10, 0), (20, 0)]
    B = [(20, 1), (10, 1), (0, 1)]  # same points as A shifted, reversed order
    rows = []
    for uid, b in ((1, B), (2, list(reversed(B)))):
        rows += [(uid, 0, i, x, y) for i, (x, y) in enumerate(A)]
        rows += [(uid, 1, i, x, y) for i, (x, y) in enumerate(b)]
    df = spark.createDataFrame(
        rows, "user_id long, side int, seq long, x long, y long"
    )
    f = {r.user_id: r.f2_udeg2 for r in frechet_by_key(df).collect()}
    h = {r.user_id: r.h2_udeg2 for r in hausdorff_by_key(df).collect()}
    assert h[1] == h[2] == 1  # set-identical
    assert f[2] == 1 and f[1] == _brute_frechet2(A, B) and f[1] > f[2]
