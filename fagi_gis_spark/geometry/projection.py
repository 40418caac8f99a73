"""Lambert Conformal Conic (2SP) projection — the metric frame the
reference rotates in.

Reference: the GeomRotate SQL function transforms to EPSG 2249 before
rotating and back to 4326 after
(/root/reference/fagi-gis/src/main/resources/schema.sql:103;
geotransformations/ShiftAToB.java:196-198). No projection library ships
in this sandbox, so the projection is implemented from the published
closed forms: John P. Snyder, *Map Projections — A Working Manual*
(USGS Professional Paper 1395, 1987), eqs. 14-15/15-1..15-11 (ellipsoidal
Lambert Conformal Conic, two standard parallels), with the EPSG 2249
parameter set (NAD83 / Massachusetts Mainland, US survey feet) from the
public EPSG registry.

Everything is numpy-vectorized over coordinate arrays; round-trip error
on the test window is << 1e-9 degrees (see tests).
"""

from __future__ import annotations

import numpy as np

# GRS80 ellipsoid
_A_M = 6378137.0
_INV_F = 298.257222101
_E2 = (2.0 - 1.0 / _INV_F) / _INV_F  # e² = 2f - f²
_E = np.sqrt(_E2)

# US survey foot (exact legal definition 1200/3937 m)
US_FT = 1200.0 / 3937.0


def _m(phi):
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1.0 - _E2 * s * s)


def _t(phi):
    s = np.sin(phi)
    return np.tan(np.pi / 4.0 - phi / 2.0) / ((1.0 - _E * s) / (1.0 + _E * s)) ** (_E / 2.0)


class LambertConformalConic:
    """Ellipsoidal LCC-2SP (Snyder 1987, §15). Units follow ``unit_m``
    (metres per output unit; 1.0 = metres, US_FT = US survey feet)."""

    def __init__(
        self,
        lat1_deg: float,
        lat2_deg: float,
        lat0_deg: float,
        lon0_deg: float,
        false_easting: float,
        false_northing: float,
        unit_m: float = 1.0,
    ):
        self.lon0 = np.radians(lon0_deg)
        self.fe = false_easting
        self.fn = false_northing
        self.a = _A_M / unit_m  # semi-major axis in output units
        p1, p2, p0 = np.radians([lat1_deg, lat2_deg, lat0_deg])
        m1, m2 = _m(p1), _m(p2)
        t1, t2, t0 = _t(p1), _t(p2), _t(p0)
        self.n = (np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2))
        self.f_ = m1 / (self.n * t1**self.n)
        self.rho0 = self.a * self.f_ * t0**self.n

    def forward(self, lon_deg: np.ndarray, lat_deg: np.ndarray):
        """(lon, lat) degrees -> (x, y) projected units."""
        phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
        lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
        rho = self.a * self.f_ * _t(phi) ** self.n
        theta = self.n * (lam - self.lon0)
        x = rho * np.sin(theta) + self.fe
        y = self.rho0 - rho * np.cos(theta) + self.fn
        return x, y

    def inverse(self, x: np.ndarray, y: np.ndarray):
        """(x, y) projected units -> (lon, lat) degrees. The latitude
        iteration (Snyder eq. 7-9) converges quadratically; 8 rounds give
        full float64 precision."""
        xp = np.asarray(x, dtype=np.float64) - self.fe
        yp = self.rho0 - (np.asarray(y, dtype=np.float64) - self.fn)
        rho = np.sign(self.n) * np.sqrt(xp * xp + yp * yp)
        theta = np.arctan2(np.sign(self.n) * xp, np.sign(self.n) * yp)
        t = (rho / (self.a * self.f_)) ** (1.0 / self.n)
        lam = theta / self.n + self.lon0
        phi = np.pi / 2.0 - 2.0 * np.arctan(t)
        for _ in range(8):
            s = np.sin(phi)
            phi = np.pi / 2.0 - 2.0 * np.arctan(
                t * ((1.0 - _E * s) / (1.0 + _E * s)) ** (_E / 2.0)
            )
        return np.degrees(lam), np.degrees(phi)


#: EPSG 2249 — NAD83 / Massachusetts Mainland (US survey feet): the SRID
#: hard-coded in the reference's GeomRotate (schema.sql:103).
EPSG_2249 = LambertConformalConic(
    lat1_deg=42.0 + 41.0 / 60.0,
    lat2_deg=41.0 + 43.0 / 60.0,
    lat0_deg=41.0,
    lon0_deg=-71.5,
    false_easting=656166.667,
    false_northing=2460625.0,
    unit_m=US_FT,
)


class WebMercator:
    """Spherical ("Google") Web Mercator — EPSG 900913/3857. The SRID the
    reference's shift scoring transforms to before measuring distance
    (geotransformations/ShiftAToB.java:141: ST_Transform(geom, 900913)).
    Closed form: x = a·λ, y = a·ln(tan(π/4 + φ/2)) on the WGS84 semi-major
    axis (Snyder 1987, eqs. 7-1/7-2 with R = a)."""

    a = _A_M

    def forward(self, lon_deg: np.ndarray, lat_deg: np.ndarray):
        lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
        phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
        return self.a * lam, self.a * np.log(np.tan(np.pi / 4.0 + phi / 2.0))

    def inverse(self, x: np.ndarray, y: np.ndarray):
        lam = np.asarray(x, dtype=np.float64) / self.a
        phi = 2.0 * np.arctan(np.exp(np.asarray(y, dtype=np.float64) / self.a)) - np.pi / 2.0
        return np.degrees(lam), np.degrees(phi)


class LambertAzimuthalEqualArea:
    """Spherical oblique Lambert Azimuthal Equal-Area (Snyder 1987,
    eqs. 24-2..24-4 / 22-4). EPSG 2163 (US National Atlas Equal Area) is
    this projection on the authalic-ish sphere R = 6370997 m centred at
    (45°N, 100°W) — the SRID the reference's clustering displacement
    transforms to (clustering/GeoClusterer.java:257)."""

    def __init__(self, lat0_deg: float, lon0_deg: float, radius_m: float,
                 false_easting: float = 0.0, false_northing: float = 0.0):
        self.phi0 = np.radians(lat0_deg)
        self.lam0 = np.radians(lon0_deg)
        self.r = radius_m
        self.fe = false_easting
        self.fn = false_northing

    def forward(self, lon_deg: np.ndarray, lat_deg: np.ndarray):
        lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
        phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
        dl = lam - self.lam0
        kp = np.sqrt(
            2.0
            / (1.0 + np.sin(self.phi0) * np.sin(phi) + np.cos(self.phi0) * np.cos(phi) * np.cos(dl))
        )
        x = self.r * kp * np.cos(phi) * np.sin(dl) + self.fe
        y = (
            self.r
            * kp
            * (np.cos(self.phi0) * np.sin(phi) - np.sin(self.phi0) * np.cos(phi) * np.cos(dl))
            + self.fn
        )
        return x, y


class EllipsoidalLAEA:
    """Ellipsoidal oblique Lambert Azimuthal Equal-Area (Snyder 1987,
    PP 1395 §24): authalic-latitude q-series (eqs. 3-11/3-12) on the
    GRS80 ellipsoid, forward eqs. 24-17..24-20, inverse eqs.
    24-26..24-27 with the latitude iteration of eq. 3-16.  This is the
    REAL EPSG 3035 (ETRS89-extended / LAEA Europe) formulation — the
    frame KeepMostPointsAndTranslateTransformation.java:80 transforms
    to — replacing the r3 authalic-sphere stand-in (kept as
    ``EPSG_3035_SPHERICAL``; grids differ by up to ~0.3%)."""

    def __init__(self, lat0_deg: float, lon0_deg: float,
                 false_easting: float = 0.0, false_northing: float = 0.0):
        self.lam0 = np.radians(lon0_deg)
        self.fe = false_easting
        self.fn = false_northing
        self.a = _A_M
        phi0 = np.radians(lat0_deg)
        self.qp = float(self._q(np.array(np.pi / 2.0)))
        q0 = float(self._q(np.array(phi0)))
        self.beta1 = np.arcsin(q0 / self.qp)
        self.rq = self.a * np.sqrt(self.qp / 2.0)  # eq. 3-13
        m1 = float(_m(phi0))
        self.d = self.a * m1 / (self.rq * np.cos(self.beta1))  # eq. 24-20

    @staticmethod
    def _q(phi):
        # eq. 3-12: q = (1-e^2)[sin(phi)/(1-e^2 sin^2 phi)
        #                       - (1/2e) ln((1-e sin phi)/(1+e sin phi))]
        s = np.sin(phi)
        return (1.0 - _E2) * (
            s / (1.0 - _E2 * s * s)
            - (1.0 / (2.0 * _E)) * np.log((1.0 - _E * s) / (1.0 + _E * s))
        )

    def forward(self, lon_deg: np.ndarray, lat_deg: np.ndarray):
        lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
        phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
        beta = np.arcsin(np.clip(self._q(phi) / self.qp, -1.0, 1.0))  # eq. 3-11
        dl = lam - self.lam0
        sb1, cb1 = np.sin(self.beta1), np.cos(self.beta1)
        b = self.rq * np.sqrt(
            2.0 / (1.0 + sb1 * np.sin(beta) + cb1 * np.cos(beta) * np.cos(dl))
        )  # eq. 24-19
        x = b * self.d * np.cos(beta) * np.sin(dl) + self.fe  # eq. 24-17
        y = (b / self.d) * (cb1 * np.sin(beta) - sb1 * np.cos(beta) * np.cos(dl)) + self.fn  # eq. 24-18
        return x, y

    def inverse(self, x: np.ndarray, y: np.ndarray):
        xp = (np.asarray(x, dtype=np.float64) - self.fe) / self.d
        yp = (np.asarray(y, dtype=np.float64) - self.fn) * self.d
        rho = np.sqrt(xp * xp + yp * yp)
        # the projection center itself has rho = 0 — guard the division
        safe_rho = np.where(rho == 0.0, 1.0, rho)
        ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * self.rq), -1.0, 1.0))  # eq. 24-29
        sb1, cb1 = np.sin(self.beta1), np.cos(self.beta1)
        q = self.qp * (
            np.cos(ce) * sb1 + yp * np.sin(ce) * cb1 / safe_rho
        )  # eq. 24-27
        q = np.where(rho == 0.0, self.qp * sb1, q)
        lam = self.lam0 + np.arctan2(
            xp * np.sin(ce),
            safe_rho * cb1 * np.cos(ce) - yp * sb1 * np.sin(ce),
        )  # eq. 24-26
        # latitude from q: eq. 3-16 iteration (quadratic convergence)
        phi = np.arcsin(np.clip(q / 2.0, -1.0, 1.0))
        for _ in range(10):
            s = np.sin(phi)
            denom = 1.0 - _E2 * s * s
            phi = phi + (denom * denom / (2.0 * np.cos(phi))) * (
                q / (1.0 - _E2)
                - s / denom
                + (1.0 / (2.0 * _E)) * np.log((1.0 - _E * s) / (1.0 + _E * s))
            )
        return np.degrees(lam), np.degrees(phi)


#: EPSG 900913 — spherical Web Mercator (ShiftAToB.score's ST_Transform target)
EPSG_900913 = WebMercator()

#: EPSG 2163 — US National Atlas Equal Area (GeoClusterer's ST_Transform target)
EPSG_2163 = LambertAzimuthalEqualArea(lat0_deg=45.0, lon0_deg=-100.0, radius_m=6370997.0)

#: EPSG 3035 — ETRS89-extended / LAEA Europe, the REAL ellipsoidal
#: formulation (Snyder q-series on GRS80), center (52N, 10E), false
#: origin (4321000, 3210000).
EPSG_3035 = EllipsoidalLAEA(
    lat0_deg=52.0, lon0_deg=10.0,
    false_easting=4321000.0, false_northing=3210000.0,
)

#: The r3 authalic-sphere stand-in for 3035, kept for comparability and
#: as the cheap spherical option (deviates from the ellipsoidal grid by
#: up to ~0.3% in position; equal-area property holds on its sphere).
EPSG_3035_SPHERICAL = LambertAzimuthalEqualArea(
    lat0_deg=52.0, lon0_deg=10.0, radius_m=6371007.1809,
    false_easting=4321000.0, false_northing=3210000.0,
)


def projection_for_srid(srid: int):
    """The metric frames the reference hard-codes (900913 scoring, 2163
    clustering, 2249 rotation), plus ellipsoidal 3035 for Europe-LAEA
    workloads (the spherical stand-in stays reachable as
    ``EPSG_3035_SPHERICAL`` for callers that want the r3 grid)."""
    if srid == 900913 or srid == 3857:
        return EPSG_900913
    if srid == 2163:
        return EPSG_2163
    if srid == 3035:
        return EPSG_3035
    if srid == 2249:
        return EPSG_2249
    raise ValueError(f"no projection parameter set for SRID {srid}")
