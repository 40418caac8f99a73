"""Fusion-action learning — SURVEY.md §2.6 A8/A9.

Reference: liblinear L2R_L2LOSS_SVC (solver 2), C=0.1, EPS=0.01
(/root/reference/fagi-gis/src/main/java/gr/athenainnovation/imis/fusion/gis/learning/core/TrainWorker.java:31-32,90);
features = BooleanVector.createGeometryFeatures
(learning/vectors/BooleanVector.java:56-105, bins to :812). Spark-first:
features as ONE Arrow-batched pandas UDF emitting a dense vector, MLlib
LinearSVC (same squared-hinge L2 SVM family) for training, distributed
transform for prediction.

Dense feature layout — same driver list and bin edges as the reference,
in order (reference method : slots):

====================================  =====  =========
geometryTypeFeature (any-side bits)   8      [0,8)
percentageOfAreaDifference            20     [8,28)
percentageOfPointsDifference          21     [28,49)
percentageOfMeanEdgeDifference        21     [49,70)
percentageOfMeanEdgeAverage           32     [70,102)
percentageOfVariance                  21     [102,123)
cross/touch/intersect/within×2/
contains×2 (JTS relate)               7      [123,130)
sumOfNumberOfPointsFeature            11     [130,141)
linkLength (centroid dist ×1e6)       5      [141,146)
unitVectorAngle                       4      [146,150)
sumOfArea                             25     [150,175)
====================================  =====  =========

The %-loop slot counts include the accumulation quirk: Java's
``for(step=-1; step<1; step+=0.1)`` accumulates to 0.9999999999999998
(still < 1), so the loop body runs 21 times from start=-1 and 20 times
from start=-0.9 — one more comparison than the closed form suggests.
pct in [0.8999999999999998, 0.9999999999999998) therefore lands in that
final accumulated slot; only pct >= 0.9999999999999998 (and NaN) falls
through with no bit set.

Fidelity notes (deliberate, documented):
* the reference emits sparse liblinear ids whose increments don't match
  the branch counts (e.g. SUM_OF_AREA_FEATURES=10 for 25 branches,
  linkLength writes id+1 in EVERY branch) — so several reference features
  collide on the same index. The dense layout keeps every bin
  distinguishable instead of replicating the id collisions.
* percentageOfPointsDifference replicates the reference's INTEGER
  division ((pointsA-pointsB)/maxPoints in Java ints truncates toward
  zero), so its value is in {-1, 0, 1} exactly as trained models see it.
* a %-bin loop that falls through (value >= last step, or NaN from 0/0)
  sets NO bit — same as the reference's for-loop running off the end.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fagi_gis_spark.geometry.measures import area, centroid, npoints
from fagi_gis_spark.geometry.topology import relate_flags
from fagi_gis_spark.geometry.wkt import Geom, parse_wkt

# any-side type bits, reference order (BooleanVector.java:106-149)
_TYPE_BITS = [
    "LINESTRING",
    "POLYGON",
    "LINEARRING",  # LinearRing/CircularString — never produced by this engine
    "POINT",
    "MULTILINESTRING",
    "MULTIPOLYGON",
    "MULTIPOINT",
    "GEOMETRYCOLLECTION",
]

_MEANS_AVG_EDGES = [
    0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0, 4.5, 5.0, 5.5, 6.0, 6.5, 7.0, 7.5, 8.0,
    8.5, 9.0, 9.5, 10.0, 11.0, 12.0, 15.0, 20.0, 25.0, 30.0, 35.0, 40.0, 50.0, 100.0,
    200.0,
]  # + else = 32 bins (BooleanVector.java:531-658)
_SUM_POINTS_EDGES = [10, 20, 30, 40, 50, 75, 100, 150, 200, 300]  # + else = 11
_SUM_AREA_EDGES = [
    50, 100, 150, 200, 250, 300, 350, 400, 450, 500, 750, 1000, 1250, 1500, 1750,
    2000, 2250, 2500, 2750, 3000, 3500, 4000, 5000, 10000,
]  # + else = 25
_DIST_EDGES = [4.0, 6.0, 8.0, 15.0]  # + else = 5 (linkLength, dist ×1e6)
_ANGLE_EDGES = [-math.pi / 4, 0.0, math.pi / 4]  # + else = 4

N_FEATURES = 8 + 20 + 21 + 21 + 32 + 21 + 7 + 11 + 5 + 4 + 25  # = 175
N_OWL_FEATURES = 20  # createOWLFeatures (BooleanVector.java:765-806)
N_FEATURES_OWL = N_FEATURES + N_OWL_FEATURES  # = 195


def _pct_bin(pct: float, start: float, n: int) -> int | None:
    """First i in [0,n) with pct < step, where step ACCUMULATES by 0.1
    from ``start`` — exactly the reference's for-loop
    (``for(step=-0.9; step<1; step+=0.1)``). The accumulation matters:
    repeated double addition gives e.g. 0.4999999999999999 at the 0.5
    boundary, so pct==0.5 lands one bin higher than the closed form
    start+0.1*i would put it. None = fell through (incl. NaN)."""
    step = start
    for i in range(n):
        if pct < step:
            return i
        step += 0.1
    return None


def _edge_bin(x: float, edges: list) -> int:
    for i, e in enumerate(edges):
        if x < e:
            return i
    return len(edges)


def _flat_coords(g: Geom) -> np.ndarray:
    """All coordinates in serialization order — the analogue of JTS
    Geometry.getCoordinates(), which the reference feeds to the edge-mean
    loop INCLUDING the spurious part-to-part and ring-closure joins."""
    t = g.gtype
    if t in ("POINT", "MULTIPOINT", "LINESTRING"):
        return np.asarray(g.data, dtype=float)
    if t in ("MULTILINESTRING", "POLYGON"):
        return np.vstack([np.asarray(p, dtype=float) for p in g.data])
    if t == "MULTIPOLYGON":
        return np.vstack(
            [np.asarray(r, dtype=float) for poly in g.data for r in poly]
        )
    # GEOMETRYCOLLECTION
    return np.vstack([_flat_coords(part) for part in g.data])


def _edge_stats(g: Geom) -> tuple[float, float]:
    """(mean, variance) of consecutive-coordinate edge lengths —
    BooleanVector.percentageOfMeanEdgeDifference (POINT contributes one
    zero-length pseudo-edge, like the reference)."""
    if g.gtype == "POINT":
        return 0.0, 0.0
    c = _flat_coords(g)
    if len(c) < 2:
        return 0.0, 0.0
    d = np.sqrt(((c[1:] - c[:-1]) ** 2).sum(axis=1))
    mean = float(d.mean())
    return mean, float(((d - mean) ** 2).mean())


_FEAT_SCHEMA = T.ArrayType(T.DoubleType())


def pair_feature_vector(ga: Geom | None, gb: Geom | None) -> np.ndarray:
    """One pair's dense BooleanVector (plain-python kernel, shared by the
    Arrow UDF and the pytest differential oracle)."""
    v = np.zeros(N_FEATURES, dtype=np.float64)
    if ga is None or gb is None:
        return v
    ta, tb = ga.gtype, gb.gtype

    # 1. any-side geometry-type bits
    for i, t in enumerate(_TYPE_BITS):
        if ta == t or tb == t:
            v[i] = 1.0

    # 2. %Δ area (reference: (areaA-areaB)/maxArea, 0 if both 0)
    aa, ab = area(ga), area(gb)
    mx = max(aa, ab)
    pct_area = 0.0 if (aa == 0 and ab == 0) else (aa - ab) / mx
    b = _pct_bin(pct_area, -0.9, 20)
    if b is not None:
        v[8 + b] = 1.0

    # 3. %Δ points — Java INT division (value in {-1,0,1})
    na, nb = npoints(ga), npoints(gb)
    mp = max(na, nb)
    pct_pts = 0.0 if (na == 0 and nb == 0) else float(int((na - nb) / mp))
    b = _pct_bin(pct_pts, -1.0, 21)
    if b is not None:
        v[28 + b] = 1.0

    # 4. %Δ mean edge (NaN when both means are 0 -> no bit, like Java)
    mean_a, var_a = _edge_stats(ga)
    mean_b, var_b = _edge_stats(gb)
    max_mean = max(mean_a, mean_b)
    pct_mean = (mean_a - mean_b) / max_mean if max_mean != 0 else float("nan")
    b = _pct_bin(pct_mean, -1.0, 21)
    if b is not None:
        v[49 + b] = 1.0

    # 5. mean-of-means bins
    v[70 + _edge_bin((mean_a + mean_b) / 2.0, _MEANS_AVG_EDGES)] = 1.0

    # 6. %Δ edge variance
    max_var = max(var_a, var_b)
    pct_var = (var_a - var_b) / max_var if max_var != 0 else float("nan")
    b = _pct_bin(pct_var, -1.0, 21)
    if b is not None:
        v[102 + b] = 1.0

    # 7. topology bits: cross, touch, intersect, AwithinB, BwithinA,
    #    AcontainsB, BcontainsA (real relate, not bbox proxies)
    try:
        flags = relate_flags(ga, gb)
        for i, f in enumerate(flags):
            v[123 + i] = float(f)
    except ValueError:
        pass  # GEOMETRYCOLLECTION etc: JTS would throw inside relate too

    # 8. Σ points bins
    v[130 + _edge_bin(na + nb, _SUM_POINTS_EDGES)] = 1.0

    # 9. centroid distance ×1e6 bins (reference uses raw coordinate-space
    #    distance — degrees here — times 1e6)
    ca, cb = centroid(ga), centroid(gb)
    dist = math.hypot(ca[0] - cb[0], ca[1] - cb[1]) * 1e6
    v[141 + _edge_bin(dist, _DIST_EDGES)] = 1.0

    # 10. unit-vector angle bins (atan(dy/dx); NaN from 0/0 falls into the
    #     reference's final else branch -> last bin)
    dx, dy = cb[0] - ca[0], cb[1] - ca[1]
    if dx == 0 and dy == 0:
        angle = float("nan")  # Java 0/0 -> NaN -> final else branch
    elif dx == 0:
        angle = math.copysign(math.pi / 2, dy)  # Java atan(±Infinity)
    else:
        angle = math.atan(dy / dx)  # slope = unitY/unitX == dy/dx
    bin_i = 3  # the reference's final else catches NaN and angle >= π/4
    for i, e in enumerate(_ANGLE_EDGES):
        if angle < e:
            bin_i = i
            break
    v[146 + bin_i] = 1.0

    # 11. Σ area bins
    v[150 + _edge_bin(aa + ab, _SUM_AREA_EDGES)] = 1.0
    return v


def owl_feature_slice(owl_a: str | None, owl_b: str | None) -> np.ndarray:
    """createOWLFeatures (BooleanVector.java:765-806): %Δ of the two
    sides' OWL class COUNTS (comma-joined class strings, Java split
    semantics: ''.split(',') has length 1), binned with the same -0.9..0.9
    percentage loop as the area feature (20 comparisons incl. the
    accumulated ~0.99999... step). 20 slots (the reference
    increments by OWL_CLASS=20 — one more sparse-id off-by-one)."""
    v = np.zeros(N_OWL_FEATURES, dtype=np.float64)
    size_a = len((owl_a or "").split(","))
    size_b = len((owl_b or "").split(","))
    pct = (size_a - size_b) / max(size_a, size_b)
    b = _pct_bin(pct, -0.9, 20)
    if b is not None:
        v[b] = 1.0
    return v


@F.pandas_udf(_FEAT_SCHEMA)
def u_pair_features(wkt_a: pd.Series, wkt_b: pd.Series) -> pd.Series:
    """BooleanVector.createGeometryFeatures per linked pair, one Arrow
    batch pass (see module docstring for the dense layout)."""
    out = []
    for a_s, b_s in zip(wkt_a, wkt_b):
        out.append(pair_feature_vector(parse_wkt(a_s), parse_wkt(b_s)).tolist())
    return pd.Series(out)


@F.pandas_udf(_FEAT_SCHEMA)
def u_pair_features_owl(
    wkt_a: pd.Series, wkt_b: pd.Series, owl_a: pd.Series, owl_b: pd.Series
) -> pd.Series:
    """Geometry features ++ OWL class-count slice (the full BooleanVector
    driver list: createGeometryFeatures + createOWLFeatures)."""
    out = []
    for a_s, b_s, oa, ob in zip(wkt_a, wkt_b, owl_a, owl_b):
        geo = pair_feature_vector(parse_wkt(a_s), parse_wkt(b_s))
        out.append(np.concatenate([geo, owl_feature_slice(oa, ob)]).tolist())
    return pd.Series(out)


def pair_features(
    pairs: DataFrame, triples_a: DataFrame | None = None, triples_b: DataFrame | None = None
) -> DataFrame:
    """Feature vectors for linked pairs (input: linked_pairs output).

    With ``triples_a``/``triples_b`` supplied, each side's rdf:type
    objects are collected per subject (sorted, comma-joined — the
    MapPair.getOWLClassA wire form) and the OWL class-count slice is
    appended (195 dims); otherwise geometry features only (175 dims)."""
    if triples_a is None or triples_b is None:
        return pairs.select(
            "subject_a", "subject_b", u_pair_features(F.col("wkt_a"), F.col("wkt_b")).alias("fv")
        )
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

    def classes(triples, out_col):
        return (
            triples.filter(F.col("predicate") == rdf_type)
            .groupBy("subject")
            .agg(F.array_join(F.array_sort(F.collect_set("object")), ",").alias(out_col))
        )

    ca = classes(triples_a, "owl_a").withColumnRenamed("subject", "subject_a")
    cb = classes(triples_b, "owl_b").withColumnRenamed("subject", "subject_b")
    joined = pairs.join(ca, "subject_a", "left").join(cb, "subject_b", "left")
    return joined.select(
        "subject_a",
        "subject_b",
        u_pair_features_owl(
            F.col("wkt_a"), F.col("wkt_b"), F.col("owl_a"), F.col("owl_b")
        ).alias("fv"),
    )


def train_action_classifier(
    labeled: DataFrame,
    label_col: str = "label",
    reg: float = 0.1,
    tol: float = 0.01,
    max_iter: int = 100,
):
    """Train the fusion-action SVM. ``labeled`` = pair_features output +
    binary label column. Hyperparameters mirror TrainWorker.java:31-32
    (C=0.1 -> regParam, EPS=0.01 -> tol)."""
    from pyspark.ml.classification import LinearSVC
    from pyspark.ml.functions import array_to_vector

    df = labeled.withColumn("features", array_to_vector(F.col("fv")))
    svc = LinearSVC(
        regParam=reg, tol=tol, maxIter=max_iter, labelCol=label_col, featuresCol="features"
    )
    return svc.fit(df)


def predict_actions(model, feats: DataFrame) -> DataFrame:
    """Distributed prediction (Predictor.getPrediction:26-56 analogue)."""
    from pyspark.ml.functions import array_to_vector

    df = feats.withColumn("features", array_to_vector(F.col("fv")))
    return model.transform(df).select(
        "subject_a", "subject_b", F.col("prediction").cast("int").alias("action_pred")
    )
