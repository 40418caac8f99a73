"""Fusion-action learning — SURVEY.md §2.6 A8/A9.

Reference: liblinear L2R_L2LOSS_SVC (solver 2), C=0.1, EPS=0.01
(/root/reference/fagi-gis/src/main/java/gr/athenainnovation/imis/fusion/gis/learning/core/TrainWorker.java:31-32,90);
features = BooleanVector (learning/vectors/BooleanVector.java:56-105):
one-hot geometry types, binned %-deltas of area/points/edges, topology
bits, binned centroid distance. Spark-first: features as ONE Arrow-batched
pandas UDF emitting a vector, MLlib LinearSVC (same squared-hinge L2 SVM
family) for training, distributed transform for prediction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fagi_gis_spark.geometry.measures import DEG_TO_M, area, bbox, centroid, npoints
from fagi_gis_spark.geometry.wkt import parse_wkt

_GTYPES = ["POINT", "LINESTRING", "POLYGON", "MULTIPOINT", "MULTILINESTRING", "MULTIPOLYGON"]
N_FEATURES = 6 + 6 + 5 + 5 + 3 + 1  # onehot_a + onehot_b + bins + bins + topo + dist


def _bin5(x: float, edges=(0.1, 0.25, 0.5, 0.75)) -> int:
    for i, e in enumerate(edges):
        if x <= e:
            return i
    return len(edges)


_FEAT_SCHEMA = T.ArrayType(T.DoubleType())


@F.pandas_udf(_FEAT_SCHEMA)
def u_pair_features(wkt_a: pd.Series, wkt_b: pd.Series) -> pd.Series:
    """BooleanVector analogue: per linked pair, geometry-type one-hots,
    binned relative deltas (npoints, area), bbox topology bits, binned
    centroid distance. Vectorized per Arrow batch."""
    out = []
    for a_s, b_s in zip(wkt_a, wkt_b):
        v = np.zeros(N_FEATURES, dtype=np.float64)
        ga, gb = parse_wkt(a_s), parse_wkt(b_s)
        if ga is None or gb is None:
            out.append(v.tolist())
            continue
        if ga.gtype in _GTYPES:
            v[_GTYPES.index(ga.gtype)] = 1.0
        if gb.gtype in _GTYPES:
            v[6 + _GTYPES.index(gb.gtype)] = 1.0
        na, nb = npoints(ga), npoints(gb)
        dn = abs(na - nb) / max(na, nb, 1)
        v[12 + _bin5(dn)] = 1.0
        aa, ab = area(ga), area(gb)
        da = abs(aa - ab) / max(aa, ab, 1e-12) if (aa or ab) else 0.0
        v[17 + _bin5(da)] = 1.0
        ba, bb_ = bbox(ga), bbox(gb)
        overlap = not (ba[2] < bb_[0] or bb_[2] < ba[0] or ba[3] < bb_[1] or bb_[3] < ba[1])
        within_a = ba[0] >= bb_[0] and ba[1] >= bb_[1] and ba[2] <= bb_[2] and ba[3] <= bb_[3]
        within_b = bb_[0] >= ba[0] and bb_[1] >= ba[1] and bb_[2] <= ba[2] and bb_[3] <= ba[3]
        v[22] = float(overlap)
        v[23] = float(within_a)
        v[24] = float(within_b)
        ca, cb = centroid(ga), centroid(gb)
        dist_m = float(np.hypot(ca[0] - cb[0], ca[1] - cb[1]) * DEG_TO_M)
        v[25] = min(dist_m / 1000.0, 1.0)
        out.append(v.tolist())
    return pd.Series(out)


def pair_features(pairs: DataFrame) -> DataFrame:
    """Feature vectors for linked pairs (input: linked_pairs output)."""
    return pairs.select(
        "subject_a", "subject_b", u_pair_features(F.col("wkt_a"), F.col("wkt_b")).alias("fv")
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
