"""Extra benchmarking / plan-capture harness for optimization rounds.

NOT the frozen driver bench (`bench.py` is the measured contract; this
file exists so optimization work can isolate queries, capture
`.explain("formatted")` output, and time individual queries with the
noop sink per the optimization guide §1 without touching the frozen
harness).

Usage:
  python bench_extra.py time  [sf_dir] [query ...]   # per-query noop timings (1 run each)
  python bench_extra.py plans [sf_dir] [out_dir] [query ...]  # dump explain("formatted")
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
    "radius_join_150m",
    "hex_radius_join_150m",
    "s2_radius_join_150m",
    "s2_cells",
    "knn_conflation",
    "tile_assign",
    "pip_assign",
    "fuse_keep_a",
    "fuse_most_points",
    "fuse_shift_a_to_b",
    "discover_links_exact",
    "dedup_minhash_lsh",
    "dedup_exact",
    "ann_cosine_topk",
    "doc_quality",
    "events_windowed_agg",
    "events_sessionize",
    "multimodal_decode_stats",
]


def _spark():
    from fagi_gis_spark.session import get_spark

    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench_extra", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _warmup(spark, qs, sf_dir):
    from pyspark.sql import functions as F

    spark.range(0, 500_000, 1, 8).select((F.col("id") * 7 % 13).alias("x")).groupBy(
        "x"
    ).count().collect()
    qs["fuse_keep_a"](spark, sf_dir).limit(1000).write.format("noop").mode(
        "overwrite"
    ).save()


def time_queries(sf_dir: str, names: list[str], repeats: int = 1) -> dict:
    from fagi_gis_spark import registry

    spark = _spark()
    qs = registry.queries()
    _warmup(spark, qs, sf_dir)
    out = {}
    for _ in range(repeats):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            out[name] = min(out.get(name, dt), round(dt, 3))
            spark.sparkContext.setJobDescription(None)
    return out


def dump_plans(sf_dir: str, out_dir: str, names: list[str], suffix: str) -> None:
    from contextlib import redirect_stdout

    from fagi_gis_spark import registry

    spark = _spark()
    qs = registry.queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f, redirect_stdout(f):
            df.explain("formatted")
        print(f"wrote {path}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    if mode == "time":
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0"
        names = sys.argv[3:] or DEFAULT_QUERIES
        reps = int(os.environ.get("BENCH_EXTRA_REPEATS", "1"))
        res = time_queries(sf_dir, names, repeats=reps)
        res["total"] = round(sum(res.values()), 3)
        print(json.dumps(res))
    elif mode == "plans":
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
        out_dir = sys.argv[3] if len(sys.argv) > 3 else "plans/r06"
        suffix = os.environ.get("BENCH_EXTRA_SUFFIX", "before")
        names = sys.argv[4:] or DEFAULT_QUERIES
        dump_plans(sf_dir, out_dir, names, suffix)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
