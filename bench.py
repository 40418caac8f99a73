"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
 "sf": ..., "throughput_rows_per_sec": ...}

Each query is forced end-to-end with the noop sink (so UDF/projection
columns are actually computed, not pruned by count()), executed
$SPARK_GRAFT_REPEATS times (default 2), and reported as the per-query
MINIMUM — the steady-state time, robust to transient host contention
spikes on the shared sandbox (observed: the same unchanged query varying
2.5s <-> 23s across adjacent runs). The aggregation is recorded in the
JSON (``repeats`` / ``agg``).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "radius_join_150m",
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


def run(sf_dir: str | None = None, cores: str | None = None, names=None) -> dict:
    from fagi_gis_spark import registry
    from fagi_gis_spark.session import get_spark

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench", cores=cores)

    qs = registry.queries()
    names = names or [n for n in HEADLINE if n in qs]
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    total_rows_in = spark.read.parquet(f"{sf_dir}/orders.parquet").count()

    # warmup: spawn python workers + JIT codegen so the first measured
    # query doesn't absorb one-time session costs
    from pyspark.sql import functions as F

    spark.range(0, 500_000, 1, 8).select((F.col("id") * 7 % 13).alias("x")).groupBy(
        "x"
    ).count().collect()
    qs["fuse_keep_a"](spark, sf_dir).limit(1000).write.format("noop").mode("overwrite").save()

    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))
    for name in names:
        best = None
        for _ in range(repeats):
            # construction is timed too: query functions may run planning
            # work (e.g. fitting a quantizer), and excluding it would
            # under-report such queries
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    return {
        "metric": "headline suite wall time (spatial join + tiling + fusion + dedup + ann)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "cores": cores,
        "repeats": repeats,
        "agg": "min",
        "input_rows": total_rows_in,
        "throughput_rows_per_sec": round(total_rows_in * len(names) / total, 1) if total else None,
    }


if __name__ == "__main__":
    result = run()
    print(json.dumps(result))
