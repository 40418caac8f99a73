"""IceTable snapshot-format contract: atomic optimistic commits, O(batch)
append metadata, time travel, incremental scan, stats-based file
skipping, copy-on-write merge rewriting only key-overlapping files,
rollback, and snapshot expiry with orphan removal."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from fagi_gis_spark.sources.icetable import CommitConflict, IceTable


def _mkdf(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit(tag + ":"), F.col("id").cast("string")).alias("v"),
    )


@pytest.fixture()
def table(tmp_path):
    return IceTable.create(str(tmp_path / "t"))


def test_append_time_travel_incremental(spark, table):
    s1 = table.append(_mkdf(spark, 0, 100).repartition(4), stats_cols=["k"])
    s2 = table.append(_mkdf(spark, 100, 130).repartition(2), stats_cols=["k"])
    assert table.current_snapshot_id() == s2
    assert table.read(spark).count() == 130
    # time travel reproduces snapshot 1 exactly
    old = table.read(spark, snapshot_id=s1)
    assert old.count() == 100
    assert old.agg(F.max("k")).first()[0] == 99
    # incremental scan returns exactly the appended batch
    inc = table.incremental(spark, s1, s2)
    assert sorted(r.k for r in inc.collect()) == list(range(100, 130))
    # ... and equals the full exceptAll diff
    diff = table.read(spark, snapshot_id=s2).exceptAll(old)
    assert inc.exceptAll(diff).isEmpty() and diff.exceptAll(inc).isEmpty()
    # append metadata cost is O(batch): snapshot 2 added ONE manifest and
    # re-referenced snapshot 1's untouched
    m1 = table._meta_for_snapshot(s1)["manifests"]
    m2 = table._meta_for_snapshot(s2)["manifests"]
    assert m2[: len(m1)] == m1 and len(m2) == len(m1) + 1


def test_stats_pruning_skips_files(spark, table):
    # 8 files, each covering a distinct k range (repartitionByRange keeps
    # ranges disjoint per output file)
    df = _mkdf(spark, 0, 800).repartitionByRange(8, "k")
    table.append(df, stats_cols=["k"])
    kept, skipped = table.plan_files(where=[("k", 250, 260)])
    assert len(skipped) >= 6, f"expected most files skipped, got {len(skipped)}"
    got = table.read(spark, where=[("k", 250, 260)])
    assert sorted(r.k for r in got.collect()) == list(range(250, 261))
    # open-ended predicate sides
    kept_hi, _ = table.plan_files(where=[("k", 700, None)])
    assert all(e["stats"]["k"][1] >= 700 for e in kept_hi)
    # footer stats agree with the data
    for e in table.files():
        lo, hi, nulls = e["stats"]["k"]
        assert 0 <= lo <= hi <= 799 and nulls == 0


def test_merge_rewrites_only_overlapping_files(spark, table):
    table.append(_mkdf(spark, 0, 800).repartitionByRange(8, "k"), stats_cols=["k"])
    n_files = len(table.files())
    # update keys land in exactly one file's range, plus brand-new keys
    updates = _mkdf(spark, 10, 20, tag="upd").unionByName(
        _mkdf(spark, 900, 905, tag="new")
    )
    _, rewritten, carried = table.merge_by_key(spark, updates, "k")
    assert rewritten <= 2 and carried >= n_files - 2
    cur = {r.k: r.v for r in table.read(spark).collect()}
    assert len(cur) == 805
    assert cur[15] == "upd:15" and cur[900] == "new:900" and cur[25] == "a:25"
    # pre-merge snapshot still reads the old values (time travel)
    pre = {r.k: r.v for r in table.read(spark, snapshot_id=1).collect()}
    assert pre[15] == "a:15" and 900 not in pre


def test_commit_conflict_and_append_retry(spark, table):
    s1 = table.append(_mkdf(spark, 0, 10), stats_cols=["k"])
    # a racing writer commits version s1+1 out from under a non-append
    # operation -> CommitConflict (the caller must re-derive)
    meta = table._load_meta(s1)
    racer = dict(meta, snapshot_id=s1 + 1, parent_snapshot_id=s1)
    with open(table._meta_path(s1 + 1), "w") as f:
        json.dump(racer, f)
    with pytest.raises(CommitConflict):
        table._commit("merge", meta["manifests"], meta["schema"], {}, s1)
    # ... but an append against the same stale parent retries and lands
    v = table.append(_mkdf(spark, 10, 20), stats_cols=["k"])
    assert v == s1 + 2
    assert table.read(spark).count() == 20


def test_overwrite_rollback_expire(spark, table, tmp_path):
    s1 = table.append(_mkdf(spark, 0, 50), stats_cols=["k"])
    s2 = table.overwrite(_mkdf(spark, 1000, 1010, tag="ow"), stats_cols=["k"])
    assert table.read(spark).count() == 10
    assert table.read(spark, snapshot_id=s1).count() == 50
    s3 = table.rollback(s1)
    assert table.current_snapshot_id() == s3
    assert sorted(r.k for r in table.read(spark).collect()) == list(range(50))
    ops = [s["operation"] for s in table.snapshots()]
    assert ops == ["append", "overwrite", "rollback"]
    # expire everything but the rollback: s2's overwrite files become
    # orphans and are deleted; s1's files survive (s3 references them)
    before_files = {
        f for f in os.listdir(table.data_dir)
    }
    gone = table.expire_snapshots(keep_last=1)
    assert gone["snapshots_removed"] == 2 and gone["files_removed"] >= 1
    assert table.read(spark).count() == 50  # current snapshot intact
    assert set(os.listdir(table.data_dir)) < before_files
    with pytest.raises((KeyError, FileNotFoundError)):
        table.read(spark, snapshot_id=s2)


def test_empty_plan_keeps_schema(spark, table):
    table.append(_mkdf(spark, 0, 10), stats_cols=["k"])
    df = table.read(spark, where=[("k", 10_000, 20_000)])
    assert df.columns == ["k", "v"] and df.count() == 0
    inc = table.incremental(spark, table.current_snapshot_id())
    assert inc.columns == ["k", "v"] and inc.count() == 0
