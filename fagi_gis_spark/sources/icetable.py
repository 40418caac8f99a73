"""``IceTable`` — a from-scratch snapshot table format with Iceberg's
public-spec semantics (iceberg.apache.org/spec), pure Python + parquet.

The north rule runs this engine "over Iceberg tables ... resumable from
checkpoint"; the sandbox image carries no Iceberg jars, so this module
implements the *format semantics* directly rather than stubbing them:

* **Versioned metadata + atomic optimistic commit** — each commit writes
  ``metadata/v<N>.metadata.json`` via the HadoopCatalog protocol: stage
  to a temp file, then ``os.link`` to the version name (link fails with
  ``FileExistsError`` when another writer won version N; the loser
  re-reads the new table state, re-applies, retries at N+1).  A
  ``version-hint.text`` pointer is refreshed best-effort (temp+rename);
  readers fall back to scanning ``v*.metadata.json`` when the hint is
  stale, so a crashed writer can never corrupt readers.
* **Manifest reuse = O(new files) commit cost** — a snapshot's file list
  is a set of *manifest* parquet files (``path, rows, bytes,
  stats_json``); an append writes ONE new manifest for the added files
  and re-references its parent's manifests untouched.  At 10^12 rows the
  commit cost is proportional to the batch, never to the table — the
  same design reason Iceberg splits manifest-list/manifest files.
* **Per-file column stats + scan-time file skipping** — min/max/nulls
  per tracked column are read from the parquet FOOTERS after the write
  (metadata-only reads, cost ∝ file count, exactly how Iceberg collects
  stats); ``read(..., where=[(col, lo, hi)])`` drops every file whose
  range cannot intersect the predicate BEFORE Spark sees a path, then
  re-applies the predicate as a normal pushed-down filter.
* **Time travel** (``read(snapshot_id=...)``), **incremental scan**
  (``incremental(from_id, to_id)`` — files added between two snapshots;
  feeds the day-2 dedup queries so the corpus is never rescanned),
  **rollback**, and **snapshot expiry with orphan-file removal**.
* **Copy-on-write MERGE** (``merge_by_key``) — update keys are joined
  against the per-file key ranges (broadcast ranges, ids-only), so ONLY
  data files that can contain a matched key are rewritten; untouched
  files carry over by reference.  This is Iceberg v2's copy-on-write
  MERGE INTO shape, and the reference's delete-then-insert write-back
  (SURVEY.md S5/S8) done at file granularity instead of table
  granularity.

Reference counterpart: the engine-wide substitute for the PostGIS store
the reference writes into (``DatabaseInitialiser.java`` /
``schema.sql``) — plus the durability the reference lacks entirely (its
only checkpoint is a Virtuoso WAL flush,
``SPARQLUtilities.java:69-99``).

Scale notes: all driver-side work here is metadata-proportional (file
counts), never data-proportional; the data path is always
``spark.read.parquet(<pruned file list>)`` so Catalyst keeps pushdown,
column pruning, and vectorized scans.  Row data never passes through
the driver.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["IceTable", "CommitConflict"]

FORMAT_VERSION = 2
_HINT = "version-hint.text"


class CommitConflict(RuntimeError):
    """Another writer committed a conflicting snapshot and the operation
    cannot be safely re-applied automatically (non-append commits)."""


def _atomic_write(path: str, data: bytes) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class IceTable:
    """One table rooted at ``base`` (``data/`` + ``metadata/``)."""

    def __init__(self, base: str):
        self.base = base
        self.meta_dir = os.path.join(base, "metadata")
        self.data_dir = os.path.join(base, "data")

    # ------------------------------------------------------------ layout
    @classmethod
    def create(cls, base: str) -> "IceTable":
        t = cls(base)
        os.makedirs(t.meta_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        return t

    @classmethod
    def exists(cls, base: str) -> bool:
        return os.path.isdir(os.path.join(base, "metadata")) and bool(
            cls(base)._versions()
        )

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.meta_dir):
            return []
        out = []
        for name in os.listdir(self.meta_dir):
            if name.startswith("v") and name.endswith(".metadata.json"):
                out.append(int(name[1 : -len(".metadata.json")]))
        return sorted(out)

    def _meta_path(self, version: int) -> str:
        return os.path.join(self.meta_dir, f"v{version}.metadata.json")

    def current_version(self) -> int | None:
        """Latest committed version: trust the hint when it is current,
        else scan (a stale hint only costs one listdir, never a wrong
        answer)."""
        versions = self._versions()
        return versions[-1] if versions else None

    def _load_meta(self, version: int) -> dict:
        with open(self._meta_path(version), "rb") as f:
            return json.loads(f.read())

    def current_snapshot_id(self) -> int | None:
        v = self.current_version()
        return None if v is None else self._load_meta(v)["snapshot_id"]

    def snapshots(self) -> list[dict]:
        """All committed snapshots, oldest first (id, parent, operation,
        summary, timestamp) — the table's audit log."""
        out = []
        for v in self._versions():
            m = self._load_meta(v)
            out.append(
                {
                    "snapshot_id": m["snapshot_id"],
                    "parent_snapshot_id": m["parent_snapshot_id"],
                    "operation": m["operation"],
                    "summary": m["summary"],
                    "timestamp_ms": m["timestamp_ms"],
                }
            )
        return out

    def _meta_for_snapshot(self, snapshot_id: int | None) -> dict:
        v = self.current_version()
        if v is None:
            raise FileNotFoundError(f"no committed snapshot in {self.base}")
        if snapshot_id is None:
            return self._load_meta(v)
        for ver in reversed(self._versions()):
            m = self._load_meta(ver)
            if m["snapshot_id"] == snapshot_id:
                return m
        raise KeyError(f"snapshot {snapshot_id} not found in {self.base}")

    # -------------------------------------------------------- manifests
    def _write_manifest(self, entries: list[dict]) -> str:
        """One manifest parquet for a batch of data files.  Stats ride as
        a JSON string column: schema-stable regardless of tracked cols."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        rel = f"metadata/manifest-{uuid.uuid4().hex}.parquet"
        table = pa.table(
            {
                "path": pa.array([e["path"] for e in entries], pa.string()),
                "rows": pa.array([e["rows"] for e in entries], pa.int64()),
                "bytes": pa.array([e["bytes"] for e in entries], pa.int64()),
                "stats_json": pa.array(
                    [json.dumps(e["stats"]) for e in entries], pa.string()
                ),
            }
        )
        tmp = os.path.join(self.base, rel + ".tmp")
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(self.base, rel))
        return rel

    def _read_manifests(self, rels: list[str]) -> list[dict]:
        import pyarrow.parquet as pq

        out: list[dict] = []
        for rel in rels:
            t = pq.read_table(os.path.join(self.base, rel))
            for path, rows, nbytes, sj in zip(
                t["path"].to_pylist(),
                t["rows"].to_pylist(),
                t["bytes"].to_pylist(),
                t["stats_json"].to_pylist(),
            ):
                out.append(
                    {"path": path, "rows": rows, "bytes": nbytes, "stats": json.loads(sj)}
                )
        return out

    def files(self, snapshot_id: int | None = None) -> list[dict]:
        """Data-file entries (path, rows, bytes, per-column stats) of a
        snapshot — the planning surface for scans and tests."""
        return self._read_manifests(self._meta_for_snapshot(snapshot_id)["manifests"])

    # ------------------------------------------------------- data files
    def _import_data_files(
        self, df: DataFrame, stats_cols: list[str] | None
    ) -> list[dict]:
        """Write ``df`` to fresh uniquely-named data files and collect
        per-file stats from the parquet footers (metadata-only reads)."""
        import pyarrow.parquet as pq

        staging = os.path.join(self.base, f"_staging-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(staging)
        entries = []
        try:
            for name in sorted(os.listdir(staging)):
                if not name.endswith(".parquet"):
                    continue
                rel = f"data/{uuid.uuid4().hex}.parquet"
                os.replace(os.path.join(staging, name), os.path.join(self.base, rel))
                full = os.path.join(self.base, rel)
                meta = pq.ParquetFile(full).metadata
                stats: dict[str, list] = {}
                if stats_cols:
                    idx = {
                        meta.schema.column(i).name: i for i in range(meta.num_columns)
                    }
                    for col in stats_cols:
                        if col not in idx:
                            continue
                        lo = hi = None
                        nulls = 0
                        for rg in range(meta.num_row_groups):
                            s = meta.row_group(rg).column(idx[col]).statistics
                            if s is None or not s.has_min_max:
                                lo = hi = None
                                break
                            lo = s.min if lo is None else min(lo, s.min)
                            hi = s.max if hi is None else max(hi, s.max)
                            nulls += s.null_count or 0
                        if lo is not None and isinstance(
                            lo, (int, float, str, bool)
                        ):  # binary min/max is not JSON-portable — skip
                            stats[col] = [lo, hi, nulls]
                entries.append(
                    {
                        "path": rel,
                        "rows": meta.num_rows,
                        "bytes": os.path.getsize(full),
                        "stats": stats,
                    }
                )
        finally:
            shutil.rmtree(staging, ignore_errors=True)
        return entries

    # ----------------------------------------------------------- commit
    def _commit(
        self,
        operation: str,
        manifests: list[str],
        schema: list[list[str]],
        summary: dict,
        expected_parent: int | None,
        *,
        append_manifests: list[str] | None = None,
        max_retries: int = 20,
    ) -> int:
        """Optimistic commit.  ``manifests`` is the full manifest set as
        planned against ``expected_parent``.  On a lost race, appends
        (``append_manifests`` given) are re-planned automatically — the
        new manifests are re-based onto the winner's set, matching
        Iceberg's retryable-append semantics; any other operation raises
        ``CommitConflict`` for the caller to re-derive."""
        attempt = 0
        while True:
            current = self.current_version()
            cur_snap = None if current is None else self._load_meta(current)
            parent_id = None if cur_snap is None else cur_snap["snapshot_id"]
            if parent_id != expected_parent:
                if append_manifests is None:
                    raise CommitConflict(
                        f"{operation}: expected parent {expected_parent}, "
                        f"table is now at {parent_id}"
                    )
                manifests = list(cur_snap["manifests"]) + list(append_manifests)
                expected_parent = parent_id
            version = (current or 0) + 1
            meta = {
                "format_version": FORMAT_VERSION,
                "snapshot_id": version,
                "parent_snapshot_id": parent_id,
                "operation": operation,
                "schema": schema,
                "manifests": manifests,
                "summary": summary,
                "timestamp_ms": int(time.time() * 1000),
            }
            tmp = self._meta_path(version) + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "wb") as f:
                f.write(json.dumps(meta, indent=1).encode())
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, self._meta_path(version))  # CAS: fails if taken
            except FileExistsError:
                os.unlink(tmp)
                attempt += 1
                if attempt > max_retries:
                    raise CommitConflict(
                        f"{operation}: lost {max_retries} commit races"
                    ) from None
                continue
            os.unlink(tmp)
            _atomic_write(
                os.path.join(self.meta_dir, _HINT), str(version).encode()
            )
            return version

    @staticmethod
    def _schema_of(df: DataFrame) -> list[list[str]]:
        return [[f.name, f.dataType.simpleString()] for f in df.schema.fields]

    def append(self, df: DataFrame, stats_cols: list[str] | None = None) -> int:
        """Append ``df`` as a new snapshot: one new manifest, parent
        manifests re-referenced — commit cost ∝ batch, not table."""
        entries = self._import_data_files(df, stats_cols)
        new_manifest = self._write_manifest(entries)
        current = self.current_version()
        parent = None if current is None else self._load_meta(current)
        base_manifests = [] if parent is None else list(parent["manifests"])
        return self._commit(
            "append",
            base_manifests + [new_manifest],
            self._schema_of(df),
            {
                "added_files": len(entries),
                "added_rows": sum(e["rows"] for e in entries),
            },
            None if parent is None else parent["snapshot_id"],
            append_manifests=[new_manifest],
        )

    def overwrite(self, df: DataFrame, stats_cols: list[str] | None = None) -> int:
        """Replace the table contents (old files stay referenced by old
        snapshots until ``expire_snapshots``)."""
        entries = self._import_data_files(df, stats_cols)
        new_manifest = self._write_manifest(entries)
        return self._commit(
            "overwrite",
            [new_manifest],
            self._schema_of(df),
            {
                "added_files": len(entries),
                "added_rows": sum(e["rows"] for e in entries),
            },
            self.current_snapshot_id(),
        )

    # ------------------------------------------------------------- scan
    @staticmethod
    def _file_matches(entry: dict, where: list[tuple]) -> bool:
        for col, lo, hi in where:
            s = entry["stats"].get(col)
            if s is None:
                continue  # no stats -> cannot skip
            fmin, fmax = s[0], s[1]
            if (hi is not None and fmin > hi) or (lo is not None and fmax < lo):
                return False
        return True

    def plan_files(
        self, snapshot_id: int | None = None, where: list[tuple] | None = None
    ) -> tuple[list[dict], list[dict]]:
        """(kept, skipped) data-file entries after stats pruning —
        exposed so tests can assert skip counts."""
        entries = self.files(snapshot_id)
        if not where:
            return entries, []
        kept, skipped = [], []
        for e in entries:
            (kept if self._file_matches(e, where) else skipped).append(e)
        return kept, skipped

    def _df_for(
        self,
        spark: SparkSession,
        entries: list[dict],
        snapshot_id: int | None = None,
    ) -> DataFrame:
        if not entries:
            # preserve the requested snapshot's schema on an empty plan
            meta = self._meta_for_snapshot(snapshot_id)
            ddl = ", ".join(f"`{n}` {t}" for n, t in meta["schema"])
            return spark.createDataFrame([], ddl)
        return spark.read.parquet(*[os.path.join(self.base, e["path"]) for e in entries])

    def read(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        where: list[tuple] | None = None,
    ) -> DataFrame:
        """Scan a snapshot (default: current).  ``where`` is a list of
        ``(col, lo, hi)`` range predicates (``None`` = unbounded side):
        files are pruned by footer stats, then the SAME predicate is
        applied as a Spark filter, so the result is exact regardless of
        pruning."""
        kept, _ = self.plan_files(snapshot_id, where)
        df = self._df_for(spark, kept, snapshot_id)
        for col, lo, hi in where or []:
            if lo is not None:
                df = df.filter(df[col] >= lo)
            if hi is not None:
                df = df.filter(df[col] <= hi)
        return df

    def incremental(
        self,
        spark: SparkSession,
        from_snapshot: int,
        to_snapshot: int | None = None,
    ) -> DataFrame:
        """Rows in data files added after ``from_snapshot`` up to
        ``to_snapshot`` (default current) — the day-2 scan: cost ∝ the
        appended batches, the corpus files are never opened."""
        before = {e["path"] for e in self.files(from_snapshot)}
        after = self.files(to_snapshot)
        return self._df_for(
            spark, [e for e in after if e["path"] not in before], to_snapshot
        )

    # ------------------------------------------------------------ merge
    def merge_by_key(
        self,
        spark: SparkSession,
        updates: DataFrame,
        key: str,
        stats_cols: list[str] | None = None,
    ) -> tuple[int, int, int]:
        """Copy-on-write MERGE: rows whose ``key`` appears in ``updates``
        are replaced, new keys are inserted.  Only data files whose
        footer key-range contains at least one update key are rewritten
        (ranges broadcast against the distinct update keys — ids only);
        every other file carries over by reference.  Returns
        ``(version, files_rewritten, files_carried)``."""
        from pyspark.sql import functions as F

        expected_parent = self.current_snapshot_id()
        entries = self.files()
        ranged = [e for e in entries if e["stats"].get(key)]
        unranged = [e for e in entries if not e["stats"].get(key)]
        hit_paths: set[str] = set()
        if ranged:
            # key type is inferred from the stats values (int or str both
            # work; the between-join below is type-agnostic)
            ranges = spark.createDataFrame(
                [(e["path"], e["stats"][key][0], e["stats"][key][1]) for e in ranged],
                ["path", "kmin", "kmax"],
            )
            hit_paths = {
                r.path
                for r in updates.select(F.col(key).alias("k"))
                .distinct()
                .join(
                    F.broadcast(ranges),
                    (F.col("k") >= F.col("kmin")) & (F.col("k") <= F.col("kmax")),
                )
                .select("path")
                .distinct()
                .collect()
            }
        rewrite = [e for e in entries if e["path"] in hit_paths] + unranged
        carry = [e for e in entries if e["path"] not in hit_paths and e["stats"].get(key)]
        touched = self._df_for(spark, rewrite)
        merged = touched.join(updates.select(key), key, "left_anti").unionByName(
            updates
        )
        new_entries = self._import_data_files(merged, stats_cols or [key])
        manifests = (
            ([self._write_manifest(carry)] if carry else [])
            + ([self._write_manifest(new_entries)] if new_entries else [])
        )
        version = self._commit(
            "merge",
            manifests,
            self._schema_of(updates),
            {
                "rewritten_files": len(rewrite),
                "carried_files": len(carry),
                "added_files": len(new_entries),
            },
            expected_parent,
        )
        return version, len(rewrite), len(carry)

    # ------------------------------------------------------ maintenance
    def rollback(self, snapshot_id: int) -> int:
        """Commit a new snapshot whose content is an older snapshot's —
        time travel made current, history preserved."""
        m = self._meta_for_snapshot(snapshot_id)
        return self._commit(
            "rollback",
            list(m["manifests"]),
            m["schema"],
            {"rolled_back_to": snapshot_id},
            self.current_snapshot_id(),
        )

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Drop all but the newest ``keep_last`` snapshots and delete
        data/manifest files no surviving snapshot references.  Returns
        ``{"snapshots_removed": n, "files_removed": n}``."""
        versions = self._versions()
        drop, keep = versions[:-keep_last], versions[-keep_last:]
        if not drop:
            return {"snapshots_removed": 0, "files_removed": 0}
        live_manifests: set[str] = set()
        for v in keep:
            live_manifests.update(self._load_meta(v)["manifests"])
        live_data = {e["path"] for e in self._read_manifests(sorted(live_manifests))}
        removed = 0
        for v in drop:
            m = self._load_meta(v)
            for rel in m["manifests"]:
                if rel not in live_manifests and os.path.exists(
                    os.path.join(self.base, rel)
                ):
                    for e in self._read_manifests([rel]):
                        if e["path"] not in live_data and os.path.exists(
                            os.path.join(self.base, e["path"])
                        ):
                            os.unlink(os.path.join(self.base, e["path"]))
                            removed += 1
                    os.unlink(os.path.join(self.base, rel))
            os.unlink(self._meta_path(v))
        return {"snapshots_removed": len(drop), "files_removed": removed}
