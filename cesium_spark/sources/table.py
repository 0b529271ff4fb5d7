"""Snapshot table shim: Iceberg-like semantics on plain Parquet.

No Iceberg runtime jar ships in this sandbox (network off), so the engine
ships a thin table format providing the operations the rollup pipeline
needs — append, dynamic overwrite-by-partition, snapshot isolation, and
time travel — while keeping the calling code shaped so a real Iceberg
catalog can drop in (`CREATE TABLE ... USING iceberg` + MERGE INTO).

Layout:
  <root>/data/<snapshot_id>/<partition dirs or files>.parquet
  <root>/_snapshots.json      — ordered snapshot log; each snapshot lists
                                its live file-set (full manifest, not a
                                delta), so reads are one JSON lookup.

Writers are atomic: data lands under a new snapshot dir first, then the
manifest is atomically replaced (tmp+rename). A crash before the manifest
swap leaves the table at the previous snapshot (orphan data dirs are
harmless and collectable).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # ------------------------------------------------------------ manifest

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_snapshots.json")

    def _load_log(self) -> list[dict]:
        try:
            with open(self._manifest_path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return []

    def _append_snapshot(self, paths: list[str], operation: str, parent: list[dict]):
        log = parent
        snap = {
            "snapshot_id": uuid.uuid4().hex[:16],
            # monotonic even after expire_snapshots truncates the log
            "sequence": (log[-1]["sequence"] + 1) if log else 0,
            "timestamp": time.time(),
            "operation": operation,
            "paths": sorted(paths),
        }
        log = log + [snap]
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(log, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path)
        return snap["snapshot_id"]

    def snapshots(self) -> list[dict]:
        return self._load_log()

    def current_snapshot_id(self) -> str | None:
        log = self._load_log()
        return log[-1]["snapshot_id"] if log else None

    # ------------------------------------------------------------- write

    def _write_data(self, df: DataFrame, partition_by: list[str] | None) -> tuple[str, list[str]]:
        sid_dir = uuid.uuid4().hex[:16]
        dest = os.path.join(self.root, "data", sid_dir)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(dest)
        if partition_by:
            # one logical path per leaf partition directory
            paths = []
            for dirpath, _dirs, files in os.walk(dest):
                if any(f.endswith(".parquet") for f in files):
                    paths.append(dirpath)
            return dest, paths
        return dest, [dest]

    def append(self, df: DataFrame, partition_by: list[str] | None = None) -> str:
        log = self._load_log()
        prev = log[-1]["paths"] if log else []
        _dest, new_paths = self._write_data(df, partition_by)
        return self._append_snapshot(prev + new_paths, "append", log)

    def overwrite(self, df: DataFrame, partition_by: list[str] | None = None) -> str:
        log = self._load_log()
        _dest, new_paths = self._write_data(df, partition_by)
        return self._append_snapshot(new_paths, "overwrite", log)

    def overwrite_partitions(
        self,
        df: DataFrame,
        partition_by: list[str],
        also_replace: set[str] | None = None,
    ) -> str:
        """Dynamic partition overwrite: replaces only the partitions
        present in `df`, keeps all others — Iceberg's
        `overwritePartitions()` semantics.

        `also_replace` names extra partition-dir suffixes (e.g.
        ``{"bucket=13"}``) to drop even when `df` writes no rows for
        them — the delete-partition case a pure dynamic overwrite cannot
        express (an updated partition whose new content is EMPTY would
        otherwise silently keep its stale rows)."""
        log = self._load_log()
        prev = log[-1]["paths"] if log else []
        dest, new_paths = self._write_data(df, partition_by)
        # partition identity = the relative partition-dir suffix
        def suffix(p, base):
            return os.path.relpath(p, base)

        replaced = {suffix(p, dest) for p in new_paths} | set(also_replace or ())
        kept = []
        for p in prev:
            # previous paths belong to other snapshot dirs: compare their
            # partition suffix (path after the snapshot dir)
            parts = p.split(os.sep)
            if "data" in parts:
                i = parts.index("data")
                suf = os.sep.join(parts[i + 2:]) or "."
            else:
                suf = "."
            if suf not in replaced:
                kept.append(p)
        return self._append_snapshot(kept + new_paths, "overwrite_partitions", log)

    # ------------------------------------------------------- maintenance

    def rollback(self, snapshot_id: str) -> str:
        """Roll the table back to an earlier snapshot — Iceberg's
        `rollback_to_snapshot`: appends a NEW snapshot whose live
        file-set is the old one's, so the rollback itself is in the
        history (and can be rolled back)."""
        log = self._load_log()
        matches = [s for s in log if s["snapshot_id"] == snapshot_id]
        if not matches:
            raise KeyError(f"unknown snapshot {snapshot_id}")
        return self._append_snapshot(matches[0]["paths"], "rollback", log)

    def expire_snapshots(self, keep_last: int = 1) -> list[str]:
        """Iceberg's `expire_snapshots`: drop all but the last
        ``keep_last`` log entries and delete data files no kept
        snapshot references. Returns the deleted paths. Ordering is
        crash-safe: the truncated manifest lands atomically FIRST, so
        an interruption leaves only harmless orphan files (never a
        manifest pointing at deleted data)."""
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        log = self._load_log()
        if len(log) <= keep_last:
            return []
        kept = log[-keep_last:]
        referenced: set[str] = set()
        for s in kept:
            referenced.update(s["paths"])
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(kept, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path)

        deleted = []
        for s in log[: len(log) - keep_last]:
            for p in s["paths"]:
                if p in referenced or not os.path.exists(p):
                    continue
                # a kept path may live UNDER an expired dir path (or
                # vice versa) only when identical — paths are leaf
                # partition dirs or whole snapshot dirs, never nested
                shutil.rmtree(p, ignore_errors=True)
                referenced.add(p)  # don't retry shared paths
                # rmtree swallows errors: report only what's GONE —
                # a survivor is an unreferenced orphan (harmless), not
                # reclaimed storage
                if not os.path.exists(p):
                    deleted.append(p)
        return sorted(set(deleted))

    def merge_rows(
        self,
        spark: SparkSession,
        df: DataFrame,
        keys: list[str],
        partition_by: list[str] | None = None,
    ) -> str:
        """Upsert — Iceberg's ``MERGE INTO ... WHEN MATCHED THEN UPDATE
        WHEN NOT MATCHED THEN INSERT`` for whole rows, as copy-on-write.
        With ``partition_by`` the rewrite is PARTITION-SCOPED: only the
        partitions the source rows land in are read back, anti-joined
        on ``keys`` and rewritten; every untouched partition's files
        are carried into the new snapshot as-is (the scalable CoW shape
        — rewrite cost tracks the touched data, not the table).

        Requires ``partition_by`` to be a prefix-stable property of the
        key (a row's partition never changes), as in Iceberg: otherwise
        the old version of a moved row would survive in its previous
        partition."""
        from pyspark.sql import functions as F

        log = self._load_log()
        if not log:
            return self.append(df, partition_by)
        current = self.read(spark)
        if partition_by:
            touched = df.select(*partition_by).distinct()
            scoped = current.join(F.broadcast(touched), partition_by, "left_semi")
            survivors = scoped.join(
                df.select(*keys).distinct(), keys, "left_anti"
            )
            return self.overwrite_partitions(
                survivors.unionByName(df), partition_by
            )
        survivors = current.join(df.select(*keys).distinct(), keys, "left_anti")
        return self.overwrite(survivors.unionByName(df), partition_by)

    # -------------------------------------------------------------- read

    def read(self, spark: SparkSession, as_of: str | None = None) -> DataFrame:
        """Current table state, or time travel to snapshot id `as_of`."""
        log = self._load_log()
        if not log:
            raise FileNotFoundError(f"empty table at {self.root}")
        snap = log[-1]
        if as_of is not None:
            matches = [s for s in log if s["snapshot_id"] == as_of]
            if not matches:
                raise KeyError(f"unknown snapshot {as_of}")
            snap = matches[0]
        if not snap["paths"]:
            raise FileNotFoundError("snapshot has no data files")
        # group paths by their snapshot dir so partition-column discovery
        # gets a consistent basePath per group, then union
        data_root = os.path.join(self.root, "data")
        groups: dict[str, list[str]] = {}
        for p in snap["paths"]:
            rel = os.path.relpath(p, data_root)
            sid = rel.split(os.sep)[0]
            groups.setdefault(os.path.join(data_root, sid), []).append(p)
        dfs = [
            spark.read.option("basePath", base).parquet(*paths)
            for base, paths in sorted(groups.items())
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out
