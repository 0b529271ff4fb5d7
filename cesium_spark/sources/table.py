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
            "sequence": len(log),
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
