"""Lineage + metrics checkpointing for exact resume.

The rollup job records, per unit of work (a tier, or a (tier, input
snapshot) pair for incremental runs), a commit entry carrying the input
fingerprint and output metrics. On resume, committed units whose input
fingerprint still matches are skipped; anything else is recomputed and
idempotently overwritten (rollup writes are deterministic, so re-running a
unit produces byte-identical output).

The log is a JSONL file per unit under <dir>/, written atomically
(tmp + rename) so a crash mid-commit never yields a half-committed state.
This is the Parquet-era stand-in for an Iceberg snapshot/metadata table;
the interface is deliberately tiny so an Iceberg-backed implementation can
drop in when a runtime jar is available (SURVEY.md §7 M0 note).
"""

from __future__ import annotations

import json
import os
import time


class LineageLog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, unit: str) -> str:
        safe = unit.replace("/", "_")
        return os.path.join(self.root, f"{safe}.json")

    def commit(self, unit: str, input_rows: int, metrics: dict | None = None,
               input_fingerprint: str | None = None) -> None:
        entry = {
            "unit": unit,
            "input_rows": input_rows,
            "input_fingerprint": input_fingerprint,
            "metrics": metrics or {},
            "committed_at": time.time(),
        }
        tmp = self._path(unit) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entry, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._path(unit))

    def is_committed(self, unit: str, input_rows: int | None = None,
                     input_fingerprint: str | None = None) -> bool:
        """Committed AND the input hasn't changed since (rows and, when
        given, fingerprint must match)."""
        try:
            with open(self._path(unit)) as f:
                entry = json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return False
        if input_rows is not None and entry.get("input_rows") != input_rows:
            return False
        if (
            input_fingerprint is not None
            and entry.get("input_fingerprint") != input_fingerprint
        ):
            return False
        return True

    def read(self, unit: str) -> dict | None:
        try:
            with open(self._path(unit)) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def units(self) -> list[str]:
        return sorted(
            f[:-5] for f in os.listdir(self.root) if f.endswith(".json")
        )
