"""PII redaction — the scrubbing pass every production training-data
pipeline runs before materializing a corpus (emails, phone numbers,
IP addresses, SSN-shaped ids replaced with typed placeholder tokens;
cf. the C4 / The Pile / BigScience ROOTS cleaning stages, which all
ship regex-based PII scrubbers of exactly this shape).

Everything is JVM-side `regexp_replace` / `regexp_count` — map-only,
no UDFs, no shuffle; the expressions inline into the corpus scan. The
patterns deliberately use only the regex subset with identical
semantics in Java (Spark), RE2 (DuckDB), and Python (character
classes, bounded quantifiers, word boundaries — no lookaround, no
backreferences), so a SQL oracle replays the redaction byte-exactly.

Redaction is SEQUENTIAL in a fixed type order, and each type's match
count is taken on the text as-of its turn (after the earlier types
were replaced). That makes the counts well-defined under overlaps —
a string consumed by an earlier type can't be double-counted by a
later one — and exactly SQL-replayable as nested regexp_replace.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .fanout import fan_out

__all__ = ["PII_PATTERNS", "redact_pii"]

# ordered: most-specific first (SSN's 3-2-4 shape never collides with
# the 3-3-4 phone shape, but emails must go before IPs so a numeric
# mail domain is consumed as part of the email, not re-flagged)
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b\d{3}[- ]\d{3}[- ]\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def redact_pii(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """(id, redacted_text, n_<type>..., n_pii): every pattern occurrence
    replaced by its ``<TYPE>`` placeholder, with per-type counts (see
    module doc for the sequential-order semantics)."""
    patterns = list(PII_PATTERNS if patterns is None else patterns)
    cur = F.col(text_col)
    counts = []
    for name, pat in patterns:
        counts.append(
            F.coalesce(F.regexp_count(cur, F.lit(pat)), F.lit(0))
            .cast("long").alias(f"n_{name}")  # NULL text -> 0 found
        )
        cur = F.regexp_replace(cur, pat, f"<{name.upper()}>")
    # map-only regex chain over full text: fan out single-split scans
    out = fan_out(df).select(
        F.col(id_col), cur.alias("redacted_text"), *counts
    )
    total = None
    for name, _ in patterns:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total.cast("long"))
