"""Shared column list for streaming rollup output."""

STREAM_ROLLUP_COLUMNS = [
    "n_epochs", "mean", "minimum", "maximum", "amplitude", "std", "total_time",
]
