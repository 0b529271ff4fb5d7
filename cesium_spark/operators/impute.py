"""Featureset imputation: replace missing values (NaN / NULL / huge-
magnitude, i.e. anything a model trainer would choke on) per the
reference's strategies.

Reference parity: /root/reference/cesium/featurize.py:364-414
(`impute_featureset`) — the classic featurize -> impute -> model step.
Reference semantics reproduced exactly:

  - missing = NaN or |x| > max_value (infinities included);  the engine
    additionally treats SQL NULL as missing (the kernel's NaN-on-error /
    undefined-feature policy surfaces as NULL in Spark, where the
    reference surfaces NaN in pandas);
  - 'constant' with value=None fills with -2 * max(|x|) over ALL
    non-missing feature values in the whole featureset (the reference's
    global, not per-column, default — a good sentinel for tree models);
  - 'mean' / 'median' / 'most_frequent' fill per-COLUMN with the
    statistic over that column's non-missing values (sklearn
    SimpleImputer semantics; most_frequent breaks frequency ties toward
    the smallest value, like scipy.stats.mode).

Plan shape: ONE aggregation pass computes every per-column statistic
(and the global max for the constant default) in a single job — the
collected result is one row regardless of featureset size — then one
narrow projection applies the fills. No Python UDFs, no per-column jobs.
A column whose values are ALL missing has no statistic and stays NULL
under mean/median/most_frequent (the reference/sklearn drops such
columns; dropping data silently is worse than leaving the NULL visible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

__all__ = ["impute_featureset"]

_STRATEGIES = ("constant", "mean", "median", "most_frequent")


def impute_featureset(
    fset: DataFrame,
    strategy: str = "constant",
    value: float | None = None,
    max_value: float = 1e20,
    exclude_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Return `fset` with missing feature values imputed.

    Feature columns are the numeric columns not listed in
    ``exclude_cols``; everything else (series keys, labels, string meta)
    passes through untouched.
    """
    if strategy not in _STRATEGIES:
        raise NotImplementedError(
            f"Imputation strategy '{strategy}' not recognized."
        )
    feat_cols = [
        f.name
        for f in fset.schema.fields
        if isinstance(f.dataType, NumericType) and f.name not in exclude_cols
    ]
    if not feat_cols:
        return fset

    def clean(c: str):
        x = F.col(c).cast("double")
        return F.when(
            F.isnull(x) | F.isnan(x) | (F.abs(x) > F.lit(float(max_value))),
            F.lit(None),
        ).otherwise(x)

    cleaned = fset.select(
        *[c for c in fset.columns if c not in feat_cols],
        *[clean(c).alias(c) for c in feat_cols],
    )

    if strategy == "constant" and value is not None:
        fills = {c: float(value) for c in feat_cols}
    else:
        if strategy == "constant":
            aggs = [F.max(F.abs(F.col(c))).alias(c) for c in feat_cols]
        elif strategy == "mean":
            aggs = [F.avg(F.col(c)).alias(c) for c in feat_cols]
        elif strategy == "median":
            aggs = [F.median(F.col(c)).alias(c) for c in feat_cols]
        else:  # most_frequent: deterministic mode = smallest among ties
            aggs = [F.mode(F.col(c), True).alias(c) for c in feat_cols]
        row = cleaned.agg(*aggs).first().asDict()  # ONE row, by construction
        if strategy == "constant":
            gmax = max(
                (v for v in row.values() if v is not None), default=None
            )
            fill = -2.0 * gmax if gmax is not None else None
            fills = {c: fill for c in feat_cols}
        else:
            fills = {c: row[c] for c in feat_cols}

    return cleaned.select(
        *[c for c in fset.columns if c not in feat_cols],
        *[
            (
                F.coalesce(F.col(c), F.lit(fills[c])).alias(c)
                if fills[c] is not None
                else F.col(c).alias(c)
            )
            for c in feat_cols
        ],
    )
