"""Correlation matrix operator.

Spark-native re-expression of the reference's corr module
(reference: pd_utils/corr.py).
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pd_utils_spark.utils import numeric_cols, to_list


def autocorr_by_groups(
    df: DataFrame,
    byvars: Union[str, list[str]],
    col: str,
    ordervar: str,
    lags: Union[int, list[int]] = 1,
) -> DataFrame:
    """Per-group autocorrelation at each requested lag — pandas
    ``Series.autocorr(lag)`` parity: the Pearson correlation of the
    series with itself shifted by ``lag`` rows (ordered by
    ``ordervar``), over the overlapping non-null pairs. Output is long
    form: one row per (group, lag) with ``autocorr`` (null when a
    group has fewer than ``lag + 2`` rows or zero variance, exactly as
    pandas yields NaN).

    The serial-dependence diagnostic for time series: returns momentum
    / mean-reversion screens, seasonality at lag = period, residual
    whiteness after a fit.

    Plan: ONE window shuffle (partitionBy group, orderBy ordervar)
    computes every lag column, then ONE aggregation computes all the
    ``F.corr`` pairs — two shuffles total regardless of len(lags).
    """
    from pyspark.sql import Window

    byvars_l = to_list(byvars)
    lags_l = [lags] if isinstance(lags, int) else list(lags)
    if any(lag < 1 for lag in lags_l):
        raise ValueError(f"lags must be >= 1, got {lags_l}")
    w = Window.partitionBy(*byvars_l).orderBy(ordervar)
    v = F.col(col).cast("double")
    lagged = df.select(
        *byvars_l,
        v.alias("__v__"),
        *[F.lag(v, lag).over(w).alias(f"__l{lag}__") for lag in lags_l],
    )
    agg = lagged.groupBy(*byvars_l).agg(
        *[F.corr("__v__", f"__l{lag}__").alias(f"__c{lag}__") for lag in lags_l]
    )
    per_lag = F.array(
        *[
            F.struct(F.lit(lag).alias("lag"), F.col(f"__c{lag}__").alias("autocorr"))
            for lag in lags_l
        ]
    )
    return (
        agg.select(*byvars_l, F.explode(per_lag).alias("__r__"))
        .select(*byvars_l, "__r__.lag", "__r__.autocorr")
    )


def formatted_corr_df(df: DataFrame, cols: Optional[Union[str, list[str]]] = None) -> DataFrame:
    """Pearson correlation matrix over ``cols`` (default: all numeric),
    lower-triangular, formatted to two decimals
    (reference: pd_utils/corr.py:7-23).

    All k*(k+1)/2 pairwise correlations are computed in ONE distributed
    aggregate pass (``F.corr`` expressions in a single ``agg``); the
    k x k reshape is driver-side presentation on a one-row result.
    Output: a ``variable`` column plus one string column per variable,
    upper triangle blank — mirroring the reference's display frame.
    """
    cols_l = to_list(cols) if cols else numeric_cols(df)

    aggs = []
    for i, a in enumerate(cols_l):
        for j, b in enumerate(cols_l):
            if j <= i:
                aggs.append(F.corr(a, b).alias(f"__c_{i}_{j}"))
    row = df.agg(*aggs).collect()[0]

    spark = df.sparkSession
    data = []
    for i, a in enumerate(cols_l):
        rec = {"variable": a}
        for j, b in enumerate(cols_l):
            rec[b] = f"{row[f'__c_{i}_{j}']:.2f}" if j <= i else ""
        data.append(rec)
    out = spark.createDataFrame(data)
    return out.select("variable", *cols_l)
