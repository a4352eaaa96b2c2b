"""Correlation matrix operator.

Spark-native re-expression of the reference's corr module
(reference: pd_utils/corr.py).
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pd_utils_spark.utils import numeric_cols, to_list


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
