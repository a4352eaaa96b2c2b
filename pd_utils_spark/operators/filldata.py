"""Dimension completion and group imputation operators.

Spark-native re-expression of the reference's filldata module
(reference: pd_utils/filldata.py). Cross joins of per-column distinct
frames are broadcast (they are tiny relative to the fact table); fills
are window expressions — no sentinel round trips, no per-group Python.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pd_utils_spark.utils import numeric_cols, to_list


def fill_excluded_rows(
    df: DataFrame,
    byvars: list,
    fillvars: Optional[Union[str, list[str]]] = None,
    **fillna_kwargs,
) -> DataFrame:
    """Complete the dataset to the cartesian product of the distinct
    non-null values of each byvar, left-joining the data on and
    optionally filling ``fillvars`` (reference:
    pd_utils/filldata.py:163-207).

    ``byvars`` entries may be column names or external one-column
    DataFrames (the reference accepts pd.Series —
    pd_utils/filldata.py:196-198). ``value=<x>`` is the supported fillna
    kwarg.

    Plan: per-byvar distinct (cheap partial-agg shuffles) ->
    broadcast cross join chain -> one equi left join on byvars. The
    dimension frame is small by construction; the fact join is the only
    big shuffle.
    """
    fillvars_l = to_list(fillvars)

    dims = []
    names = []
    for bv in byvars if isinstance(byvars, list) else [byvars]:
        if isinstance(bv, str):
            dims.append(df.select(bv).filter(F.col(bv).isNotNull()).distinct())
            names.append(bv)
        else:  # external one-column DataFrame
            name = bv.columns[0]
            dims.append(bv.select(name).filter(F.col(name).isNotNull()).distinct())
            names.append(name)

    all_df = dims[0]
    for d in dims[1:]:
        all_df = all_df.crossJoin(F.broadcast(d))

    merged = all_df.join(df, on=names, how="left")

    if fillna_kwargs and fillvars_l:
        value = fillna_kwargs.get("value")
        if value is not None:
            if isinstance(value, dict):
                merged = merged.na.fill(value)
            else:
                # pandas fillna keeps float dtype; cast filled numeric cols
                for c in fillvars_l:
                    merged = merged.withColumn(
                        c, F.coalesce(F.col(c).cast("double"), F.lit(float(value)))
                    )
    # restore original column order
    return merged.select(*[c for c in df.columns])


def add_missing_group_rows(
    df: DataFrame,
    group_id_cols: list[str],
    non_group_id_cols: list[str],
    fill_method: Optional[str] = "ffill",
    fill_limit: Optional[int] = None,
) -> DataFrame:
    """Complete each group to all combinations of the id columns'
    distinct values, then forward/back fill within groups ordered by the
    id columns (reference: pd_utils/filldata.py:65-101).

    The product is over each id column's distinct values independently
    (MultiIndex.from_product semantics, pd_utils/filldata.py:83-87), not
    over observed tuples. Like the reference (its TODO at
    filldata.py:91-93), the fill also fills nulls pre-existing in the
    data. ``fill_limit`` bounds how many consecutive rows a value
    propagates, exactly like pandas' ``fillna(limit=...)``.

    Plan: broadcast cross-join dimension completion + one left join;
    fills are window expressions over partitionBy(group_id_cols)
    orderBy(non_group_id_cols) — a single shuffle.
    """
    fill_id_cols = group_id_cols + non_group_id_cols
    dims = [df.select(c).distinct() for c in fill_id_cols]
    all_df = dims[0]
    for d in dims[1:]:
        all_df = all_df.crossJoin(F.broadcast(d))
    merged = all_df.join(df, on=fill_id_cols, how="left")

    if fill_method is None:
        return merged.select(*df.columns)

    value_cols = [c for c in df.columns if c not in fill_id_cols]
    order = [F.col(c) for c in non_group_id_cols]
    if fill_method == "bfill":
        order = [c.desc() for c in order]
    w = Window.partitionBy(*group_id_cols).orderBy(*order)
    w_fill = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    out = merged.withColumn("__rn__", F.row_number().over(w))
    for c in value_cols:
        filled = F.last(c, ignorenulls=True).over(w_fill)
        if fill_limit is not None:
            last_valid = F.max(F.when(F.col(c).isNotNull(), F.col("__rn__"))).over(w_fill)
            gap = F.col("__rn__") - last_valid
            filled = F.when(gap <= fill_limit, filled)
        out = out.withColumn(c, F.coalesce(F.col(c), filled))
    return out.drop("__rn__").select(*df.columns)


def drop_missing_group_rows(df: DataFrame, fill_id_cols: list[str]) -> DataFrame:
    """Drop rows where all non-id columns are null
    (reference: pd_utils/filldata.py:104-106)."""
    drop_subset = [c for c in df.columns if c not in fill_id_cols]
    return df.na.drop(how="all", subset=drop_subset)


def _fill_by_group(
    df: DataFrame,
    byvars_l: list[str],
    cols_to_fill: list[str],
    str_vars: str,
    num_vars: str,
    ordervar_c: str,
) -> DataFrame:
    num_set = set(numeric_cols(df))
    w = Window.partitionBy(*byvars_l)
    w_ord = (
        Window.partitionBy(*byvars_l)
        .orderBy(ordervar_c)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )

    def first_last(c: str, which: str) -> Column:
        if which == "first":
            return F.first(c, ignorenulls=True).over(w_ord)
        if which == "last":
            return F.last(c, ignorenulls=True).over(w_ord)
        raise ValueError("Did not pass 'first' or 'last'")

    out = df
    for c in cols_to_fill:
        if c in num_set:
            if num_vars in ("first", "last"):
                fill_val = first_last(c, num_vars).cast("double")
            else:
                agg = {"mean": F.avg, "median": F.median, "min": F.min, "max": F.max, "sum": F.sum}[
                    num_vars
                ]
                fill_val = agg(c).over(w).cast("double")
            # pandas fills int columns with float means -> double
            out = out.withColumn(c, F.coalesce(F.col(c).cast("double"), fill_val))
        else:
            out = out.withColumn(c, F.coalesce(F.col(c), first_last(c, str_vars)))
    return out


def interpolate_by_groups(
    df: DataFrame,
    byvars: Union[str, list[str]],
    cols: Union[str, list[str]],
    ordervar: str,
    method: str = "linear",
) -> DataFrame:
    """Per-group linear interpolation of missing values, pandas
    ``DataFrame.interpolate`` parity: interior nulls take the straight
    line between the nearest non-null neighbors, nulls AFTER the last
    valid value forward-fill it (numpy.interp clipping, which pandas
    inherits), nulls BEFORE the first valid value stay null.

    ``method='linear'`` interpolates over row positions within the
    group ordered by ``ordervar`` (pandas' default: values are assumed
    equally spaced); ``method='index'`` interpolates over the numeric
    VALUES of ``ordervar`` (pandas ``method='index'/'values'``) — the
    right choice for irregular time series. ``ordervar`` must be
    unique within each group (with ties the neighbor choice, like
    pandas' sort, is not well-defined).

    Plan: one window partitioned by group — four framed expressions
    per column (nearest non-null value and position on each side), no
    Python in the row path, single shuffle shared by all columns.
    """
    if method not in ("linear", "index", "values"):
        raise ValueError(f"method must be linear/index/values, got {method!r}")
    byvars_l = to_list(byvars)
    cols_l = to_list(cols)
    w = Window.partitionBy(*byvars_l).orderBy(ordervar)
    if method == "linear":
        x = F.row_number().over(w).cast("double")
    else:
        x = F.col(ordervar).cast("double")
    out = df.withColumn("__x__", x)
    back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    for c in cols_l:
        v = F.col(c).cast("double")
        pv = F.last(v, ignorenulls=True).over(back)
        px = F.last(F.when(v.isNotNull(), F.col("__x__")), ignorenulls=True).over(back)
        nv = F.first(v, ignorenulls=True).over(fwd)
        nx = F.first(F.when(v.isNotNull(), F.col("__x__")), ignorenulls=True).over(fwd)
        interp = pv + (nv - pv) * (F.col("__x__") - px) / (nx - px)
        out = out.withColumn(
            c,
            F.when(v.isNotNull(), v)
            .when(pv.isNotNull() & nv.isNotNull(), interp)
            .when(pv.isNotNull(), pv),  # trailing nulls forward-fill
        )
    return out.drop("__x__")


def fillna_by_groups(
    df: DataFrame,
    byvars: Union[str, list[str]],
    exclude_cols: Optional[Union[str, list[str]]] = None,
    str_vars: str = "first",
    num_vars: str = "mean",
    ordervar: Optional[str] = None,
) -> DataFrame:
    """Per-group imputation: numeric columns filled with the group
    aggregate named by ``num_vars`` ('mean', any aggregate, or
    'first'/'last' non-null); string columns with the 'first'/'last'
    non-null value of the group (reference: pd_utils/filldata.py:31-62,
    kernel :109-145). All-null groups stay null (the reference's
    -999.999 sentinel round-trip is unnecessary — null aggregates
    coalesce to null).

    Output columns: byvars first, then the filled columns in input
    order, matching the reference's observable reordering. Columns in
    ``exclude_cols`` are dropped from the output (the reference selects
    only byvars + fill columns, pd_utils/filldata.py:53).

    'first'/'last' are row-order concepts; Spark relations are
    unordered, so the order is ``ordervar`` when given, else the
    file/ingest order captured via ``monotonically_increasing_id`` (pin
    an explicit ordervar for reproducibility at scale).
    """
    byvars_l = to_list(byvars)
    exclude_l = to_list(exclude_cols)
    cols_to_fill = [c for c in df.columns if c not in byvars_l and c not in exclude_l]

    if ordervar is None:
        df = df.withColumn("__ord__", F.monotonically_increasing_id())
        ordervar_c = "__ord__"
        cols_to_fill = [c for c in cols_to_fill if c != "__ord__"]
    else:
        ordervar_c = ordervar

    out = _fill_by_group(df, byvars_l, cols_to_fill, str_vars, num_vars, ordervar_c)
    return out.select(*byvars_l, *cols_to_fill)


def fillna_by_groups_and_keep_one_per_group(
    df: DataFrame,
    byvars: Union[str, list[str]],
    exclude_cols: Optional[Union[str, list[str]]] = None,
    str_vars: str = "first",
    num_vars: str = "mean",
    ordervar: Optional[str] = None,
) -> DataFrame:
    """fillna_by_groups then keep the first row per group (reference:
    pd_utils/filldata.py:10-28). 'first' follows ``ordervar`` (or ingest
    order when omitted)."""
    byvars_l = to_list(byvars)
    exclude_l = to_list(exclude_cols)
    cols_to_fill = [c for c in df.columns if c not in byvars_l and c not in exclude_l]

    if ordervar is None:
        df = df.withColumn("__ord__", F.monotonically_increasing_id())
        ordervar = "__ord__"
        cols_to_fill = [c for c in cols_to_fill if c != "__ord__"]

    filled = _fill_by_group(df, byvars_l, cols_to_fill, str_vars, num_vars, ordervar)
    w = Window.partitionBy(*byvars_l).orderBy(ordervar)
    out = filled.withColumn("__rn__", F.row_number().over(w)).filter(F.col("__rn__") == 1)
    return out.select(*byvars_l, *cols_to_fill)
