"""Quantile portfolio formation operators.

Spark-native re-expression of the reference's port module
(reference: pd_utils/port.py). The reference's split-to-numpy-arrays +
multiprocessing machinery (pd_utils/port.py:280-406) is replaced by a
groupBy aggregate for the cutoffs plus a codegen'd CASE chain for the
bucket assignment — no Python in the row path.
"""

from __future__ import annotations

import warnings
from typing import Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pd_utils_spark.operators.transform import averages
from pd_utils_spark.utils import quote, to_list


def portfolio(
    df: DataFrame,
    groupvar: str,
    ngroups: int = 10,
    cutoffs: Optional[list] = None,
    quant_cutoffs: Optional[list] = None,
    byvars: Optional[Union[str, list[str]]] = None,
    cutdf: Optional[DataFrame] = None,
    portvar: str = "portfolio",
    multiprocess: bool = False,
) -> DataFrame:
    """Assign each row a portfolio number 1..n from percentile (or
    explicit) cutoffs of ``groupvar``, computed within ``byvars`` groups
    (reference: pd_utils/port.py:16-154).

    Three cutoff modes, mirroring the reference exactly:

    - ``ngroups``: equal percentile buckets. Boundary rule is
      first-match with inclusive bounds within byvars groups
      (pd_utils/port.py:312-315); without byvars the reference routes
      through ``_sort_into_ports``, where later buckets overwrite on
      boundary ties (last match, pd_utils/port.py:263-268) — both
      replicated.
    - ``quant_cutoffs``: explicit percentiles, same matching rules.
    - ``cutoffs``: explicit values; min/max of the data are prepended/
      appended and matching is last-match; ``byvars`` are ignored on
      this path like the reference (pd_utils/port.py:77-83).

    Null / infinite ``groupvar`` values get portfolio 0 in the
    percentile-within-byvars path (pd_utils/port.py:313); cutoff
    percentiles are computed excluding null/inf (pd_utils/port.py:300).
    ``cutdf`` optionally supplies the cutoff distribution and must have
    matching bygroups.

    Plan: cutoffs = one ``groupBy(byvars)`` exact-percentile aggregate on
    the cut frame, joined back on byvars (broadcast when small); bucket
    assignment is a pure CASE expression — whole-stage codegen, no UDF,
    no driver round trips (scalar min/max become one-row aggregates
    cross-joined back). ``multiprocess`` is accepted for API parity and
    ignored — Spark's partitioned execution replaces the reference Pool.
    """
    byvars_l = to_list(byvars) or None
    if cutoffs is not None and quant_cutoffs is not None:
        raise ValueError("cannot pass both cutoffs and quant_cutoffs")
    if (cutoffs is not None or quant_cutoffs is not None) and ngroups not in (10, None, 0):
        raise ValueError("cannot pass both cutoffs and ngroups")
    if cutdf is None:
        cutdf = df

    gv = F.col(groupvar).cast("double")

    if cutoffs is not None:
        # explicit value cutoffs: [min, *cutoffs, max]; last match wins;
        # byvars ignored (reference behavior). NaN must not feed the
        # min/max: Spark sorts NaN above every value (one NaN row would
        # null out the whole top bucket) while pandas min/max skip NaN;
        # +-inf stays in, matching pandas.
        bounds = df.filter(F.col(groupvar).isNotNull() & ~F.isnan(gv)).agg(
            F.min(gv).alias("__min__"), F.max(gv).alias("__max__")
        )
        out = df.crossJoin(F.broadcast(bounds))
        edges: list[Column] = (
            [F.col("__min__")] + [F.lit(float(c)) for c in cutoffs] + [F.col("__max__")]
        )
        port = F.lit(0)
        for i in range(len(edges) - 1):
            lo_e, hi_e = edges[i], edges[i + 1]
            port = F.when((gv >= lo_e) & (gv <= hi_e), F.lit(i + 1)).otherwise(port)
        return out.withColumn(portvar, port.cast("long")).drop("__min__", "__max__")

    if quant_cutoffs is not None:
        percentiles = [0.0, *[float(q) for q in quant_cutoffs], 1.0]
    else:
        percentiles = [i / ngroups for i in range(ngroups)] + [1.0]

    n_ports = len(percentiles) - 1
    pct_arr = "array(" + ", ".join(str(p) for p in percentiles) + ")"

    valid = (
        F.col(groupvar).isNotNull()
        & ~F.isnan(gv)
        & (F.abs(gv) != float("inf"))
    )

    if byvars_l:
        # per-group exact percentiles on the cut frame, excluding nan/inf
        cuts = (
            cutdf.filter(
                F.col(groupvar).isNotNull()
                & ~F.isnan(F.col(groupvar).cast("double"))
                & (F.abs(F.col(groupvar).cast("double")) != float("inf"))
            )
            .groupBy(*byvars_l)
            .agg(
                F.expr(f"percentile(cast({quote(groupvar)} as double), {pct_arr})").alias("__cuts__")
            )
        )
        out = df.join(cuts, on=byvars_l, how="left")
        # first match wins, inclusive both ends (reference _portfolio_match)
        port = F.lit(0)
        for i in range(n_ports - 1, -1, -1):
            lo_e = F.col("__cuts__")[i]
            hi_e = F.col("__cuts__")[i + 1]
            port = F.when(valid & (gv >= lo_e) & (gv <= hi_e), F.lit(i + 1)).otherwise(port)
        # building the chain in reverse makes earlier buckets win ties;
        # reselect to restore the input column order (join put keys first)
        return out.withColumn(portvar, port.cast("long")).select(*df.columns, portvar)

    # no byvars: global percentiles (nanpercentile — nulls skipped by
    # Spark percentile; inf kept to mirror pd_utils/port.py:271-272),
    # then last-match assignment via _sort_into_ports semantics
    cuts = cutdf.agg(
        F.expr(f"percentile(cast({quote(groupvar)} as double), {pct_arr})").alias("__cuts__")
    )
    out = df.crossJoin(F.broadcast(cuts))
    port = F.lit(0)
    for i in range(n_ports):
        lo_e = F.col("__cuts__")[i]
        hi_e = F.col("__cuts__")[i + 1]
        port = F.when((gv >= lo_e) & (gv <= hi_e), F.lit(i + 1)).otherwise(port)
    return out.withColumn(portvar, port.cast("long")).drop("__cuts__")


def portfolio_averages(
    df: DataFrame,
    groupvar: str,
    avgvars: Union[str, list[str]],
    ngroups: int = 10,
    byvars: Optional[Union[str, list[str]]] = None,
    cutdf: Optional[DataFrame] = None,
    wtvar: Optional[str] = None,
    count: Union[str, bool] = False,
    portvar: str = "portfolio",
    avgonly: bool = False,
):
    """Portfolio formation + within-(portfolio x byvars) averages
    (reference: pd_utils/port.py:157-208). Returns ``(avgs, ports)`` or
    just ``avgs`` when ``avgonly``.
    """
    ports = portfolio(
        df, groupvar, ngroups=ngroups, byvars=byvars, cutdf=cutdf, portvar=portvar
    )
    byvars_l = to_list(byvars)
    by = [portvar] + byvars_l if byvars_l else [portvar]
    avgs = averages(ports, avgvars, byvars=by, wtvar=wtvar, count=count)
    if avgonly:
        return avgs
    return avgs, ports


def long_short_portfolio(
    df: DataFrame,
    portvar: str,
    byvars: Optional[Union[str, list[str]]] = None,
    retvars: Optional[Union[str, list[str]]] = None,
    top_minus_bot: bool = True,
    ordervar: Optional[str] = None,
) -> DataFrame:
    """Difference the top and bottom portfolios element-wise, aligned on
    ``byvars`` (reference: pd_utils/port.py:211-260).

    Returns byvars + the differenced ``retvars`` (default: all numeric
    columns except byvars and ``portvar``). When ``byvars`` is None the
    reference aligns the two slices on the pandas index
    (pd_utils/port.py:248-260); an unordered relation has no index, so
    pass ``ordervar`` instead and the slices align POSITIONALLY — i-th
    long row (by ordervar) minus i-th short row. Output then carries
    ``row_index`` (0-based position) plus the differenced retvars.

    Plan: a one-row min/max aggregate broadcast to both sides (no
    ``collect``); byvars path is an equi join of the two slices on
    byvars. The positional path numbers each slice with a
    single-partition window — acceptable because portfolio slices are
    post-formation outputs (rows ~= periods, not raw data); do not use
    it on a raw 100 TB frame.
    """
    from pd_utils_spark.utils import numeric_cols

    byvars_l = to_list(byvars)
    if not byvars_l and ordervar is None:
        raise ValueError(
            "pass byvars (group alignment) or ordervar (positional "
            "alignment — the Spark stand-in for the reference's "
            "pandas-index alignment when byvars is None)"
        )
    excl = set(byvars_l) | {portvar, ordervar}
    if retvars is None:
        retvars_l = [c for c in numeric_cols(df) if c not in excl]
    else:
        retvars_l = to_list(retvars)

    bounds = df.agg(F.max(portvar).alias("__top__"), F.min(portvar).alias("__bot__"))
    tagged = df.crossJoin(F.broadcast(bounds))
    long_port = F.col("__top__") if top_minus_bot else F.col("__bot__")
    short_port = F.col("__bot__") if top_minus_bot else F.col("__top__")

    if byvars_l:
        long_df = tagged.filter(F.col(portvar) == long_port).select(
            *byvars_l, *[F.col(c).alias(f"__l_{c}") for c in retvars_l]
        )
        short_df = tagged.filter(F.col(portvar) == short_port).select(
            *byvars_l, *[F.col(c).alias(f"__s_{c}") for c in retvars_l]
        )
        joined = long_df.join(short_df, on=byvars_l, how="outer")
        return joined.select(
            *byvars_l,
            *[(F.col(f"__l_{c}") - F.col(f"__s_{c}")).alias(c) for c in retvars_l],
        )

    from pyspark.sql import Window

    w = Window.orderBy(ordervar)
    long_df = tagged.filter(F.col(portvar) == long_port).select(
        (F.row_number().over(w) - 1).alias("row_index"),
        *[F.col(c).alias(f"__l_{c}") for c in retvars_l],
    )
    short_df = tagged.filter(F.col(portvar) == short_port).select(
        (F.row_number().over(w) - 1).alias("row_index"),
        *[F.col(c).alias(f"__s_{c}") for c in retvars_l],
    )
    joined = long_df.join(short_df, on="row_index", how="outer")
    return joined.select(
        "row_index",
        *[(F.col(f"__l_{c}") - F.col(f"__s_{c}")).alias(c) for c in retvars_l],
    )
