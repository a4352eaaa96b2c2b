"""Cumulative-product-within-window-buckets operator.

Spark-native re-expression of the reference's cum module
(reference: pd_utils/cum.py). The reference's split-to-arrays +
multiprocessing ``np.cumprod`` machinery (pd_utils/cum.py:127-176)
becomes a single window expression:
``F.product(c).over(partitionBy(byvars + [bucket]).orderBy(periodvar)
.rowsBetween(unboundedPreceding, currentRow))`` — the shuffle IS the
split, the running frame IS the cumprod. ``F.product`` is used (not
``exp(sum(log))``) so zero/negative returns are exact.
"""

from __future__ import annotations

import warnings
from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pd_utils_spark.utils import to_list


def _bucket_from_position(pos: Column, time: Sequence[int]) -> Column:
    """Map a 0-based in-group position to its window-bucket index,
    replicating the reference's positional window construction
    (create_windows, pd_utils/cum.py:285-303): with ``time`` shifted so
    the first entry is 0, windows are [0], (0, t1], (t1, t2], ..., plus
    a leftover window for positions past the last boundary.
    """
    shifted = sorted(t - sorted(time)[0] for t in time)
    boundaries = [t for t in shifted]  # first is always 0
    expr = F.lit(len([b for b in boundaries if b != 0]) + 1)  # leftover window
    for idx in range(len(boundaries) - 1, 0, -1):
        expr = F.when(pos <= F.lit(boundaries[idx]), F.lit(idx)).otherwise(expr)
    expr = F.when(pos == 0, F.lit(0)).otherwise(expr)
    return expr


def cumulate(
    df: DataFrame,
    cumvars: Union[str, list[str]],
    method: str,
    periodvar: str = "Date",
    byvars: Optional[Union[str, list[str]]] = None,
    time: Optional[Sequence[int]] = None,
    grossify: bool = False,
    multiprocess: Union[bool, int] = True,
    replace: bool = False,
) -> DataFrame:
    """Cumulative product of ``cumvars`` within (byvars x window-bucket),
    ordered by ``periodvar`` (reference: pd_utils/cum.py:19-257).

    Methods (pd_utils/cum.py:78-79,194-201):

    - ``'between'``: buckets defined positionally within each byvars
      group from the ``time`` breakpoints (bucket of a row depends on its
      rank by ``periodvar`` within the group, exactly like the
      reference's positional ``window_mapping``).
    - ``'first'``: bucket 0 = rows at the GLOBAL minimum ``periodvar``
      (the reference compares against ``min(df[periodvar])`` over the
      whole frame, pd_utils/cum.py:200-201); bucket 1 = everything else.
    - ``'zero'``: NotImplementedError, same as the reference.

    ``grossify`` adds 1 before cumulating and subtracts 1 from both the
    original and cum columns after (pd_utils/cum.py:108-110,244-247).
    Output columns ``cum_<var>`` (double); ``replace=True`` swaps them in
    place of the originals. ``multiprocess`` is accepted for API parity
    and ignored.
    """
    if method.lower() == "zero":
        raise NotImplementedError("method zero not implemented yet")
    assert method.lower() in ("between", "first")
    if method.lower() == "between" and time is None:
        raise ValueError("need time for between method")
    if time is not None and method.lower() != "between":
        warnings.warn("Time provided but method was not between. Time will be ignored.")

    cumvars_l = to_list(cumvars)
    byvars_l = to_list(byvars)

    out = df
    if grossify:
        for c in cumvars_l:
            out = out.withColumn(c, F.col(c) + 1)

    if method.lower() == "between":
        pos_w = Window.partitionBy(*byvars_l).orderBy(periodvar)
        out = out.withColumn("__pos__", F.row_number().over(pos_w) - 1)
        out = out.withColumn("__map_window__", _bucket_from_position(F.col("__pos__"), list(time)))
    else:  # first
        gmin = df.agg(F.min(periodvar).alias("__gmin__"))
        out = out.crossJoin(F.broadcast(gmin))
        out = out.withColumn(
            "__map_window__", F.when(F.col(periodvar) == F.col("__gmin__"), 0).otherwise(1)
        ).drop("__gmin__")

    part = byvars_l + ["__map_window__"]
    cum_w = (
        Window.partitionBy(*part)
        .orderBy(periodvar)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in cumvars_l:
        out = out.withColumn(f"cum_{c}", F.product(F.col(c).cast("double")).over(cum_w))

    if grossify:
        for c in cumvars_l + [f"cum_{c}" for c in cumvars_l]:
            out = out.withColumn(c, F.col(c) - 1)

    drop_cols = [c for c in out.columns if c.startswith("__")]
    out = out.drop(*drop_cols)
    if replace:
        out = out.drop(*cumvars_l)
        for c in cumvars_l:
            out = out.withColumnRenamed(f"cum_{c}", c)
    return out
