"""Date/calendar scalar functions and time-expansion operators.

Spark-native re-expression of the reference's datetime_utils module
(reference: pd_utils/datetime_utils.py). Trading-day arithmetic is an
indexed lookup against a generated trading-day dimension table (a few
thousand rows per decade — always broadcast), not an interval add.
"""

from __future__ import annotations

import datetime
from typing import Optional, Sequence, Union

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def convert_sas_date_to_date(c: Union[str, Column]) -> Column:
    """SAS day-count (epoch 1960-01-01) -> timestamp column; nulls
    propagate (reference: pd_utils/datetime_utils.py:18-35).

    Pure column expression — Catalyst computes it per row inside
    codegen; the reference's distinct-apply-rejoin optimization
    (pd_utils/merge.py:157-191) is unnecessary for a native expression.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.date_add(F.to_date(F.lit("1960-01-01")), col.cast("int")).cast("timestamp")


def year_month_from_date(
    df: DataFrame, date: str = "Date", yearname: str = "Year", monthname: str = "Month"
) -> DataFrame:
    """Add integer year/month columns from a date column
    (reference: pd_utils/datetime_utils.py:38-53)."""
    return df.withColumn(yearname, F.year(date).cast("long")).withColumn(
        monthname, F.month(date).cast("long")
    )


def us_trading_holidays(start: str = "1960-01-01", end: str = "2060-12-31") -> list:
    """US market holiday dates (9 rules: New Year's, MLK, Presidents,
    Good Friday, Memorial, July 4th, Labor, Thanksgiving, Christmas,
    nearest-workday observance), generated driver-side with pandas'
    public holiday calendar (reference: pd_utils/datetime_utils.py:237-251).
    A century of holidays is ~900 values — always broadcastable.
    """
    from pandas.tseries.holiday import (
        AbstractHolidayCalendar,
        GoodFriday,
        Holiday,
        USLaborDay,
        USMartinLutherKingJr,
        USMemorialDay,
        USPresidentsDay,
        USThanksgivingDay,
        nearest_workday,
    )

    class USTradingCalendar(AbstractHolidayCalendar):
        rules = [
            Holiday("NewYearsDay", month=1, day=1, observance=nearest_workday),
            USMartinLutherKingJr,
            USPresidentsDay,
            GoodFriday,
            USMemorialDay,
            Holiday("USIndependenceDay", month=7, day=4, observance=nearest_workday),
            USLaborDay,
            USThanksgivingDay,
            Holiday("Christmas", month=12, day=25, observance=nearest_workday),
        ]

    cal = USTradingCalendar()
    return [d.date() for d in cal.holidays(pd.Timestamp(start), pd.Timestamp(end))]


def trading_day_dimension(
    spark: SparkSession, start: str = "1960-01-01", end: str = "2060-12-31"
) -> DataFrame:
    """Trading-day dimension table ``(td_date: date, td_index: long)``:
    every non-weekend, non-holiday date in [start, end] with a dense
    ordinal. Trading-day shifts become index lookups
    (SURVEY.md §7 hard parts). ~25k rows per century — broadcast it.

    Built in-plan: ``sequence`` -> ``explode`` -> weekday filter ->
    broadcast holiday anti-filter -> ``row_number``.
    """
    holidays = us_trading_holidays(start, end)
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit(start)), F.to_date(F.lit(end)), F.expr("interval 1 day")
            )
        ).alias("td_date")
    )
    days = days.filter(~F.dayofweek("td_date").isin(1, 7))
    if holidays:
        days = days.filter(~F.col("td_date").isin(holidays))
    w = Window.orderBy("td_date")
    return days.withColumn("td_index", F.row_number().over(w).cast("long"))


def calendar_asof_dimension(td: DataFrame) -> DataFrame:
    """Every calendar date in the trading dimension's range mapped to
    the latest trading-day index <= that date:
    ``(cal_date: date, base_idx: long)``. Lets trading-day arithmetic be
    pure equi joins. Same broadcastable size class as the trading
    dimension itself.
    """
    bounds = td.agg(F.min("td_date").alias("lo"), F.max("td_date").alias("hi"))
    all_days = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 day"))).alias("cal_date")
    )
    joined = all_days.join(td, all_days.cal_date == td.td_date, "left")
    w = Window.orderBy("cal_date").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return joined.select(
        "cal_date", F.last("td_index", ignorenulls=True).over(w).alias("base_idx")
    )


def expand_time(
    df: DataFrame,
    intermediate_periods: bool = False,
    datevar: str = "Date",
    freq: str = "m",
    time: Sequence[int] = (12, 24, 36, 48, 60),
    newdate: str = "Shift Date",
    shiftvar: str = "Shift",
    trading_days: Optional[DataFrame] = None,
) -> DataFrame:
    """Duplicate each row once per shift in ``time``, adding ``shiftvar``
    (periods shifted) and ``newdate`` = date advanced by the shift in
    ``freq`` units: 'm' months, 'a' years, 'd' trading days
    (reference: pd_utils/datetime_utils.py:56-174).

    Row multiplication is an ``explode`` of a literal array — no
    shuffle. Month/year arithmetic is ``add_months``. Trading-day
    arithmetic is an as-of lookup into the (broadcast) trading-day
    dimension: date -> latest trading day index <= date -> index+shift
    -> date. Pass ``trading_days`` (from ``trading_day_dimension``) to
    control the calendar range; defaults to 1960-2060.
    """
    time_l = sorted(int(t) for t in (time if not isinstance(time, int) else [time]))
    if intermediate_periods:
        time_l = list(range(min(time_l), max(time_l) + 1))

    out = df.withColumn(
        shiftvar, F.explode(F.array(*[F.lit(t) for t in time_l]))
    )

    if freq == "m":
        out = out.withColumn(newdate, F.add_months(F.col(datevar), F.col(shiftvar)).cast("timestamp"))
    elif freq == "a":
        out = out.withColumn(
            newdate, F.add_months(F.col(datevar), F.col(shiftvar) * 12).cast("timestamp")
        )
    elif freq == "d":
        spark = df.sparkSession
        td = trading_days if trading_days is not None else trading_day_dimension(spark)
        # every-calendar-date -> latest trading-day index <= date: turns
        # the as-of lookup into two broadcast EQUI joins (date -> index,
        # index+shift -> date) — no range join, no row explosion
        asof = calendar_asof_dimension(td).select(
            F.col("cal_date").alias("__d__"), F.col("base_idx").alias("__base_idx__")
        )
        target = td.select(
            F.col("td_index").alias("__target_idx__"), F.col("td_date").alias("__target_date__")
        )
        out = (
            out.withColumn("__d__", F.to_date(datevar))
            .join(F.broadcast(asof), on="__d__", how="left")
            .withColumn("__target_idx__", F.col("__base_idx__") + F.col(shiftvar))
            .join(F.broadcast(target), on="__target_idx__", how="left")
            .withColumn(newdate, F.col("__target_date__").cast("timestamp"))
            .drop("__d__", "__base_idx__", "__target_idx__", "__target_date__")
        )
    else:
        raise ValueError("freq must be 'd', 'm', or 'a'")
    return out


def expand_months(
    df: DataFrame,
    datevar: str = "Date",
    newdatevar: str = "Daily Date",
    trade_days: bool = True,
    trading_days: Optional[DataFrame] = None,
) -> DataFrame:
    """Monthly -> daily explode: one output row per trading (or
    calendar) day in the month of ``datevar``
    (reference: pd_utils/datetime_utils.py:177-209).

    ``explode(sequence(trunc(date,'MM'), last_day(date)))`` generates the
    days in-plan (UDTF-shaped, no shuffle); the trading-day filter is a
    weekday predicate + broadcast holiday semi-filter.
    """
    days = F.sequence(
        F.trunc(F.col(datevar), "MM"), F.last_day(F.col(datevar)), F.expr("interval 1 day")
    )
    out = df.withColumn("__day__", F.explode(days))
    if trade_days:
        out = out.filter(~F.dayofweek("__day__").isin(1, 7))
        spark = df.sparkSession
        if trading_days is not None:
            td = trading_days.select(F.col("td_date").alias("__day__"))
            out = out.join(F.broadcast(td), on="__day__", how="left_semi")
        else:
            holidays = us_trading_holidays()
            out = out.filter(~F.col("__day__").isin(holidays))
    return out.withColumn(newdatevar, F.col("__day__").cast("timestamp")).drop("__day__")
