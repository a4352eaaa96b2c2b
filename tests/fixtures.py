"""Spark versions of the reference test fixture frames
(reference: tests/test_pandas.py:16-145). See FIXTURES.md."""

from __future__ import annotations

import numpy as np
import pandas as pd

ROWS = [
    (10516, "a", "1/1/2000", 1.01),
    (10516, "a", "1/2/2000", 1.02),
    (10516, "a", "1/3/2000", 1.03),
    (10516, "a", "1/4/2000", 1.04),
    (10516, "b", "1/1/2000", 1.05),
    (10516, "b", "1/2/2000", 1.06),
    (10516, "b", "1/3/2000", 1.07),
    (10516, "b", "1/4/2000", 1.08),
    (10517, "a", "1/1/2000", 1.09),
    (10517, "a", "1/2/2000", 1.10),
    (10517, "a", "1/3/2000", 1.11),
    (10517, "a", "1/4/2000", 1.12),
]
COLS = ["PERMNO", "byvar", "Date", "RET"]


def df(spark):
    return spark.createDataFrame(ROWS, COLS)


def df_duplicate_row(spark):
    rows = ROWS[:3] + [ROWS[2]] + ROWS[3:]
    return spark.createDataFrame(rows, COLS)


def df_weight(spark):
    weights = [0, 1, 1, 0, 1, 1, 1, 1, 0, 0, 0, 1]
    rows = [r + (w,) for r, w in zip(ROWS, weights)]
    return spark.createDataFrame(rows, COLS + ["weight"])


def df_nan_byvar(spark):
    pdf = pd.DataFrame([("a", 1), (None, 2), ("b", 3), ("b", 4)], columns=["byvar", "val"])
    return spark.createDataFrame(pdf)


def df_nan_byvar_and_val(spark):
    pdf = pd.DataFrame(
        [("a", 1.0), (None, 2.0), ("b", np.nan), ("b", 4.0)], columns=["byvar", "val"]
    )
    return spark.createDataFrame(pdf)


def single_ticker_df(spark):
    pdf = pd.DataFrame(
        [("a", pd.Timestamp("2000-01-01"), "ADM")], columns=["byvar", "Date", "TICKER"]
    )
    return spark.createDataFrame(pdf)


def df_datetime(spark):
    pdf = pd.DataFrame(ROWS, columns=COLS)
    pdf["Date"] = pd.to_datetime(pdf["Date"])
    return spark.createDataFrame(pdf)


def df_gvkey_str(spark):
    pdf = pd.DataFrame(
        [
            ("001076", "3/1/1995"),
            ("001076", "4/1/1995"),
            ("001722", "1/1/2012"),
            ("001722", "7/1/2012"),
            ("001722", None),
            (None, "1/1/2012"),
        ],
        columns=["GVKEY", "Date"],
    )
    pdf["Date"] = pd.to_datetime(pdf["Date"])
    return spark.createDataFrame(pdf)


def df_gvkey_str2(spark):
    pdf = pd.DataFrame(
        [
            ("001076", "2/1/1995"),
            ("001076", "3/2/1995"),
            ("001722", "11/1/2011"),
            ("001722", "10/1/2011"),
            ("001722", None),
            (None, "1/1/2012"),
        ],
        columns=["GVKEY", "Date"],
    )
    pdf["Date"] = pd.to_datetime(pdf["Date"])
    return spark.createDataFrame(pdf)


def df_fill_data(spark):
    pdf = pd.DataFrame(
        [
            (4, "c", np.nan, "a", 0),
            (1, "d", 3.0, "a", 1),
            (10, "e", 100.0, "a", 2),
            (2, None, 6.0, "b", 3),
            (5, "f", 8.0, "b", 4),
            (11, "g", 150.0, "b", 5),
        ],
        columns=["y", "x1", "x2", "group", "roworder"],
    )
    return spark.createDataFrame(pdf)


def df_period(spark):
    pdf = pd.DataFrame(
        [
            (10516, "1/%d/2000" % d, v)
            for d, v in zip(range(1, 9), [1.01, 1.02, 1.03, 1.04, 1.05, 1.06, 1.07, 1.08])
        ]
        + [
            (10517, "1/%d/2000" % d, v)
            for d, v in zip(range(1, 9), [1.09, 1.10, 1.11, 1.12, 1.05, 1.06, 1.07, 1.08])
        ],
        columns=["PERMNO", "Date", "RET"],
    )
    pdf["Date"] = pd.to_datetime(pdf["Date"])
    return spark.createDataFrame(pdf)
