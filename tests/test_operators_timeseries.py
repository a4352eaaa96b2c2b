"""Tests for financial time-series operators (operators/timeseries.py):
pandas-parity for rolling corr/beta, resample().ohlc(), and drawdown."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import pd_utils_spark as pus

nan = np.nan


@pytest.fixture(scope="module")
def panel():
    rng = np.random.default_rng(7)
    n = 60
    pdf = pd.DataFrame(
        {
            "g": np.repeat(["a", "b"], n),
            "t": np.tile(np.arange(n), 2),
            "x": rng.normal(size=2 * n).round(4),
            "y": rng.normal(size=2 * n).round(4),
        }
    )
    # nulls exercise pairwise deletion
    pdf.loc[5, "x"] = nan
    pdf.loc[70, "y"] = nan
    return pdf


class TestRollingCorrBeta:
    def test_corr_matches_pandas(self, spark, panel):
        out = (
            pus.rolling_corr(spark.createDataFrame(panel), "x", "y", 12, "t", "g")
            .toPandas()
            .sort_values(["g", "t"])["x_y_corr12"]
            .reset_index(drop=True)
        )
        exp = (
            panel.sort_values(["g", "t"])
            .groupby("g")
            .apply(lambda d: d.x.rolling(12).corr(d.y), include_groups=False)
            .reset_index(drop=True)
        )
        assert np.allclose(out.fillna(-9), exp.fillna(-9), rtol=1e-8)

    def test_beta_matches_pandas(self, spark, panel):
        out = (
            pus.rolling_beta(spark.createDataFrame(panel), "y", "x", 12, "t", "g")
            .toPandas()
            .sort_values(["g", "t"])["y_beta_x12"]
            .reset_index(drop=True)
        )
        exp = (
            panel.sort_values(["g", "t"])
            .groupby("g")
            .apply(
                lambda d: d.x.rolling(12).cov(d.y) / d.x.rolling(12).var(),
                include_groups=False,
            )
            .reset_index(drop=True)
        )
        assert np.allclose(out.fillna(-9), exp.fillna(-9), rtol=1e-8)

    def test_min_periods_warmup(self, spark, panel):
        out = (
            pus.rolling_corr(
                spark.createDataFrame(panel), "x", "y", 12, "t", "g", min_periods=3
            )
            .toPandas()
            .sort_values(["g", "t"])
        )
        col = out[out.g == "a"]["x_y_corr12"].reset_index(drop=True)
        assert col.iloc[0] != col.iloc[0]  # NaN: 1 pair
        assert col.iloc[1] != col.iloc[1]  # NaN: 2 pairs
        assert np.isfinite(col.iloc[3])

    def test_zero_variance_is_null(self, spark):
        pdf = pd.DataFrame({"t": range(5), "x": [1.0] * 5, "y": [1.0, 2, 3, 4, 5]})
        out = pus.rolling_corr(spark.createDataFrame(pdf), "x", "y", 3, "t").toPandas()
        assert out["x_y_corr3"].isna().all()

    def test_bad_n(self, spark, panel):
        with pytest.raises(ValueError, match="n must"):
            pus.rolling_corr(spark.createDataFrame(panel), "x", "y", 1, "t")


class TestResampleOhlc:
    def test_matches_pandas_resample(self, spark):
        rng = np.random.default_rng(9)
        n = 200
        pdf = pd.DataFrame(
            {
                "sym": np.repeat(["AA", "BB"], n // 2),
                "ts": np.tile(
                    pd.date_range("2024-01-01", periods=n // 2, freq="97min"), 2
                ),
                "px": (100 + rng.normal(size=n).cumsum()).round(4),
                "vol": rng.integers(1, 100, n).astype(float),
            }
        )
        out = pus.resample_ohlc(
            spark.createDataFrame(pdf), "px", "ts", "sym", "1 day", volumecol="vol"
        ).toPandas()
        exp = (
            pdf.set_index("ts")
            .groupby("sym")[["px", "vol"]]
            .resample("1D")
            .agg(
                open=("px", "first"),
                high=("px", "max"),
                low=("px", "min"),
                close=("px", "last"),
                n_obs=("px", "count"),
                volume=("vol", "sum"),
            )
            .reset_index()
        )
        exp = exp[exp.n_obs > 0].reset_index(drop=True)  # spark emits no empty buckets
        got = out.sort_values(["sym", "bucket_start"]).reset_index(drop=True)
        exp = exp.sort_values(["sym", "ts"]).reset_index(drop=True)
        assert len(got) == len(exp)
        for c in ["open", "high", "low", "close", "volume"]:
            assert np.allclose(got[c], exp[c]), c
        assert (got["n_obs"].to_numpy() == exp["n_obs"].to_numpy()).all()

    def test_tie_on_timestamp_is_deterministic(self, spark):
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime(["2024-01-01 10:00"] * 2 + ["2024-01-01 11:00"] * 2),
                "px": [5.0, 3.0, 9.0, 7.0],
            }
        )
        row = pus.resample_ohlc(spark.createDataFrame(pdf), "px", "ts", freq="1 day").collect()[0]
        # tied extremes resolve to the SMALLEST value on both ends
        assert (row.open, row.close) == (3.0, 7.0)


class TestDrawdown:
    def test_matches_pandas_cummax(self, spark):
        rng = np.random.default_rng(13)
        pdf = pd.DataFrame(
            {
                "g": np.repeat(["a", "b"], 50),
                "t": np.tile(np.arange(50), 2),
                "v": (100 * np.exp(rng.normal(0, 0.02, 100).cumsum())).round(6),
            }
        )
        out = (
            pus.drawdown(spark.createDataFrame(pdf), "v", "t", "g")
            .toPandas()
            .sort_values(["g", "t"])
            .reset_index(drop=True)
        )
        exp = pdf.sort_values(["g", "t"]).reset_index(drop=True)
        peak = exp.groupby("g")["v"].cummax()
        assert np.allclose(out["v_peak"], peak)
        assert np.allclose(out["drawdown"], exp["v"] / peak - 1)

    def test_nonpositive_peak_yields_null(self, spark):
        pdf = pd.DataFrame({"t": [1, 2], "v": [-1.0, -2.0]})
        out = pus.drawdown(spark.createDataFrame(pdf), "v", "t").toPandas()
        assert out["drawdown"].isna().all()


class TestChangepoint:
    def test_finds_injected_shifts_and_ranks_noise_low(self, spark):
        import numpy as np

        from pd_utils_spark.operators.timeseries import changepoint_mean_shift

        rng = np.random.RandomState(0)
        rows = []
        for g, cp, delta in [("a", 30, 2.0), ("b", 10, -1.5), ("c", None, 0.0)]:
            for i in range(50):
                base = 10.0 + (delta if cp is not None and i >= cp else 0.0)
                rows.append((g, i, round(base + rng.normal(0, 0.3), 3)))
        df = spark.createDataFrame(rows, ["g", "i", "v"])
        out = {r.g: r for r in changepoint_mean_shift(df, "v", "i", "g").collect()}
        assert out["a"].split_after == 29   # change begins at i=30
        assert out["b"].split_after == 9
        assert out["a"].shift == pytest.approx(2.0, abs=0.3)
        assert out["b"].shift == pytest.approx(-1.5, abs=0.3)
        # no-change group scores far below the real shifts
        assert out["c"].stat_norm < 3 < out["a"].stat_norm
        assert out["c"].stat_norm < 3 < out["b"].stat_norm

    def test_min_segment_and_small_groups(self, spark):
        from pd_utils_spark.operators.timeseries import changepoint_mean_shift

        df = spark.createDataFrame(
            [("g", i, float(i >= 2) * 10) for i in range(4)]
            + [("tiny", 0, 1.0), ("tiny", 1, 2.0), ("tiny", 2, 3.0)],
            ["g", "i", "v"],
        )
        out = changepoint_mean_shift(df, "v", "i", "g", min_segment=2).collect()
        # 'tiny' (n=3 < 2*min_segment) yields no row
        assert {r.g for r in out} == {"g"}
        assert out[0].split_after == 1
        with pytest.raises(ValueError):
            changepoint_mean_shift(df, "v", "i", "g", min_segment=0)

    def test_constant_group_null_norm(self, spark):
        from pd_utils_spark.operators.timeseries import changepoint_mean_shift

        df = spark.createDataFrame(
            [("g", i, 5.0) for i in range(6)], ["g", "i", "v"]
        )
        r = changepoint_mean_shift(df, "v", "i", "g").collect()[0]
        assert r.stat == 0.0 and r.stat_norm is None
