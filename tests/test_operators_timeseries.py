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


class TestMannKendall:
    @staticmethod
    def _mk_ref(x):
        import math

        n = len(x)
        s = 0
        for i in range(n):
            for j in range(i + 1, n):
                s += int(x[j] > x[i]) - int(x[j] < x[i])
        from collections import Counter

        tie_term = sum(
            c * (c - 1) * (2 * c + 5) for c in Counter(x).values()
        )
        var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
        if s > 0 and var_s > 0:
            z = (s - 1.0) / math.sqrt(var_s)
        elif s < 0 and var_s > 0:
            z = (s + 1.0) / math.sqrt(var_s)
        else:
            z = 0.0
        return n, s, var_s, z

    def test_matches_pairwise_reference_with_ties(self, spark):
        from pd_utils_spark.operators.timeseries import mann_kendall

        rng = np.random.RandomState(7)
        rows = []
        series = {}
        for g in ("up", "down", "tied", "noise"):
            if g == "up":
                x = (np.arange(40) + rng.randint(0, 3, 40)).astype(float)
            elif g == "down":
                x = (-np.arange(40) + rng.randint(0, 3, 40)).astype(float)
            elif g == "tied":
                x = rng.randint(0, 4, 40).astype(float)
            else:
                x = rng.randn(40)
            series[g] = list(x)
            rows += [(g, i, float(v)) for i, v in enumerate(x)]
        df = spark.createDataFrame(rows, ["g", "t", "v"])
        got = {r.g: r for r in mann_kendall(df, "v", "t", "g").collect()}
        for g, x in series.items():
            n, s, var_s, z = self._mk_ref(x)
            assert got[g].n == n and got[g].s_stat == s, g
            assert got[g].var_s == pytest.approx(var_s, rel=1e-12), g
            assert got[g].z == pytest.approx(z, rel=1e-12), g
        # directionality + p-value behavior
        assert got["up"].z > 3 and got["up"].p_value < 0.001
        assert got["down"].z < -3 and got["down"].p_value < 0.001
        assert got["noise"].p_value > 0.01

    def test_strict_monotone_s_is_npairs(self, spark):
        from pd_utils_spark.operators.timeseries import mann_kendall

        df = spark.createDataFrame(
            [("g", i, float(i * i)) for i in range(25)], ["g", "t", "v"]
        )
        r = mann_kendall(df, "v", "t", "g").collect()[0]
        assert r.s_stat == 25 * 24 // 2

    def test_constant_and_tiny_groups(self, spark):
        from pd_utils_spark.operators.timeseries import mann_kendall

        df = spark.createDataFrame(
            [("c", i, 5.0) for i in range(6)] + [("one", 0, 1.0)],
            ["g", "t", "v"],
        )
        out = {r.g: r for r in mann_kendall(df, "v", "t", "g").collect()}
        assert "one" not in out  # < 2 rows -> absent
        assert out["c"].s_stat == 0 and out["c"].z == 0.0
        # A&S 7.1.26 has |err| <= 1.5e-7, so erfc(0) is ~1, not == 1
        assert out["c"].p_value == pytest.approx(1.0, abs=2e-7)


class TestTheilSen:
    def test_matches_brute_force_and_outlier_robust(self, spark):
        from pd_utils_spark.operators.timeseries import theil_sen

        rng = np.random.RandomState(11)
        t = np.arange(30, dtype=float)
        clean = 3.0 * t + 7.0 + rng.randn(30) * 0.1
        dirty = clean.copy()
        dirty[5] = 1000.0  # one wild outlier
        rows = [("clean", float(tt), float(v)) for tt, v in zip(t, clean)]
        rows += [("dirty", float(tt), float(v)) for tt, v in zip(t, dirty)]
        df = spark.createDataFrame(rows, ["g", "t", "v"])
        got = {r.g: r for r in theil_sen(df, "v", "t", "g").collect()}

        def brute(tv, xv):
            slopes = [
                (xv[j] - xv[i]) / (tv[j] - tv[i])
                for i in range(len(tv))
                for j in range(i + 1, len(tv))
            ]
            sl = float(np.median(slopes))
            ic = float(np.median([x - sl * tt for tt, x in zip(tv, xv)]))
            return sl, ic

        for g, xv in (("clean", clean), ("dirty", dirty)):
            sl, ic = brute(t, xv)
            assert got[g].slope == pytest.approx(sl, rel=1e-12), g
            assert got[g].intercept == pytest.approx(ic, rel=1e-12), g
            assert got[g].n == 30
        # the outlier barely moves the robust fit
        assert abs(got["dirty"].slope - got["clean"].slope) < 0.05

    def test_duplicate_times_excluded_and_small_groups(self, spark):
        from pd_utils_spark.operators.timeseries import theil_sen

        # two points at the same t: no valid pair -> group absent
        df = spark.createDataFrame(
            [("dup", 1.0, 2.0), ("dup", 1.0, 9.0),
             ("ok", 0.0, 1.0), ("ok", 2.0, 5.0)],
            ["g", "t", "v"],
        )
        got = {r.g: r for r in theil_sen(df, "v", "t", "g").collect()}
        assert "dup" not in got
        assert got["ok"].slope == pytest.approx(2.0)
        assert got["ok"].intercept == pytest.approx(1.0)


class TestRollingQuantile:
    def test_matches_pandas_rolling_quantile(self, spark):
        from pd_utils_spark.operators.timeseries import rolling_quantile

        rng = np.random.RandomState(9)
        rows = []
        frames = {}
        for g in ("a", "b"):
            x = rng.randn(30)
            frames[g] = pd.Series(x)
            rows += [(g, i, float(v)) for i, v in enumerate(x)]
        df = spark.createDataFrame(rows, ["g", "t", "v"])
        out = rolling_quantile(
            df, "v", "t", "g", n=5, probs=(0.25, 0.5)
        ).toPandas().sort_values(["g", "t"])
        for g, s in frames.items():
            sub = out[out.g == g]
            for p, col in ((0.25, "v_roll_q0.25"), (0.5, "v_roll_q0.5")):
                ref = s.rolling(5).quantile(p, interpolation="linear")
                got = sub[col].to_numpy()
                for i in range(30):
                    if i < 4:
                        assert pd.isna(got[i])
                    else:
                        assert got[i] == pytest.approx(ref.iloc[i], rel=1e-12)

    def test_min_periods_and_validation(self, spark):
        from pd_utils_spark.operators.timeseries import rolling_quantile

        df = spark.createDataFrame(
            [("g", i, float(i)) for i in range(4)], ["g", "t", "v"]
        )
        out = (
            rolling_quantile(df, "v", "t", "g", n=3, probs=(0.5,),
                             min_periods=1)
            .toPandas().sort_values("t")["v_roll_q0.5"].tolist()
        )
        # expanding median until the window fills: [0], [0,1], [0,1,2], [1,2,3]
        assert out == [0.0, 0.5, 1.0, 2.0]
        with pytest.raises(ValueError, match="n must"):
            rolling_quantile(df, "v", "t", "g", n=0)
        with pytest.raises(ValueError, match="probs"):
            rolling_quantile(df, "v", "t", "g", n=3, probs=(1.5,))
