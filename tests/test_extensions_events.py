"""Golden tests for event analytics operators
(pd_utils_spark/extensions/events.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from pd_utils_spark.extensions import events as E

EV = pd.DataFrame(
    {
        "user_id": [1, 1, 1, 2, 2, 3, 3, 3],
        "event_type": [
            "view", "click", "purchase",   # u1: full ordered funnel
            "click", "view",               # u2: click BEFORE view -> only step 0
            "view", "purchase", "click",   # u3: purchase before click -> steps 0,1? click after view yes; purchase before click -> stops at click
        ],
        "ts": pd.to_datetime(
            [
                "2024-01-01 10:00:00", "2024-01-01 10:05:00", "2024-01-01 10:10:00",
                "2024-01-02 09:00:00", "2024-01-02 09:30:00",
                "2024-01-08 12:00:00", "2024-01-08 12:30:00", "2024-01-08 13:00:00",
            ]
        ),
    }
)


@pytest.fixture()
def ev(spark):
    return spark.createDataFrame(EV)


class TestFunnel:
    def test_ordered_funnel(self, ev):
        out = {
            r.step: r.users
            for r in E.funnel_counts(ev, ["view", "click", "purchase"]).collect()
        }
        # u1, u2, u3 all viewed; u1 and u3 clicked after viewing;
        # only u1 purchased after clicking (u3 purchased before click)
        assert out == {"view": 3, "click": 2, "purchase": 1}

    def test_empty_steps_rejected(self, ev):
        with pytest.raises(ValueError, match="steps"):
            E.funnel_counts(ev, [])


class TestCohortRetention:
    def test_weekly_cohorts(self, ev):
        out = {
            (r.cohort.date().isoformat(), r.period_number): r.users
            for r in E.cohort_retention(ev, period="week").collect()
        }
        # u1, u2 first active in week of 2024-01-01; u3 in week of 01-08
        assert out[("2024-01-01", 0)] == 2
        assert out[("2024-01-08", 0)] == 1
        assert len(out) == 2  # nobody returns a later week

    def test_monthly_cohorts_use_month_offsets(self, spark):
        # a user active in Jan and Mar is period_number 2 (months),
        # not ~59 (days) — month offsets must not use a fixed divisor
        ev = spark.createDataFrame(
            pd.DataFrame(
                {
                    "user_id": [1, 1, 2],
                    "ts": pd.to_datetime(
                        ["2024-01-15", "2024-03-02", "2024-02-01"]
                    ),
                }
            )
        )
        out = {
            (r.cohort.date().isoformat(), r.period_number): r.users
            for r in E.cohort_retention(ev, period="month").collect()
        }
        assert out == {
            ("2024-01-01", 0): 1,
            ("2024-01-01", 2): 1,
            ("2024-02-01", 0): 1,
        }

    def test_hourly_cohorts(self, ev):
        out = E.cohort_retention(ev, period="hour").collect()
        # u3 is active 12:00, 12:30, 13:00 -> periods 0 and 1
        by_pn = {
            (r.cohort.isoformat(), r.period_number): r.users for r in out
        }
        assert by_pn[("2024-01-08T12:00:00", 1)] == 1

    def test_unsupported_period_rejected(self, ev):
        with pytest.raises(ValueError, match="period"):
            E.cohort_retention(ev, period="quarter")


class TestTopK:
    def test_top_k_with_tiebreak(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                {"g": [1, 1, 1, 2], "v": [5.0, 5.0, 1.0, 7.0], "id": [10, 11, 12, 13]}
            )
        )
        out = E.top_k_per_group(df, "g", "v", k=2, tiebreak="id").collect()
        got = {(r.g, r.rank): r.id for r in out}
        assert got == {(1, 1): 10, (1, 2): 11, (2, 1): 13}


class TestSessionize:
    def test_gap_sessions(self, ev):
        out = {
            (r.user_id, r.ts.isoformat()): r.session_index
            for r in E.sessionize(ev, gap_seconds=600).collect()
        }
        # u1: 10:00, 10:05, 10:10 all within 10-min gaps -> one session
        assert out[(1, "2024-01-01T10:00:00")] == 1
        assert out[(1, "2024-01-01T10:10:00")] == 1
        # u2: 09:00 then 09:30 -> 30-min gap > 600s -> new session
        assert out[(2, "2024-01-02T09:00:00")] == 1
        assert out[(2, "2024-01-02T09:30:00")] == 2

    def test_session_stats(self, ev):
        rows = {
            (r.user_id, r.session_index): r
            for r in E.session_stats(ev, gap_seconds=1800).collect()
        }
        # u3: 12:00, 12:30, 13:00 with 30-min gaps == gap_seconds -> one session
        r3 = rows[(3, 1)]
        assert r3.n_events == 3
        assert r3.duration_seconds == 3600
        # u1 one session of 3; u2 one session of 2 (30-min gap == limit)
        assert rows[(1, 1)].n_events == 3
        assert rows[(2, 1)].n_events == 2

    def test_strict_gap_splits(self, ev):
        rows = {
            (r.user_id, r.session_index): r.n_events
            for r in E.session_stats(ev, gap_seconds=1799).collect()
        }
        assert rows[(2, 1)] == 1 and rows[(2, 2)] == 1


class TestRollingStats:
    def test_trailing_window(self, spark):
        import pandas as pd

        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "g": ["a"] * 4,
                    "ts": pd.to_datetime(
                        [
                            "2024-01-01 10:00:00",
                            "2024-01-01 10:30:00",
                            "2024-01-01 11:15:00",
                            "2024-01-01 13:00:00",
                        ]
                    ),
                    "v": [1.0, 2.0, 3.0, 4.0],
                }
            )
        )
        out = {
            r.ts.isoformat(): (r.v_roll_sum, r.v_roll_count)
            for r in E.rolling_stats(
                df, "v", "ts", byvars="g", window_seconds=3600,
                stats=("sum", "count"),
            ).collect()
        }
        assert out["2024-01-01T10:00:00"] == (1.0, 1)
        assert out["2024-01-01T10:30:00"] == (3.0, 2)
        # 11:15 window [10:15, 11:15] -> rows at 10:30 and 11:15
        assert out["2024-01-01T11:15:00"] == (5.0, 2)
        # 13:00 window [12:00, 13:00] -> itself only
        assert out["2024-01-01T13:00:00"] == (4.0, 1)

    def test_bad_stat_rejected(self, spark):
        import pandas as pd

        df = spark.createDataFrame(
            pd.DataFrame({"g": ["a"], "ts": pd.to_datetime(["2024-01-01"]), "v": [1.0]})
        )
        with pytest.raises(ValueError, match="unsupported"):
            E.rolling_stats(df, "v", "ts", stats=("median",))


class TestRollingRowStats:
    def test_matches_pandas_rolling(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.events import rolling_row_stats

        pdf = pd.DataFrame(
            {
                "g": ["a"] * 5 + ["b"] * 3,
                "t": [1, 2, 3, 4, 5, 1, 2, 3],
                "v": [1.0, 2.0, 4.0, 8.0, 16.0, 10.0, 20.0, 30.0],
            }
        )
        got = (
            rolling_row_stats(spark.createDataFrame(pdf), "v", 3, "t", byvars="g")
            .toPandas()
            .sort_values(["g", "t"])
            .reset_index(drop=True)
        )
        expect = pdf.sort_values(["g", "t"]).reset_index(drop=True)
        roll = expect.groupby("g").v.rolling(3).agg(["mean", "sum"]).reset_index(drop=True)
        pd.testing.assert_series_equal(
            got.v_roll3_avg, roll["mean"].rename("v_roll3_avg"), check_dtype=False
        )
        pd.testing.assert_series_equal(
            got.v_roll3_sum, roll["sum"].rename("v_roll3_sum"), check_dtype=False
        )

    def test_min_periods_one_fills_warmup(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.events import rolling_row_stats

        pdf = pd.DataFrame({"t": [1, 2, 3], "v": [2.0, 4.0, 6.0]})
        got = (
            rolling_row_stats(spark.createDataFrame(pdf), "v", 2, "t", min_periods=1)
            .toPandas()
            .sort_values("t")
        )
        assert got.v_roll2_avg.tolist() == [2.0, 3.0, 5.0]

    def test_validation(self, spark):
        import pandas as pd
        import pytest as _pytest

        from pd_utils_spark.extensions.events import rolling_row_stats

        df = spark.createDataFrame(pd.DataFrame({"t": [1], "v": [1.0]}))
        with _pytest.raises(ValueError, match="n must"):
            rolling_row_stats(df, "v", 0, "t")
        with _pytest.raises(ValueError, match="unsupported"):
            rolling_row_stats(df, "v", 2, "t", stats=("median",))


class TestSessionPaths:
    def test_ordered_paths_counted_across_sessions(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.events import session_paths

        ev = pd.DataFrame(
            {
                "user_id": [1, 1, 1, 1, 2, 2, 2],
                "ts": pd.to_datetime(
                    [
                        "2024-01-01 00:00", "2024-01-01 00:05",
                        "2024-01-01 00:10", "2024-01-01 05:00",  # new session
                        "2024-01-01 00:00", "2024-01-01 00:04",
                        "2024-01-01 00:08",
                    ]
                ),
                "event_type": ["view", "cart", "buy", "view",
                               "view", "cart", "buy"],
                "event_id": [1, 2, 3, 4, 5, 6, 7],
            }
        )
        out = session_paths(
            spark.createDataFrame(ev), n=3, tiebreak="event_id"
        ).collect()
        got = {r.path: (r.n_occurrences, r.n_sessions) for r in out}
        # both users' first sessions follow view>cart>buy; user 1's
        # second session (1 event) contributes nothing
        assert got == {"view>cart>buy": (2, 2)}

    def test_short_sessions_silent(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.events import session_paths

        ev = pd.DataFrame(
            {
                "user_id": [1, 1],
                "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:01"]),
                "event_type": ["a", "b"],
                "event_id": [1, 2],
            }
        )
        assert session_paths(spark.createDataFrame(ev), n=3).count() == 0


class TestSuppressRepeats:
    def test_burst_collapses_to_first(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.events import suppress_repeats

        ev = pd.DataFrame(
            {
                "user_id": [1] * 5 + [2],
                "ts": pd.to_datetime(
                    [
                        "2024-01-01 00:00:00", "2024-01-01 00:00:06",
                        "2024-01-01 00:00:12",  # chain: each within 10s
                        "2024-01-01 00:00:30", "2024-01-01 00:00:31",
                        "2024-01-01 00:00:00",
                    ]
                ),
                "event_id": [1, 2, 3, 4, 5, 6],
            }
        )
        out = sorted(
            r.event_id
            for r in suppress_repeats(
                spark.createDataFrame(ev), "user_id",
                within_seconds=10, tiebreak="event_id",
            ).collect()
        )
        # 2,3 ride the chain from 1; 5 is 1s after 4; user 2 untouched
        assert out == [1, 4, 6]

    def test_no_repeats_noop(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.events import suppress_repeats

        ev = pd.DataFrame(
            {
                "user_id": [1, 1],
                "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 01:00"]),
                "event_id": [1, 2],
            }
        )
        assert suppress_repeats(
            spark.createDataFrame(ev), "user_id", within_seconds=10
        ).count() == 2


class TestEwma:
    def test_pandas_parity_both_adjust_modes(self, spark):
        import numpy as np
        import pandas as pd

        from pd_utils_spark.extensions.events import ewma

        rng = pd.DataFrame(
            {
                "g": [1] * 10 + [2] * 7,
                "i": list(range(10)) + list(range(7)),
                "x": [3.1, -2.0, 5.5, 0.0, 1.25, 9.9, -4.4, 2.2, 7.0, 0.5,
                      1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0],
            }
        )
        df = spark.createDataFrame(rng)
        for adjust in (False, True):
            got = (
                ewma(df, "x", "i", byvars="g", alpha=0.3, adjust=adjust)
                .toPandas()
                .sort_values(["g", "i"])
                .reset_index(drop=True)
            )
            expect = (
                rng.sort_values(["g", "i"])
                .groupby("g")
                .x.transform(lambda s: s.ewm(alpha=0.3, adjust=adjust).mean())
                .reset_index(drop=True)
            )
            assert np.allclose(got.x_ewma, expect, rtol=1e-12, atol=1e-12), adjust

    def test_first_value_seeds_and_validation(self, spark):
        import pandas as pd
        import pytest as _pytest

        from pd_utils_spark.extensions.events import ewma

        df = spark.createDataFrame(
            pd.DataFrame({"g": [1, 1], "i": [0, 1], "x": [10.0, 0.0]})
        )
        out = {r.i: r.x_ewma for r in ewma(df, "x", "i", byvars="g").collect()}
        assert out[0] == 10.0
        assert out[1] == 5.0  # 0.5*10 + 0.5*0
        with _pytest.raises(ValueError, match="alpha"):
            ewma(df, "x", "i", byvars="g", alpha=0.0)


# ----------------------------------------------------- attribution

class TestAttribution:
    import datetime as _dt

    @staticmethod
    def _df(spark):
        import datetime as dt

        T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
        rows = [
            (1, T(0), "view"), (1, T(10), "click"), (1, T(20), "purchase"),
            (1, T(30), "view"), (1, T(40), "purchase"),
            (2, T(0), "click"), (2, T(5), "purchase"),
            (3, T(0), "view"),          # never converts
            (4, T(0), "purchase"),      # converts with no touch
        ]
        return spark.createDataFrame(rows, ["user_id", "ts", "event_type"])

    def _by_channel(self, out):
        return {r.channel: (r.touches, r.conversions, round(r.credit, 6)) for r in out.collect()}

    def test_last_and_first_touch(self, spark):
        from pd_utils_spark.extensions.events import attribution

        df = self._df(spark)
        assert self._by_channel(attribution(df, model="last_touch")) == {
            "click": (2, 2, 2.0), "view": (2, 2, 1.0)
        }
        assert self._by_channel(attribution(df, model="first_touch")) == {
            "click": (2, 2, 1.0), "view": (2, 2, 2.0)
        }

    def test_linear_credit_conserved(self, spark):
        from pd_utils_spark.extensions.events import attribution

        out = self._by_channel(attribution(self._df(spark), model="linear"))
        assert out == {"click": (2, 2, 1.5), "view": (2, 2, 1.5)}
        # total credit = number of attributed conversions (3)
        assert sum(v[2] for v in out.values()) == 3.0

    def test_position_k2_and_k1(self, spark):
        from pd_utils_spark.extensions.events import attribution

        out = self._by_channel(attribution(self._df(spark), model="position"))
        # k=2 conversions split 50/50 after renormalization; k=1 gets 1.0
        assert out["click"] == (2, 2, 1.5)
        assert out["view"] == (2, 2, 1.5)

    def test_position_interior_weights(self, spark):
        import datetime as dt

        from pd_utils_spark.extensions.events import attribution

        T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
        rows = [
            (1, T(0), "a"), (1, T(1), "b"), (1, T(2), "b"), (1, T(3), "c"),
            (1, T(4), "conv"),
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
        out = self._by_channel(attribution(df, conversion="conv", model="position"))
        assert out["a"][2] == pytest.approx(0.4)
        assert out["b"][2] == pytest.approx(0.2)   # two interior touches x 0.1
        assert out["c"][2] == pytest.approx(0.4)

    def test_time_decay_orders_by_recency(self, spark):
        from pd_utils_spark.extensions.events import attribution

        out = attribution(
            self._df(spark), model="time_decay", halflife_seconds=5.0
        )
        got = {r.channel: r.credit for r in out.collect()}
        # recency favors click (10s before conv1) over view (20s before)
        assert got["click"] > got["view"]
        assert got["click"] + got["view"] == pytest.approx(3.0)

    def test_lookback_window(self, spark):
        from pd_utils_spark.extensions.events import attribution

        out = self._by_channel(
            attribution(self._df(spark), model="linear", lookback_seconds=12)
        )
        assert out == {"click": (2, 2, 2.0), "view": (1, 1, 1.0)}

    def test_same_timestamp_conversion_does_not_mask_later(self, spark):
        import datetime as dt

        from pd_utils_spark.extensions.events import attribution

        T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
        rows = [
            (1, T(0), "view"), (1, T(0), "conv"), (1, T(9), "conv"),
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
        out = self._by_channel(attribution(df, conversion="conv", model="linear"))
        # touch tied with a conversion attaches to the STRICTLY later one
        assert out == {"view": (1, 1, 1.0)}

    def test_model_validation(self, spark):
        from pd_utils_spark.extensions.events import attribution

        with pytest.raises(ValueError):
            attribution(self._df(spark), model="shapley")


class TestCooccurrenceLift:
    def test_measures_match_hand_computation(self, spark):
        from pd_utils_spark.extensions.events import cooccurrence_lift

        rows = [(1, "bread"), (1, "butter"), (1, "milk"),
                (2, "bread"), (2, "butter"), (3, "bread"), (4, "milk")]
        df = spark.createDataFrame(rows, ["user_id", "event_type"])
        got = {
            (r.item_a, r.item_b): (r.n_ab, r.support, r.confidence, r.lift)
            for r in cooccurrence_lift(df).collect()
        }
        # bread in 3 of 4 baskets, butter in 2, together in 2
        assert got[("bread", "butter")] == (2, 0.5, 2 / 3, (2 * 4) / (3 * 2))
        assert got[("butter", "bread")][2] == 1.0  # butter always with bread
        assert got[("bread", "milk")][3] == pytest.approx(2 / 3)  # negative assoc

    def test_min_support_and_duplicate_rows(self, spark):
        from pd_utils_spark.extensions.events import cooccurrence_lift

        rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "c")]
        df = spark.createDataFrame(rows, ["user_id", "event_type"])
        out = cooccurrence_lift(df, min_support=2).collect()
        assert out == []  # no pair in >= 2 baskets
        got = {(r.item_a, r.item_b): r.n_ab for r in cooccurrence_lift(df).collect()}
        # duplicate (1, a) rows count once: basket-level distinct
        assert got[("a", "b")] == 1


class TestDiffInDiff:
    def test_textbook_2x2(self, spark):
        from pd_utils_spark.extensions.events import diff_in_diff

        rows = [(0, 0, 10.0), (0, 0, 12.0), (0, 1, 11.0), (0, 1, 13.0),
                (1, 0, 20.0), (1, 0, 22.0), (1, 1, 30.0), (1, 1, 32.0)]
        df = spark.createDataFrame(rows, ["treat", "post", "v"])
        r = diff_in_diff(df, "v", "treat", "post").collect()[0]
        assert r.control_pre == 11.0 and r.control_post == 12.0
        assert r.treated_pre == 21.0 and r.treated_post == 31.0
        assert r.control_diff == 1.0 and r.treated_diff == 10.0
        assert r.did_estimate == 9.0
        assert r.n_treated_post == 2

    def test_null_rows_excluded(self, spark):
        from pd_utils_spark.extensions.events import diff_in_diff

        df = spark.createDataFrame(
            [(0, 0, 1.0), (1, 1, 5.0), (None, 1, 100.0), (1, None, 100.0),
             (1, 1, None)],
            "treat int, post int, v double",
        )
        r = diff_in_diff(df, "v", "treat", "post").collect()[0]
        assert r.control_pre == 1.0 and r.treated_post == 5.0


class TestSeasonalAnomalies:
    def test_spike_flagged_seasonal_shape_absorbed(self, spark):
        import datetime as dt

        from pyspark.sql import functions as F

        from pd_utils_spark.extensions.events import seasonal_anomalies

        rows = []
        for d in range(14):
            for h in range(24):
                v = 100.0 + (50 if h == 12 else 0) + (
                    500 if (d == 10 and h == 3) else 0
                )
                rows.append((dt.datetime(2024, 1, 1 + d, h), v))
        ev = spark.createDataFrame(rows, ["ts", "value"])
        out = seasonal_anomalies(ev, season="hour_of_day", z_threshold=3.0)
        hits = out.filter(F.col("is_anomaly")).collect()
        assert len(hits) == 1
        assert hits[0].slot == 3 and hits[0].bucket_value == 600.0
        # the daily noon bump is part of the seasonal baseline
        assert out.filter((F.col("slot") == 12) & F.col("is_anomaly")).count() == 0

    def test_singleton_slot_never_flagged(self, spark):
        import datetime as dt

        from pyspark.sql import functions as F

        from pd_utils_spark.extensions.events import seasonal_anomalies

        ev = spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, 5), 1e9)], ["ts", "value"]
        )
        out = seasonal_anomalies(ev, season="hour_of_day").collect()
        assert len(out) == 1 and out[0].z is None and not out[0].is_anomaly

    def test_validation(self, spark):
        import datetime as dt

        import pytest as _pt

        from pd_utils_spark.extensions.events import seasonal_anomalies

        ev = spark.createDataFrame(
            [(dt.datetime(2024, 1, 1), 1.0)], ["ts", "value"]
        )
        with _pt.raises(ValueError):
            seasonal_anomalies(ev, season="lunar_phase")


# ----------------------------------------------------- decayed_agg

def test_decayed_agg_matches_reference(spark):
    import datetime as dt
    import math

    import pytest

    from pd_utils_spark.extensions.events import decayed_agg

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u1", t0, 10.0),
        ("u1", t0 + dt.timedelta(hours=1), 20.0),
        ("u2", t0 + dt.timedelta(hours=2), 5.0),
        ("u2", t0 + dt.timedelta(hours=2), None),  # null value ignored
    ]
    df = spark.createDataFrame(rows, ["user", "ts", "v"])
    hl = 3600.0  # 1 hour
    got = {
        r["user"]: (r["decayed_sum"], r["n"])
        for r in decayed_agg(df, "v", "ts", "user", half_life=hl).collect()
    }
    # ref_time = max ts = t0 + 2h
    ref_u1 = 10.0 * 0.5 ** 2 + 20.0 * 0.5 ** 1
    assert got["u1"][0] == pytest.approx(ref_u1, rel=1e-12)
    assert got["u1"][1] == 2
    assert got["u2"][0] == pytest.approx(5.0, rel=1e-12)
    assert got["u2"][1] == 1

    # explicit ref_time shifts every weight by the same factor
    got2 = {
        r["user"]: r["decayed_sum"]
        for r in decayed_agg(
            df, "v", "ts", "user", half_life=hl,
            ref_time=t0 + dt.timedelta(hours=3),
        ).collect()
    }
    assert got2["u1"] == pytest.approx(ref_u1 * 0.5, rel=1e-12)

    with pytest.raises(ValueError, match="half_life"):
        decayed_agg(df, "v", "ts", "user", half_life=0)


class TestEventTransitions:
    def test_hand_computed_probabilities(self, spark):
        import datetime as dt

        from pd_utils_spark.extensions.events import event_transitions

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        # user 1: a -> b -> a -> c ; user 2: a -> b
        for uid, seq in ((1, "abac"), (2, "ab")):
            for i, e in enumerate(seq):
                rows.append((uid, t0 + dt.timedelta(minutes=i), e))
        df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
        got = {
            (r.prev_event, r.event): (r.n, r.prob)
            for r in event_transitions(df).collect()
        }
        # from 'a': 2x a->b, 1x a->c; from 'b': 1x b->a
        assert got[("a", "b")] == (2, pytest.approx(2 / 3))
        assert got[("a", "c")] == (1, pytest.approx(1 / 3))
        assert got[("b", "a")] == (1, pytest.approx(1.0))
        assert ("c", "a") not in got  # 'c' is terminal

    def test_row_normalization_sums_to_one(self, spark):
        import datetime as dt

        from pd_utils_spark.extensions.events import event_transitions

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (u, t0 + dt.timedelta(seconds=i), "xyz"[(u * 7 + i * 3) % 3])
            for u in range(5)
            for i in range(20)
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
        out = event_transitions(df).toPandas()
        sums = out.groupby("prev_event")["prob"].sum()
        assert all(abs(s - 1.0) < 1e-9 for s in sums)


class TestCohortLtv:
    def test_hand_computed_weekly(self, spark):
        import datetime as dt

        from pd_utils_spark.extensions.events import cohort_ltv

        w0 = dt.datetime(2024, 1, 1)  # a Monday
        w1 = w0 + dt.timedelta(weeks=1)
        rows = [
            # cohort w0: users 1, 2
            (1, w0, 10.0), (2, w0 + dt.timedelta(days=2), 20.0),
            (1, w1, 5.0),
            # cohort w1: user 3
            (3, w1 + dt.timedelta(days=1), 7.0),
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
        got = {
            (r.cohort, r.period_number): r
            for r in cohort_ltv(df, period="week").collect()
        }
        r00 = got[(w0, 0)]
        assert r00.cohort_users == 2 and r00.period_value == 30.0
        assert r00.ltv_per_user == pytest.approx(15.0)
        r01 = got[(w0, 1)]
        assert r01.cum_value == 35.0
        assert r01.ltv_per_user == pytest.approx(17.5)
        r10 = got[(w1, 0)]
        assert r10.cohort_users == 1 and r10.cum_value == 7.0

    def test_cum_value_monotone_and_validation(self, spark):
        import datetime as dt

        from pd_utils_spark.extensions.events import cohort_ltv

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (u, t0 + dt.timedelta(days=d), 1.0)
            for u in range(5)
            for d in range(0, 30, 3)
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
        pdf = cohort_ltv(df, period="week").toPandas().sort_values(
            ["cohort", "period_number"]
        )
        for _, g in pdf.groupby("cohort"):
            assert g["cum_value"].is_monotonic_increasing
        with pytest.raises(ValueError, match="period"):
            cohort_ltv(df, period="fortnight")
