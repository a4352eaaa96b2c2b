"""Tests for evaluation metrics (pd_utils_spark/extensions/metrics.py):
confusion counts, precision/recall/F1 null conventions, rank-sum AUC
(incl. tie handling, verified against hand-computed Mann-Whitney), and
the calibration table."""

from __future__ import annotations

import pandas as pd
import pytest

from pd_utils_spark.extensions.metrics import binary_metrics, calibration_table


class TestBinaryMetrics:
    def test_confusion_and_prf(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "y": [1, 1, 0, 0, 1, 0],
                    "s": [0.9, 0.4, 0.8, 0.2, 0.7, 0.1],
                }
            )
        )
        r = binary_metrics(df, "y", "s", threshold=0.5).collect()[0]
        assert (r.tp, r.fp, r.tn, r.fn) == (2, 1, 2, 1)
        assert r.precision == pytest.approx(2 / 3)
        assert r.recall == pytest.approx(2 / 3)
        assert r.f1 == pytest.approx(2 / 3)

    def test_auc_perfect_and_random_and_ties(self, spark):
        perfect = spark.createDataFrame(
            pd.DataFrame({"y": [0, 0, 1, 1], "s": [0.1, 0.2, 0.8, 0.9]})
        )
        assert binary_metrics(perfect, "y", "s").collect()[0].auc == 1.0
        inverted = spark.createDataFrame(
            pd.DataFrame({"y": [1, 1, 0, 0], "s": [0.1, 0.2, 0.8, 0.9]})
        )
        assert binary_metrics(inverted, "y", "s").collect()[0].auc == 0.0
        # all-tied scores -> AUC exactly 0.5 (average ranks)
        tied = spark.createDataFrame(
            pd.DataFrame({"y": [1, 0, 1, 0], "s": [0.5, 0.5, 0.5, 0.5]})
        )
        assert binary_metrics(tied, "y", "s").collect()[0].auc == 0.5
        # hand-computed mixed case with a tie:
        # y: 1 0 1 0, s: 0.9 0.9 0.3 0.1 -> sklearn roc_auc_score = 0.625
        mixed = spark.createDataFrame(
            pd.DataFrame({"y": [1, 0, 1, 0], "s": [0.9, 0.9, 0.3, 0.1]})
        )
        assert binary_metrics(mixed, "y", "s").collect()[0].auc == pytest.approx(0.625)

    def test_degenerate_groups_null_metrics(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"g": ["p", "p", "n"], "y": [1, 1, 0], "s": [0.9, 0.8, 0.1]})
        )
        got = {r.g: r for r in binary_metrics(df, "y", "s", byvars="g").collect()}
        assert got["p"].auc is None  # no negatives
        assert got["n"].auc is None  # no positives
        assert got["n"].recall is None  # no actual positives

    def test_boolean_labels_accepted(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"y": [True, False], "s": [0.9, 0.1]})
        )
        r = binary_metrics(df, "y", "s").collect()[0]
        assert r.tp == 1 and r.tn == 1 and r.auc == 1.0


class TestCalibrationTable:
    def test_bins_and_rates(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "y": [1, 0, 1, 1, 0, 1],
                    "s": [0.05, 0.08, 0.95, 0.92, 0.55, 1.0],
                }
            )
        )
        got = {r.bin: r for r in calibration_table(df, "y", "s", bins=10).collect()}
        assert got[0].n == 2 and got[0].positive_rate == 0.5
        assert got[5].n == 1 and got[5].positive_rate == 0.0
        # s=1.0 clamps into the top bin
        assert got[9].n == 3 and got[9].positive_rate == pytest.approx(1.0)

    def test_bins_validated(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"y": [1], "s": [0.5]}))
        with pytest.raises(ValueError, match="bins"):
            calibration_table(df, "y", "s", bins=0)


class TestRegressionMetrics:
    def test_exact_values(self, spark):
        from pd_utils_spark.extensions.metrics import regression_metrics

        df = spark.createDataFrame(
            pd.DataFrame({"y": [1.0, 2.0, 3.0], "p": [1.0, 2.0, 5.0]})
        )
        r = regression_metrics(df, "y", "p").collect()[0]
        assert r.n == 3
        assert r.mae == pytest.approx(2 / 3)
        assert r.rmse == pytest.approx((4 / 3) ** 0.5)
        # SST = 2, SSE = 4 -> r2 = -1 (worse than the mean predictor)
        assert r.r2 == pytest.approx(-1.0)

    def test_perfect_and_degenerate(self, spark):
        from pd_utils_spark.extensions.metrics import regression_metrics

        perfect = spark.createDataFrame(
            pd.DataFrame({"g": ["a"] * 3, "y": [1.0, 2.0, 3.0], "p": [1.0, 2.0, 3.0]})
        )
        r = regression_metrics(perfect, "y", "p", byvars="g").collect()[0]
        assert r.r2 == pytest.approx(1.0) and r.rmse == 0.0
        const = spark.createDataFrame(
            pd.DataFrame({"y": [5.0, 5.0], "p": [4.0, 6.0]})
        )
        assert regression_metrics(const, "y", "p").collect()[0].r2 is None


class TestNdcg:
    def test_perfect_and_inverted_ranking(self, spark):
        from pd_utils_spark.extensions.metrics import ndcg_at_k

        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "q": [1, 1, 1],
                    "item": [1, 2, 3],
                    "rel": [3, 2, 0],
                    "score": [0.9, 0.5, 0.1],
                }
            )
        )
        assert ndcg_at_k(df, "rel", "score", "q", k=3, tiebreak="item").collect()[0].ndcg == pytest.approx(1.0)
        inv = df.withColumn("score", 1 - df.score)
        got = ndcg_at_k(inv, "rel", "score", "q", k=3, tiebreak="item").collect()[0].ndcg
        # hand-computed: DCG = 0/1 + 3/log2(3) + 7/2, IDCG = 7 + 3/log2(3)
        import math

        dcg = 3 / math.log2(3) + 7 / 2
        idcg = 7 + 3 / math.log2(3)
        assert got == pytest.approx(dcg / idcg)

    def test_no_relevant_items_null(self, spark):
        from pd_utils_spark.extensions.metrics import ndcg_at_k

        df = spark.createDataFrame(
            pd.DataFrame({"q": [1, 1], "item": [1, 2], "rel": [0, 0], "score": [0.9, 0.1]})
        )
        assert ndcg_at_k(df, "rel", "score", "q", tiebreak="item").collect()[0].ndcg is None

    def test_k_truncation(self, spark):
        from pd_utils_spark.extensions.metrics import ndcg_at_k

        # relevant item ranked below k -> DCG 0 -> ndcg 0
        df = spark.createDataFrame(
            pd.DataFrame(
                {"q": [1, 1], "item": [1, 2], "rel": [0, 1], "score": [0.9, 0.1]}
            )
        )
        r = ndcg_at_k(df, "rel", "score", "q", k=1, tiebreak="item").collect()[0]
        assert r.ndcg == 0.0


class TestMulticlassMetrics:
    def test_per_class_confusion_vs_sklearn_math(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.metrics import multiclass_metrics

        d = pd.DataFrame(
            {
                "y":    ["a", "a", "a", "b", "b", "c"],
                "yhat": ["a", "b", "a", "b", "c", "a"],
            }
        )
        out = {r["class"]: r for r in multiclass_metrics(
            spark.createDataFrame(d), "y", "yhat").collect()}
        a = out["a"]
        assert (a.support, a.tp, a.fp, a.fn) == (3, 2, 1, 1)
        assert a.precision == pytest.approx(2 / 3)
        assert a.recall == pytest.approx(2 / 3)
        assert a.f1 == pytest.approx(2 / 3)
        b = out["b"]
        assert (b.support, b.tp, b.fp, b.fn) == (2, 1, 1, 1)
        c = out["c"]
        assert (c.support, c.tp, c.fp, c.fn) == (1, 0, 1, 1)
        assert c.precision == 0.0 and c.recall == 0.0 and c.f1 is None

    def test_class_only_predicted(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.metrics import multiclass_metrics

        d = pd.DataFrame({"y": ["a", "a"], "yhat": ["a", "z"]})
        out = {r["class"]: r for r in multiclass_metrics(
            spark.createDataFrame(d), "y", "yhat").collect()}
        z = out["z"]
        assert z.support == 0 and z.fp == 1
        assert z.recall is None  # never true -> undefined recall


class TestMulticlassSummary:
    def test_macro_micro_hand_computed(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.metrics import multiclass_summary

        d = pd.DataFrame(
            {"y": ["a", "a", "a", "b", "b", "c"],
             "yhat": ["a", "b", "a", "b", "c", "a"]}
        )
        out = {r.avg: r for r in multiclass_summary(
            spark.createDataFrame(d), "y", "yhat").collect()}
        # per-class: a (2/3, 2/3, 2/3), b (1/2, 1/2, 1/2), c (0, 0, f1->0)
        m = out["macro"]
        assert m.accuracy == pytest.approx(0.5)
        assert m.precision == pytest.approx((2/3 + 1/2 + 0) / 3)
        assert m.recall == pytest.approx((2/3 + 1/2 + 0) / 3)
        assert m.f1 == pytest.approx((2/3 + 1/2 + 0) / 3)
        mi = out["micro"]
        # single-label: micro p = r = f1 = accuracy
        assert mi.precision == pytest.approx(0.5)
        assert mi.recall == pytest.approx(0.5)
        assert mi.f1 == pytest.approx(0.5)


# ----------------------------------------------------- uplift_curve

def test_uplift_curve_hand_computed(spark):
    import pytest

    from pd_utils_spark.extensions.metrics import uplift_curve

    # score perfectly separates responders; treated flagged by parity
    rows = []
    for i in range(20):
        score = 20 - i          # descending ranks = i order
        treat = i % 2           # even i treated
        outcome = 1.0 if i < 10 else 0.0
        rows.append((float(score), treat, outcome))
    df = spark.createDataFrame(rows, ["score", "treat", "y"])
    got = {r["bin"]: r for r in uplift_curve(df, "score", "treat", "y", n_bins=2).collect()}
    # bin 0 = top half: 5 treated (i=0..9 even -> 0,2,4,6,8), all respond
    b0 = got[0]
    assert (b0["n_t"], b0["n_c"], b0["r_t"], b0["r_c"]) == (5, 5, 5.0, 5.0)
    assert b0["uplift"] == pytest.approx(0.0)
    b1 = got[1]
    assert (b1["n_t"], b1["n_c"], b1["r_t"], b1["r_c"]) == (10, 10, 5.0, 5.0)
    assert b1["uplift"] == pytest.approx(0.0)


def test_uplift_curve_detects_real_uplift(spark):
    import pytest

    from pd_utils_spark.extensions.metrics import uplift_curve

    # high-score treated respond; controls never do -> uplift = r_t
    rows = []
    for i in range(40):
        treat = i % 2
        score = float(40 - i)
        outcome = 1.0 if (treat == 1 and i < 20) else 0.0
        rows.append((score, treat, outcome))
    df = spark.createDataFrame(rows, ["score", "treat", "y"])
    got = sorted(
        uplift_curve(df, "score", "treat", "y", n_bins=4).collect(),
        key=lambda r: r["bin"],
    )
    assert got[0]["uplift"] == pytest.approx(5.0)   # top quartile: 5 treated responders
    assert got[1]["uplift"] == pytest.approx(10.0)
    assert got[3]["uplift"] == pytest.approx(10.0)  # flat after responders exhausted
    with pytest.raises(ValueError, match="n_bins"):
        uplift_curve(df, "score", "treat", "y", n_bins=0)


class TestLiftTable:
    def test_perfect_score_and_hand_computation(self, spark):
        from pd_utils_spark.extensions.metrics import lift_table

        # 100 rows, scores 100..1 descending, top 20 scores are the
        # positives -> bins 0 and 1 capture everything
        rows = [(float(100 - i), 1 if i < 20 else 0) for i in range(100)]
        df = spark.createDataFrame(rows, ["score", "label"])
        out = {r.bin: r for r in lift_table(df, "score", "label", 10).collect()}
        assert len(out) == 10
        assert all(out[b].n == 10 for b in out)
        assert out[0].positives == 10 and out[1].positives == 10
        assert out[2].positives == 0
        # base rate 0.2 -> per-bin lift 5.0 in the top bins
        assert out[0].lift == pytest.approx(5.0)
        assert out[1].cum_lift == pytest.approx(5.0)
        assert out[1].capture_rate == pytest.approx(1.0)
        assert out[9].capture_rate == pytest.approx(1.0)
        assert out[9].cum_lift == pytest.approx(1.0)

    def test_useless_score_flat_lift(self, spark):
        from pd_utils_spark.extensions.metrics import lift_table

        # label independent of score: every other row positive
        rows = [(float(i), i % 2) for i in range(200)]
        df = spark.createDataFrame(rows, ["score", "label"])
        out = lift_table(df, "score", "label", 4).collect()
        for r in out:
            assert r.lift == pytest.approx(1.0)
            assert r.cum_lift == pytest.approx(1.0)

    def test_validation(self, spark):
        from pd_utils_spark.extensions.metrics import lift_table

        df = spark.createDataFrame([(1.0, 1)], ["score", "label"])
        with pytest.raises(ValueError, match="n_bins"):
            lift_table(df, "score", "label", 0)


class TestIsotonicCalibration:
    @staticmethod
    def _pav_ref(w, v):
        stack = []
        for wi, vi in zip(w, v):
            cw, cv, cn = float(wi), float(vi), 1
            while stack and stack[-1][1] >= cv - 1e-15:
                pw, pv, pn = stack.pop()
                cw, cv, cn = pw + cw, (pw * pv + cw * cv) / (pw + cw), pn + cn
            stack.append((cw, cv, cn))
        out = []
        for cw, cv, cn in stack:
            out += [cv] * cn
        return out

    def test_matches_sequential_pav_and_monotone(self, spark):
        import numpy as np

        from pd_utils_spark.extensions.metrics import isotonic_calibration

        rng = np.random.RandomState(1)
        score = rng.rand(2000)
        p = np.clip(score + 0.3 * np.sin(6 * score), 0, 1)
        y = (rng.rand(2000) < p).astype(int)
        df = spark.createDataFrame(
            [(float(s), int(t)) for s, t in zip(score, y)], ["score", "y"]
        )
        out = (
            isotonic_calibration(df, "score", "y", n_bins=10)
            .toPandas()
            .sort_values("bin")
        )
        cal = out["calibrated"].to_numpy()
        assert (np.diff(cal) >= -1e-12).all()
        ref = self._pav_ref(out["n"].to_numpy(), out["raw_rate"].to_numpy())
        assert np.allclose(cal, ref)
        # calibrated preserves the total positive mass (PAV property)
        assert np.isclose(
            (cal * out["n"].to_numpy()).sum(), out["positives"].sum()
        )

    def test_already_monotone_is_identity(self, spark):
        from pd_utils_spark.extensions.metrics import isotonic_calibration

        rows = []
        for b in range(5):
            for i in range(20):
                rows.append((float(b) + i / 100.0, 1 if i < 4 * b else 0))
        df = spark.createDataFrame(rows, ["score", "y"])
        out = (
            isotonic_calibration(df, "score", "y", n_bins=5)
            .toPandas()
            .sort_values("bin")
        )
        assert (out["calibrated"] == out["raw_rate"]).all()

    def test_validation(self, spark):
        from pd_utils_spark.extensions.metrics import isotonic_calibration

        df = spark.createDataFrame([(1.0, 1)], ["score", "y"])
        with pytest.raises(ValueError, match="n_bins"):
            isotonic_calibration(df, "score", "y", n_bins=1)


class TestAucByGroup:
    def test_matches_sklearn_style_reference(self, spark):
        import numpy as np

        from pd_utils_spark.extensions.metrics import auc_by_group

        rng = np.random.RandomState(8)
        rows = []
        ref = {}
        for g in ("good", "noise", "tied"):
            y = rng.randint(0, 2, 60)
            if g == "good":
                s = y * 2.0 + rng.rand(60)
            elif g == "tied":
                s = np.round(rng.rand(60) * 3) / 3  # heavy ties
            else:
                s = rng.rand(60)
            rows += [(g, float(si), int(yi)) for si, yi in zip(s, y)]

        # rank-sum reference with midranks (scipy-free)
        def auc_ref(y, s):
            import numpy as np

            order = np.argsort(s, kind="mergesort")
            ss, yy = s[order], y[order]
            ranks = np.empty(len(ss))
            i = 0
            while i < len(ss):
                j = i
                while j + 1 < len(ss) and ss[j + 1] == ss[i]:
                    j += 1
                ranks[i:j + 1] = (i + j) / 2 + 1
                i = j + 1
            npos, nneg = yy.sum(), (1 - yy).sum()
            if npos == 0 or nneg == 0:
                return None
            return (ranks[yy == 1].sum() - npos * (npos + 1) / 2) / (
                npos * nneg
            )

        import numpy as np

        df = spark.createDataFrame(rows, ["g", "s", "y"])
        got = {r.g: r for r in auc_by_group(df, "y", "s", "g").collect()}
        data = {}
        for g, s, y in rows:
            data.setdefault(g, ([], []))
            data[g][0].append(s)
            data[g][1].append(y)
        for g, (s, y) in data.items():
            expected = auc_ref(np.array(y), np.array(s))
            assert got[g].auc == pytest.approx(expected, rel=1e-12), g
        assert got["good"].auc > 0.9

    def test_degenerate_group_null(self, spark):
        from pd_utils_spark.extensions.metrics import auc_by_group

        df = spark.createDataFrame(
            [("g", 1.0, 1), ("g", 2.0, 1)], ["g", "s", "y"]
        )
        r = auc_by_group(df, "y", "s", "g").collect()[0]
        assert r.auc is None and r.n_neg == 0


class TestFairnessReport:
    def test_hand_computed_gaps(self, spark):
        from pd_utils_spark.extensions.metrics import fairness_report

        rows = []
        # group A: 10 rows, 6 selected, 4 pos of which 3 predicted
        rows += [("A", 1, 1)] * 3 + [("A", 1, 0)] * 1
        rows += [("A", 0, 1)] * 3 + [("A", 0, 0)] * 3
        # group B: 10 rows, 2 selected, 5 pos of which 1 predicted
        rows += [("B", 1, 1)] * 1 + [("B", 1, 0)] * 4
        rows += [("B", 0, 1)] * 1 + [("B", 0, 0)] * 4
        df = spark.createDataFrame(rows, ["g", "y", "pred"])
        got = {r.g: r for r in fairness_report(df, "g", "y", "pred").collect()}
        assert got["A"].selection_rate == pytest.approx(0.6)
        assert got["B"].selection_rate == pytest.approx(0.2)
        assert got["A"].tpr == pytest.approx(3 / 4)
        assert got["B"].tpr == pytest.approx(1 / 5)
        overall_sel = 8 / 20
        assert got["A"].parity_gap == pytest.approx(0.6 - overall_sel)
        assert got["B"].parity_gap == pytest.approx(0.2 - overall_sel)
        overall_tpr = 4 / 9
        assert got["A"].tpr_gap == pytest.approx(3 / 4 - overall_tpr)

    def test_empty_denominators_null(self, spark):
        from pd_utils_spark.extensions.metrics import fairness_report

        df = spark.createDataFrame(
            [("A", 1, 1), ("A", 1, 0), ("B", 0, 1)], ["g", "y", "pred"]
        )
        got = {r.g: r for r in fairness_report(df, "g", "y", "pred").collect()}
        assert got["A"].fpr is None   # no negatives in A
        assert got["B"].tpr is None   # no positives in B


class TestExpectedCalibrationError:
    def test_perfectly_calibrated_near_zero(self, spark):
        import numpy as np

        from pd_utils_spark.extensions.metrics import (
            expected_calibration_error,
        )

        rng = np.random.RandomState(2)
        s = rng.rand(4000)
        y = (rng.rand(4000) < s).astype(int)
        df = spark.createDataFrame(
            [(int(a), float(b)) for a, b in zip(y, s)], ["y", "s"]
        )
        r = expected_calibration_error(df, "y", "s", bins=10).collect()[0]
        assert r.n == 4000
        assert r.ece < 0.05
        assert r.mce >= r.ece

    def test_hand_computed_overconfident(self, spark):
        from pd_utils_spark.extensions.metrics import (
            expected_calibration_error,
        )

        # all scores 0.95, no positives: one bin, gap = 0.95
        df = spark.createDataFrame([(0, 0.95)] * 20, ["y", "s"])
        r = expected_calibration_error(df, "y", "s", bins=10).collect()[0]
        assert r.ece == pytest.approx(0.95)
        assert r.mce == pytest.approx(0.95)
