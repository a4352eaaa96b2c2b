from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from pd_utils_spark.extensions import profile as PR


class TestNumericHistogram:
    def test_buckets_edges_and_counts(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"x": [0.0, 1.0, 2.0, 3.0, 4.0, 10.0]})
        )
        got = {
            r.bucket: r for r in PR.numeric_histogram(df, "x", bins=5).collect()
        }
        assert len(got) == 5
        # width 2: [0,2) -> 0,1 ; [2,4) -> 2,3 ; upper edge 10 closes last bucket
        assert got[0]["count"] == 2 and got[1]["count"] == 2
        assert got[4]["count"] == 1  # x=10 lands in last bucket (closed edge)
        assert got[0].bucket_lo == 0.0 and got[4].bucket_hi == 10.0

    def test_explicit_bounds_exclude_outliers(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"x": [1.0, 5.0, 100.0]}))
        got = PR.numeric_histogram(df, "x", bins=2, lo=0.0, hi=10.0).collect()
        assert sum(r["count"] for r in got) == 2  # 100 outside [0, 10]

    def test_nan_and_null_excluded(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"x": [1.0, float("nan"), None, 3.0]})
        )
        got = PR.numeric_histogram(df, "x", bins=2).collect()
        assert sum(r["count"] for r in got) == 2

    def test_empty_buckets_present_and_droppable(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"x": [0.0, 10.0]}))
        full = PR.numeric_histogram(df, "x", bins=10).collect()
        assert len(full) == 10 and sum(r["count"] == 0 for r in full) == 8
        sparse = PR.numeric_histogram(df, "x", bins=10, include_empty=False).collect()
        assert len(sparse) == 2

    def test_bins_validation(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"x": [1.0]}))
        with pytest.raises(ValueError, match="bins"):
            PR.numeric_histogram(df, "x", bins=0)


class TestColumnProfile:
    def test_mixed_types_one_pass(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "a": [1.0, 2.0, None, 4.0],
                    "s": ["x", "y", "y", None],
                }
            )
        )
        got = {r.column: r for r in PR.column_profile(df, ["a", "s"]).collect()}
        assert got["a"].n == 4 and got["a"].n_null == 1 and got["a"].n_distinct == 3
        assert got["a"].min == "1.0" and got["a"].max == "4.0"
        assert math.isclose(got["a"].mean, 7 / 3, rel_tol=1e-9)
        assert got["s"].n_distinct == 2 and got["s"].mean is None


class TestTokenLengthHistogram:
    def test_bucketing_and_totals(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                {"text": ["one two three", "a b", "", " ".join(["w"] * 12)]}
            )
        )
        got = {
            r.bucket_lo: r
            for r in PR.token_length_histogram(df, bucket_size=10).collect()
        }
        assert got[0].n_docs == 3 and got[0].n_tokens_total == 5  # 3 + 2 + 0
        assert got[10].n_docs == 1 and got[10].n_tokens_total == 12


class TestGroupQuantiles:
    def test_exact_interpolated_values(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.profile import group_quantiles

        df = spark.createDataFrame(
            pd.DataFrame({"g": ["a"] * 5, "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
        )
        got = {r.prob: r.value for r in group_quantiles(df, "v", (0.0, 0.5, 1.0), "g").collect()}
        assert got == {0.0: 1.0, 0.5: 3.0, 1.0: 5.0}
        # interpolation between order stats (percentile_cont semantics)
        q = {r.prob: r.value for r in group_quantiles(df, "v", (0.25,), "g").collect()}
        assert q[0.25] == 2.0

    def test_grouped_and_global(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions.profile import group_quantiles

        df = spark.createDataFrame(
            pd.DataFrame({"g": ["a"] * 3 + ["b"] * 3, "v": [1.0, 2.0, 3.0, 10.0, 20.0, 30.0]})
        )
        got = {(r.g, r.prob): r.value for r in group_quantiles(df, "v", (0.5,), "g").collect()}
        assert got == {("a", 0.5): 2.0, ("b", 0.5): 20.0}
        # byvars=None -> one global row per prob
        g = group_quantiles(df, "v", (0.5,)).collect()
        assert len(g) == 1 and g[0].value == 6.5

    def test_approx_within_bound_and_validation(self, spark):
        import pytest as _pytest

        from pd_utils_spark.extensions.profile import group_quantiles

        df = spark.range(10_000).selectExpr("cast(id AS double) AS v")
        exact = group_quantiles(df, "v", (0.5,)).collect()[0].value
        approx = group_quantiles(df, "v", (0.5,), approx=True).collect()[0].value
        assert abs(approx - exact) <= 10_000 / 10_000 * 100  # loose sanity bound
        with _pytest.raises(ValueError, match="probs"):
            group_quantiles(df, "v", (1.5,))


class TestCorrMatrix:
    def test_pairs_and_values(self, spark):
        import numpy as np
        import pandas as pd
        import pytest as _pytest

        from pd_utils_spark.extensions.profile import corr_matrix

        rng = np.random.RandomState(7)
        pdf = pd.DataFrame(
            {
                "x": rng.randn(200),
                "z": rng.randn(200),
            }
        )
        pdf["y"] = 2 * pdf.x + 0.1 * rng.randn(200)  # strongly correlated
        out = {
            (r.col_a, r.col_b): r.corr
            for r in corr_matrix(
                spark.createDataFrame(pdf), ["x", "y", "z"]
            ).collect()
        }
        assert set(out) == {("x", "y"), ("x", "z"), ("y", "z")}
        expect = pdf.corr()
        for (a, b), v in out.items():
            assert v == _pytest.approx(expect.loc[a, b], abs=1e-9)
        with _pytest.raises(ValueError, match="at least 2"):
            corr_matrix(spark.createDataFrame(pdf), ["x"])


class TestBenfordTest:
    def test_benford_distributed_data_passes(self, spark):
        import numpy as np
        rng = np.random.default_rng(3)
        # log-uniform over 4 orders of magnitude follows Benford closely
        vals = np.power(10.0, rng.uniform(0, 4, 20000)).tolist()
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        from pd_utils_spark.extensions import benford_test
        rows = benford_test(df, "v").collect()
        assert [r.digit for r in rows] == list(range(1, 10))
        assert sum(r.n_obs for r in rows) == 20000
        chi2 = sum(r.chi2_contrib for r in rows)
        assert chi2 < 20  # 0.05 critical value is 15.5; loose bound
        # digit-1 share near log10(2)
        assert abs(rows[0].share - 0.30103) < 0.02

    def test_first_digit_extraction_edges(self, spark):
        import pandas as pd
        df = spark.createDataFrame(
            pd.DataFrame({"v": [1000.0, 0.00234, -567.0, 0.0, None, 9.99]})
        )
        from pd_utils_spark.extensions import benford_test
        rows = {r.digit: r.n_obs for r in benford_test(df, "v").collect()}
        # 1000 -> 1 (no floor(log10) pitfall), 0.00234 -> 2, -567 -> 5,
        # 9.99 -> 9; zero and null excluded
        assert rows[1] == 1 and rows[2] == 1 and rows[5] == 1 and rows[9] == 1
        assert sum(rows.values()) == 4

    def test_uniform_digits_fail(self, spark):
        # equal mass on every digit is wildly non-Benford
        vals = [float(d) for d in range(1, 10) for _ in range(100)]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        from pd_utils_spark.extensions import benford_test
        chi2 = sum(r.chi2_contrib for r in benford_test(df, "v").collect())
        assert chi2 > 50


class TestCrosstabChi2:
    def test_matches_scipy_style_computation(self, spark):
        import pandas as pd
        pdf = pd.DataFrame(
            {
                "a": ["x", "x", "x", "y", "y", "y", "y", "x"],
                "b": ["p", "q", "p", "q", "q", "p", "q", "p"],
            }
        )
        from pd_utils_spark.extensions import crosstab_chi2
        out = {(r.a, r.b): r for r in crosstab_chi2(spark.createDataFrame(pdf), "a", "b").collect()}
        ct = pd.crosstab(pdf.a, pdf.b)
        n = ct.to_numpy().sum()
        for (a, b), r in out.items():
            exp = ct.loc[a].sum() * ct[b].sum() / n
            assert r.n == ct.loc[a, b]
            assert r.expected == pytest.approx(exp)
            assert r.chi2_contrib == pytest.approx((ct.loc[a, b] - exp) ** 2 / exp)

    def test_independent_columns_have_small_chi2(self, spark):
        import numpy as np
        rng = np.random.default_rng(4)
        df = spark.createDataFrame(
            [(str(a), str(b)) for a, b in zip(rng.integers(0, 3, 6000), rng.integers(0, 4, 6000))],
            "a string, b string",
        )
        from pd_utils_spark.extensions import crosstab_chi2
        chi2 = sum(r.chi2_contrib for r in crosstab_chi2(df, "a", "b").collect())
        # df = (3-1)(4-1) = 6; 0.999 critical value ~22.5
        assert chi2 < 25

    def test_null_level_participates(self, spark):
        import pandas as pd
        pdf = pd.DataFrame({"a": ["x", None, "x", None], "b": ["p", "p", "q", "q"]})
        from pd_utils_spark.extensions import crosstab_chi2
        rows = crosstab_chi2(spark.createDataFrame(pdf), "a", "b").collect()
        assert len(rows) == 4 and sum(r.n for r in rows) == 4
        assert {r.a for r in rows} == {"x", None}


class TestMutualInformation:
    def test_deterministic_dependence_and_independence(self, spark):
        import math

        import pytest as _pt

        from pd_utils_spark.extensions.profile import mutual_information

        dep = spark.createDataFrame([(i % 4, i % 4) for i in range(100)], ["x", "y"])
        r = mutual_information(dep, "x", "y").collect()[0]
        assert r.mi == _pt.approx(math.log(4), rel=1e-9)
        assert r.nmi == _pt.approx(1.0, rel=1e-9)
        ind = spark.createDataFrame(
            [(i % 4, (i // 4) % 5) for i in range(200)], ["x", "y"]
        )
        r2 = mutual_information(ind, "x", "y").collect()[0]
        assert r2.mi == _pt.approx(0.0, abs=1e-12)

    def test_reference_parity_and_null_level(self, spark):
        import collections
        import math

        import pytest as _pt

        from pd_utils_spark.extensions.profile import mutual_information

        rows = [("a", "p"), ("a", "q"), ("b", "p"), (None, "q"),
                (None, "q"), ("b", None), ("a", "p")]
        df = spark.createDataFrame(rows, "x string, y string")
        r = mutual_information(df, "x", "y").collect()[0]

        def ent(counter, n):
            return -sum(c / n * math.log(c / n) for c in counter.values())

        n = len(rows)
        hx = ent(collections.Counter(x for x, _ in rows), n)
        hy = ent(collections.Counter(y for _, y in rows), n)
        hxy = ent(collections.Counter(rows), n)
        assert r.n == n
        assert r.h_x == _pt.approx(hx, rel=1e-12)
        assert r.h_y == _pt.approx(hy, rel=1e-12)
        assert r.mi == _pt.approx(hx + hy - hxy, rel=1e-9)

    def test_constant_column_null_nmi(self, spark):
        from pd_utils_spark.extensions.profile import mutual_information

        df = spark.createDataFrame([(1, i % 3) for i in range(9)], ["x", "y"])
        r = mutual_information(df, "x", "y").collect()[0]
        assert r.h_x == 0.0 and r.nmi is None


class TestWeightedQuantiles:
    @staticmethod
    def _ref(vals, wts, p):
        # lower weighted quantile: smallest v with cumw >= p * total
        import collections

        agg = collections.defaultdict(float)
        for v, w in zip(vals, wts):
            if w > 0:
                agg[v] += w
        items = sorted(agg.items())
        total = sum(w for _, w in items)
        cum = 0.0
        for v, w in items:
            cum += w
            if cum >= p * total:
                return v
        return items[-1][0]

    def test_matches_reference_and_unit_weight_quantile(self, spark):
        from pd_utils_spark.extensions.profile import weighted_quantiles

        rng = np.random.RandomState(3)
        vals = rng.randint(0, 40, 200).astype(float)
        wts = rng.randint(1, 9, 200).astype(float)
        gs = np.where(rng.rand(200) < 0.5, "a", "b")
        df = spark.createDataFrame(
            [(str(g), float(v), float(w)) for g, v, w in zip(gs, vals, wts)],
            ["g", "v", "w"],
        )
        probs = (0.1, 0.5, 0.9, 1.0)
        got = {
            (r.g, r.prob): r.value
            for r in weighted_quantiles(df, "v", "w", probs, "g").collect()
        }
        for g in ("a", "b"):
            m = gs == g
            for p in probs:
                assert got[(g, p)] == self._ref(vals[m], wts[m], p), (g, p)
        # p = 1.0 is the group max
        assert got[("a", 1.0)] == vals[gs == "a"].max()

    def test_null_and_nonpositive_weights_dropped(self, spark):
        from pd_utils_spark.extensions.profile import weighted_quantiles

        df = spark.createDataFrame(
            [("g", 1.0, 0.0), ("g", 2.0, 1.0), ("g", 99.0, -5.0),
             ("g", 98.0, None), ("g", None, 1.0)],
            ["g", "v", "w"],
        )
        out = weighted_quantiles(df, "v", "w", (0.5,), "g").collect()
        assert len(out) == 1 and out[0].value == 2.0

    def test_validation(self, spark):
        from pd_utils_spark.extensions.profile import weighted_quantiles

        df = spark.createDataFrame([("g", 1.0, 1.0)], ["g", "v", "w"])
        with pytest.raises(ValueError, match="probs"):
            weighted_quantiles(df, "v", "w", (), "g")
        with pytest.raises(ValueError, match="probs"):
            weighted_quantiles(df, "v", "w", (0.0,), "g")


class TestCramersV:
    def test_perfect_association_and_independence(self, spark):
        from pd_utils_spark.extensions.profile import cramers_v

        # perfect: col determined by row -> V = 1
        rows = [(r, r) for r in ("a", "b", "c") for _ in range(10)]
        df = spark.createDataFrame(rows, ["r", "c"])
        v1 = cramers_v(df, "r", "c").collect()[0]
        assert v1.v == pytest.approx(1.0)
        # independence: uniform product table -> chi2 = 0, V = 0
        rows2 = [(r, c) for r in ("a", "b") for c in ("x", "y") for _ in range(5)]
        df2 = spark.createDataFrame(rows2, ["r", "c"])
        v2 = cramers_v(df2, "r", "c").collect()[0]
        assert v2.v == pytest.approx(0.0, abs=1e-12)
        assert v2.chi2 == pytest.approx(0.0, abs=1e-12)

    def test_single_level_null(self, spark):
        from pd_utils_spark.extensions.profile import cramers_v

        df = spark.createDataFrame(
            [("a", "x"), ("a", "y")], ["r", "c"]
        )
        assert cramers_v(df, "r", "c").collect()[0].v is None
