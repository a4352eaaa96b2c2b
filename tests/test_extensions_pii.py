from __future__ import annotations

import pandas as pd
import pytest

from pd_utils_spark.extensions import pii as P


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3, 4],
                "text": [
                    "mail me at alice.smith+x@example.co.uk today",
                    "ssn 123-45-6789 and phone 555-867-5309",
                    "server at 192.168.0.1 and 10.0.0.255",
                    "clean document with no identifiers at all",
                    "dotted phone 555.867.5309 is not an ip",
                ],
            }
        )
    )


class TestSignals:
    def test_counts_per_kind(self, docs):
        got = {r.doc_id: r for r in P.pii_signals(docs).collect()}
        assert got[0].n_email == 1 and got[0].n_pii_total == 1
        assert got[1].n_ssn == 1 and got[1].n_phone == 1
        assert got[2].n_ipv4 == 2
        assert got[3].n_pii_total == 0
        assert got[4].n_phone == 1 and got[4].n_ipv4 == 0

    def test_kind_subset(self, docs):
        out = P.pii_signals(docs, kinds=["email"])
        assert set(out.columns) == set(docs.columns) | {"n_email", "n_pii_total"}


class TestRedact:
    def test_typed_placeholders(self, docs):
        got = {r.doc_id: r.text for r in P.redact_pii(docs).collect()}
        assert got[0] == "mail me at <EMAIL> today"
        assert got[1] == "ssn <SSN> and phone <PHONE>"
        assert got[2] == "server at <IP> and <IP>"
        assert got[3] == "clean document with no identifiers at all"

    def test_ssn_not_matched_inside_phone(self, docs):
        got = {r.doc_id: r.text for r in P.redact_pii(docs).collect()}
        assert got[4] == "dotted phone <PHONE> is not an ip"

    def test_out_column_and_custom_replacement(self, docs):
        out = P.redact_pii(
            docs, out="scrubbed", replacements={"email": "[removed]"}
        )
        row = out.filter("doc_id = 0").collect()[0]
        assert "[removed]" in row.scrubbed and "@" not in row.scrubbed
        assert "@" in row.text  # original untouched


class TestDrop:
    def test_any_hit_drops_by_default(self, docs):
        kept = sorted(r.doc_id for r in P.drop_pii_documents(docs).collect())
        assert kept == [3]

    def test_max_hits_threshold(self, docs):
        kept = sorted(
            r.doc_id for r in P.drop_pii_documents(docs, max_hits=1).collect()
        )
        assert kept == [0, 3, 4]


class TestKAnonymity:
    def test_hand_computed(self, spark):
        # groups: (a,x)=3 rows, (a,y)=1, (b,x)=2 -> k=2: one violating
        # group with 1 row
        df = spark.createDataFrame(
            [("a", "x")] * 3 + [("a", "y")] + [("b", "x")] * 2,
            ["q1", "q2"],
        )
        r = P.k_anonymity_report(df, ["q1", "q2"], k=2).collect()[0]
        assert r.n_rows == 6 and r.n_groups == 3
        assert r.min_group_size == 1
        assert r.n_violating_groups == 1 and r.n_violating_rows == 1
        assert r.violating_row_frac == pytest.approx(1 / 6)

    def test_null_quasi_identifier_is_a_level(self, spark):
        df = spark.createDataFrame(
            [("a",), (None,), (None,)], ["q1"]
        )
        r = P.k_anonymity_report(df, "q1", k=2).collect()[0]
        # null group has 2 rows (safe at k=2); 'a' violates
        assert r.n_groups == 2
        assert r.n_violating_groups == 1 and r.n_violating_rows == 1

    def test_all_safe_and_validation(self, spark):
        df = spark.createDataFrame([("a",)] * 10, ["q1"])
        r = P.k_anonymity_report(df, "q1", k=5).collect()[0]
        assert r.n_violating_groups == 0
        assert r.violating_row_frac == 0.0
        with pytest.raises(ValueError, match="k must"):
            P.k_anonymity_report(df, "q1", k=0)
