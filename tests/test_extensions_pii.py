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
