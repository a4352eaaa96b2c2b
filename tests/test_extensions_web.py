from __future__ import annotations

import pandas as pd
import pytest

from pd_utils_spark.extensions import web as W


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "read https://News.Example.org/a and https://news.example.org/b today",
                    "mirror at http://cdn.example.net:8080/pkg?v=1#frag",
                    "no links in this one",
                    "spam via http://ads.example.com/track plus https://ok.example.io",
                ],
            }
        )
    )


class TestExtractAndDomains:
    def test_extract_urls(self, docs):
        got = {r.doc_id: r.urls for r in W.extract_urls(docs).collect()}
        assert got[0] == ["https://News.Example.org/a", "https://news.example.org/b"]
        assert got[2] == []

    def test_domain_lowercased_strips_port_path_query(self, docs):
        got = {r.doc_id: (r.n_urls, r.n_domains) for r in W.url_signals(docs).collect()}
        # doc 0: two URLs, one domain after lowercasing
        assert got[0] == (2, 1)
        assert got[1] == (1, 1)
        assert got[2] == (0, 0)
        assert got[3] == (2, 2)


class TestDomainStats:
    def test_counts_and_doc_freq(self, docs):
        got = {r.domain: (r.n_urls, r.doc_freq) for r in W.domain_stats(docs).collect()}
        assert got["news.example.org"] == (2, 1)
        assert got["cdn.example.net"] == (1, 1)
        assert got["ads.example.com"] == (1, 1)


class TestBlocklist:
    def test_list_blocklist_case_insensitive(self, docs):
        kept = sorted(
            r.doc_id
            for r in W.drop_blocklisted_domains(docs, ["ADS.example.com"]).collect()
        )
        assert kept == [0, 1, 2]

    def test_frame_blocklist(self, spark, docs):
        bl = spark.createDataFrame(pd.DataFrame({"domain": ["news.example.org"]}))
        kept = sorted(
            r.doc_id for r in W.drop_blocklisted_domains(docs, bl).collect()
        )
        assert kept == [1, 2, 3]


class TestCanonicalUrl:
    def _canon(self, spark, urls):
        df = spark.createDataFrame(pd.DataFrame({"url": urls}))
        return [r.canonical_url for r in W.canonicalize_urls(df).collect()]

    def test_case_port_fragment_and_tracking(self, spark):
        got = self._canon(
            spark,
            ["HTTPS://Example.COM:443/Path/?utm_source=x&b=2&a=1#frag"],
        )
        # scheme/host lowered, default port dropped, trailing slash and
        # fragment gone, utm_* stripped, remaining params sorted.
        # NOTE the PATH case is preserved — paths are case-sensitive.
        assert got == ["https://example.com/Path?a=1&b=2"]

    def test_http_default_port_and_nondefault_kept(self, spark):
        got = self._canon(
            spark, ["http://a.com:80/x", "http://a.com:8080/x", "https://a.com:80/x"]
        )
        assert got == ["http://a.com/x", "http://a.com:8080/x", "https://a.com:80/x"]

    def test_all_params_tracking_drops_query_entirely(self, spark):
        got = self._canon(spark, ["https://a.com/p?utm_medium=m&gclid=123&ref=home"])
        assert got == ["https://a.com/p"]

    def test_non_url_passes_through(self, spark):
        got = self._canon(spark, ["not a url", "ftp://x.com/y"])
        assert got == ["not a url", "ftp://x.com/y"]

    def test_tracking_link_variants_collapse_to_one_key(self, spark):
        variants = [
            "https://news.site/article?utm_source=tw",
            "https://NEWS.site/article/?fbclid=abc",
            "https://news.site:443/article#comments",
        ]
        assert len(set(self._canon(spark, variants))) == 1


class TestStripHtml:
    def test_blocks_tags_entities_whitespace(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions import web as W

        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": [1],
                    "text": [
                        "<html><head><STYLE>body {x}</STYLE>"
                        "<script type='t'>alert('hi')</script></head>"
                        "<body><!-- c --><p>Hello &amp; welcome to "
                        "&lt;Spark&gt;&nbsp;&quot;world&quot;</p>\n"
                        "<div>second   line</div></body></html>"
                    ],
                }
            )
        )
        out = W.strip_html(df).collect()[0].clean_text
        assert out == 'Hello & welcome to <Spark> "world" second line'

    def test_escaped_entity_stays_escaped_once(self, spark):
        import pandas as pd

        from pd_utils_spark.extensions import web as W

        # '&amp;lt;' is the ESCAPED text '&lt;' — one decode pass must
        # yield the literal '&lt;', not '<'
        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "text": ["x &amp;lt; y"]})
        )
        assert W.strip_html(df).collect()[0].clean_text == "x &lt; y"
