"""Streaming-module tests: batch semantics of the window operators
plus a REAL Structured Streaming run (file source -> watermark ->
tumbling window -> memory sink)."""

from __future__ import annotations

import json
import shutil
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pd_utils_spark import streaming as W

EVENTS = pd.DataFrame(
    {
        "ts": pd.to_datetime(
            [
                "2024-01-01 00:05:00",
                "2024-01-01 00:20:00",
                "2024-01-01 00:50:00",
                "2024-01-01 02:00:00",  # new session for u1 (gap > 30m)
                "2024-01-01 00:10:00",
            ]
        ),
        "user_id": [1, 1, 1, 1, 2],
        "event_type": ["view", "view", "click", "view", "view"],
        "value": [1.0, 2.0, 3.0, 4.0, 10.0],
        "props": ['{"k": 1}', '{"k": 2}', '{"k": 3}', '{"k": 4}', '{"k": 5}'],
    }
)


@pytest.fixture()
def events(spark):
    return spark.createDataFrame(EVENTS)


class TestBatchWindows:
    def test_tumbling(self, events):
        out = W.tumbling_window_agg(
            events, "ts", "1 hour", keys="event_type", aggs={"value": "sum"}
        ).toPandas()
        views_h0 = out[
            (out.event_type == "view")
            & (out.window_start == pd.Timestamp("2024-01-01 00:00:00"))
        ]
        assert views_h0.value_sum.iloc[0] == 13.0  # 1+2+10
        assert set(out.columns) == {"window_start", "window_end", "event_type", "value_sum"}

    def test_sliding_doubles_membership(self, events):
        out = W.sliding_window_agg(
            events, "ts", "1 hour", "30 minutes", aggs={"value": "count"}
        ).toPandas()
        # each event appears in exactly 2 windows
        assert out.value_count.sum() == 2 * len(EVENTS)

    def test_session_windows(self, events):
        out = W.session_window_agg(
            events, "ts", "30 minutes", keys="user_id", aggs={"value": "sum"}
        ).toPandas()
        u1 = out[out.user_id == 1].sort_values("session_start")
        # u1: 00:05/00:20/00:50 chain into ONE session — an event at
        # exactly prev+gap still merges (Spark's boundary is
        # inclusive); 02:00 starts a new session
        assert len(u1) == 2
        assert u1.value_sum.tolist() == [6.0, 4.0]
        # session_end = last event + gap
        assert u1.session_end.iloc[0] == pd.Timestamp("2024-01-01 01:20:00")

    def test_extract_json_props(self, events):
        out = W.extract_json_props(events, "props", {"k": "int"}).toPandas()
        assert out.k.tolist() == [1, 2, 3, 4, 5]


class TestStatefulStreaming:
    def test_running_agg_state_across_batches(self, spark):
        import time

        from pyspark.sql.types import DoubleType, LongType, StructField, StructType

        src = tempfile.mkdtemp(prefix="state_src_")
        try:
            schema = StructType(
                [StructField("user_id", LongType()), StructField("value", DoubleType())]
            )
            with open(f"{src}/b1.json", "w") as f:
                f.write('{"user_id": 1, "value": 10.0}\n{"user_id": 1, "value": 20.0}\n')
            stream = (
                spark.readStream.format("json")
                .schema(schema)
                .option("maxFilesPerTrigger", 1)
                .load(src)
            )
            out = W.stateful_running_agg(stream, "user_id", "value")
            q = (
                out.writeStream.format("memory")
                .queryName("state_test")
                .outputMode("update")
                .trigger(processingTime="1 second")
                .start()
            )
            try:
                deadline = time.time() + 60
                while time.time() < deadline:
                    rows = spark.sql(
                        "SELECT running_sum FROM state_test WHERE user_id = 1"
                    ).collect()
                    if rows:
                        break
                    time.sleep(1)
                assert rows and rows[0].running_sum == 30.0
                with open(f"{src}/b2.json", "w") as f:
                    f.write('{"user_id": 1, "value": 30.0}\n')
                while time.time() < deadline:
                    rows = spark.sql(
                        "SELECT max(running_sum) AS s FROM state_test WHERE user_id = 1"
                    ).collect()
                    if rows and rows[0].s == 60.0:
                        break
                    time.sleep(1)
                # state carried across micro-batches: 10+20 then +30
                assert rows[0].s == 60.0
            finally:
                q.stop()
        finally:
            shutil.rmtree(src, ignore_errors=True)

    def test_running_agg_with_ttl_runs(self, spark):
        """ProcessingTimeTimeout mode must actually run (it previously
        lacked the setTimeoutDuration call that mode requires) and
        produce the same totals while batches stay within the TTL."""
        import time

        from pyspark.sql.types import DoubleType, LongType, StructField, StructType

        src = tempfile.mkdtemp(prefix="state_ttl_src_")
        try:
            schema = StructType(
                [StructField("user_id", LongType()), StructField("value", DoubleType())]
            )
            with open(f"{src}/b1.json", "w") as f:
                f.write('{"user_id": 7, "value": 5.0}\n{"user_id": 7, "value": 7.0}\n')
            stream = (
                spark.readStream.format("json").schema(schema).load(src)
            )
            out = W.stateful_running_agg(
                stream, "user_id", "value",
                timeout="ProcessingTimeTimeout", timeout_duration_ms=60_000,
            )
            q = (
                out.writeStream.format("memory")
                .queryName("state_ttl_test")
                .outputMode("update")
                .trigger(processingTime="1 second")
                .start()
            )
            try:
                deadline = time.time() + 60
                rows = []
                while time.time() < deadline:
                    rows = spark.sql(
                        "SELECT running_sum FROM state_ttl_test WHERE user_id = 7"
                    ).collect()
                    if rows:
                        break
                    time.sleep(1)
                assert rows and rows[0].running_sum == 12.0
            finally:
                q.stop()
        finally:
            shutil.rmtree(src, ignore_errors=True)


class TestStreamingSessionize:
    def test_labels_match_batch_and_state_spans_batches(self, spark):
        """Row-level session labels on a stream must equal the batch
        sessionize labels on the same (in-order) events — including a
        session boundary that falls BETWEEN micro-batches, which only
        works if (last_ts, session_index) survives in the state store."""
        import time

        from pyspark.sql.types import LongType

        from pd_utils_spark.extensions import events as EV

        src = tempfile.mkdtemp(prefix="sess_src_")
        try:
            schema = StructType(
                [
                    StructField("user_id", LongType()),
                    StructField("ts", TimestampType()),
                    StructField("event_id", LongType()),
                ]
            )
            b1 = [
                {"user_id": 1, "ts": "2024-01-01T00:00:00", "event_id": 1},
                {"user_id": 1, "ts": "2024-01-01T00:10:00", "event_id": 2},
                {"user_id": 2, "ts": "2024-01-01T00:00:00", "event_id": 3},
            ]
            # 2h after batch 1 -> boundary BETWEEN batches for user 1
            b2 = [
                {"user_id": 1, "ts": "2024-01-01T02:10:00", "event_id": 4},
                {"user_id": 2, "ts": "2024-01-01T00:20:00", "event_id": 5},
            ]
            with open(f"{src}/b1.json", "w") as f:
                f.write("\n".join(json.dumps(r) for r in b1))
            stream = (
                spark.readStream.format("json")
                .schema(schema)
                .option("maxFilesPerTrigger", 1)
                .load(src)
            )
            out = W.streaming_sessionize(
                stream, "user_id", "ts", gap_seconds=1800, tiebreak="event_id"
            )
            q = (
                out.writeStream.format("memory")
                .queryName("sess_test")
                .outputMode("append")
                .trigger(processingTime="1 second")
                .start()
            )
            try:
                deadline = time.time() + 60
                while time.time() < deadline:
                    if spark.sql("SELECT * FROM sess_test").count() >= 3:
                        break
                    time.sleep(1)
                with open(f"{src}/b2.json", "w") as f:
                    f.write("\n".join(json.dumps(r) for r in b2))
                while time.time() < deadline:
                    if spark.sql("SELECT * FROM sess_test").count() >= 5:
                        break
                    time.sleep(1)
                got = {
                    r.event_id: r.session_index
                    for r in spark.sql("SELECT * FROM sess_test").collect()
                }
            finally:
                q.stop()
            # batch twin over the full event set
            all_rows = pd.DataFrame(b1 + b2)
            all_rows["ts"] = pd.to_datetime(all_rows["ts"])
            batch = EV.sessionize(
                spark.createDataFrame(all_rows),
                "user_id",
                "ts",
                gap_seconds=1800,
                tiebreak="event_id",
            )
            expect = {r.event_id: r.session_index for r in batch.collect()}
            assert got == expect
            # and the cross-batch boundary actually produced session 2
            assert got[4] == 2
        finally:
            shutil.rmtree(src, ignore_errors=True)


class TestStreamingSessionizeChunked:
    def test_key_larger_than_one_arrow_chunk_labels_correctly(self, spark):
        """applyInPandasWithState splits big groups across Arrow chunks
        with no global order; the labeler must concat+sort the whole
        iterator before labeling. Force tiny chunks (maxRecordsPerBatch=8)
        and feed 40 reverse-ordered rows for ONE key in ONE micro-batch —
        per-chunk sorting would mislabel; whole-group sorting matches the
        batch sessionize twin."""
        import time

        from pyspark.sql.types import LongType

        from pd_utils_spark.extensions import events as EV

        src = tempfile.mkdtemp(prefix="sess_chunk_")
        prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "8")
        try:
            schema = StructType(
                [
                    StructField("user_id", LongType()),
                    StructField("ts", TimestampType()),
                    StructField("event_id", LongType()),
                ]
            )
            # 40 events, 10-minute strides with a >30m session break
            # every 4th event; written in REVERSE time order so chunk
            # boundaries see out-of-order timestamps.
            base = pd.Timestamp("2024-01-01")
            rows = []
            t = base
            for i in range(40):
                t = t + pd.Timedelta(minutes=50 if i % 4 == 0 else 10)
                rows.append({"user_id": 1, "ts": t.isoformat(), "event_id": i})
            with open(f"{src}/b1.json", "w") as f:
                f.write("\n".join(json.dumps(r) for r in reversed(rows)))
            stream = (
                spark.readStream.format("json").schema(schema).load(src)
            )
            out = W.streaming_sessionize(
                stream, "user_id", "ts", gap_seconds=1800, tiebreak="event_id"
            )
            q = (
                out.writeStream.format("memory")
                .queryName("sess_chunk")
                .outputMode("append")
                .trigger(processingTime="1 second")
                .start()
            )
            try:
                deadline = time.time() + 60
                while time.time() < deadline:
                    if spark.sql("SELECT * FROM sess_chunk").count() >= 40:
                        break
                    time.sleep(1)
                got = {
                    r.event_id: r.session_index
                    for r in spark.sql("SELECT * FROM sess_chunk").collect()
                }
            finally:
                q.stop()
            pdf = pd.DataFrame(rows)
            pdf["ts"] = pd.to_datetime(pdf["ts"])
            batch = EV.sessionize(
                spark.createDataFrame(pdf),
                "user_id",
                "ts",
                gap_seconds=1800,
                tiebreak="event_id",
            )
            expect = {r.event_id: r.session_index for r in batch.collect()}
            assert got == expect
            assert max(got.values()) == 10  # 10 sessions, not 1
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
            else:
                spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
            shutil.rmtree(src, ignore_errors=True)


class TestStreamingSessionizeTTL:
    def test_idle_user_state_evicted_and_renumbered(self, spark):
        """With state_ttl_seconds set, a user idle past the TTL is
        evicted (by a later batch containing OTHER users' data) and
        restarts at session 1 on return — even when the return event
        is within gap_seconds of their last event, proving the state
        really was dropped rather than continued."""
        import time

        from pyspark.sql.types import LongType

        src = tempfile.mkdtemp(prefix="sess_ttl_")
        try:
            schema = StructType(
                [
                    StructField("user_id", LongType()),
                    StructField("ts", TimestampType()),
                    StructField("event_id", LongType()),
                ]
            )
            stream = (
                spark.readStream.format("json")
                .schema(schema)
                .option("maxFilesPerTrigger", 1)
                .load(src)
            )
            out = W.streaming_sessionize(
                stream, "user_id", "ts", gap_seconds=3600,
                tiebreak="event_id", state_ttl_seconds=3,
            )
            q = (
                out.writeStream.format("memory")
                .queryName("sess_ttl")
                .outputMode("append")
                .trigger(processingTime="1 second")
                .start()
            )

            def write_batch(name, rows):
                with open(f"{src}/{name}.json", "w") as f:
                    f.write("\n".join(json.dumps(r) for r in rows))

            def wait_rows(n, deadline):
                while time.time() < deadline:
                    if spark.sql("SELECT * FROM sess_ttl").count() >= n:
                        return
                    time.sleep(0.5)

            try:
                deadline = time.time() + 120
                # b1: user 1 reaches SESSION 2 (2h gap between events)
                write_batch("b1", [
                    {"user_id": 1, "ts": "2024-01-01T00:00:00", "event_id": 1},
                    {"user_id": 1, "ts": "2024-01-01T02:00:00", "event_id": 2},
                ])
                wait_rows(2, deadline)
                time.sleep(5)  # let user 1's state pass the 3s TTL
                # b2: only user 2 — triggers user 1's timeout eviction
                write_batch("b2", [
                    {"user_id": 2, "ts": "2024-01-01T00:00:30", "event_id": 3},
                ])
                wait_rows(3, deadline)
                time.sleep(2)  # give the eviction batch time to commit
                # b3: user 1 returns at 02:10 — within gap_seconds of
                # their 02:00 event, so SURVIVING state would label it
                # session 2 (continuation); evicted state restarts at 1.
                write_batch("b3", [
                    {"user_id": 1, "ts": "2024-01-01T02:10:00", "event_id": 4},
                ])
                wait_rows(4, deadline)
                got = {
                    r.event_id: r.session_index
                    for r in spark.sql("SELECT * FROM sess_ttl").collect()
                }
            finally:
                q.stop()
            assert got[1] == 1 and got[2] == 2 and got[3] == 1
            # the distinguishing assertion: state was evicted, so the
            # within-gap return restarts numbering at 1 (a surviving
            # state would have labeled it 2)
            assert got[4] == 1
        finally:
            shutil.rmtree(src, ignore_errors=True)


class TestStreamingGreedyBandDedup:
    def test_batch_equals_stream_and_history_drops(self, spark):
        """Batch≡stream for the multi-band greedy rule: two
        micro-batches through foreachBatch give exactly the survivors
        of applying dedup_bands_greedy to batch 1, then batch 2
        filtered by batch-1 claims + within-batch greedy — and a
        batch-2 near-dup of a batch-1 survivor drops via the claims
        table."""
        import os
        import time

        from pyspark.sql.types import LongType, StringType

        from pd_utils_spark.extensions.dedup import (
            attach_minhash_band_keys,
            dedup_bands_greedy,
        )

        base = tempfile.mkdtemp(prefix="mb_stream_")
        src, outd, hist, ckpt = (
            f"{base}/{d}" for d in ("src", "out", "hist", "ckpt")
        )
        os.makedirs(src)
        try:
            schema = StructType(
                [StructField("doc_id", LongType()), StructField("text", StringType())]
            )
            b1 = [
                {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog today"},
                {"doc_id": 2, "text": "the quick brown fox jumps over the lazy dog today"},
                {"doc_id": 3, "text": "completely different first batch content here now"},
            ]
            b2 = [
                {"doc_id": 10, "text": "the quick brown fox jumps over the lazy dog today"},
                {"doc_id": 11, "text": "brand new second batch content sharing nothing at all"},
            ]
            with open(f"{src}/b1.json", "w") as f:
                f.write("\n".join(json.dumps(r) for r in b1))
            stream = (
                spark.readStream.format("json")
                .schema(schema)
                .option("maxFilesPerTrigger", 1)
                .load(src)
            )
            q = W.streaming_greedy_band_dedup(
                stream, outd, hist, ckpt, k=3, rows_per_band=3, bands=2
            )
            try:
                deadline = time.time() + 90

                def ids():
                    try:
                        return sorted(
                            r.doc_id for r in spark.read.parquet(outd).collect()
                        )
                    except Exception:
                        return []

                while time.time() < deadline and len(ids()) < 2:
                    time.sleep(1)
                # batch twin on batch 1 alone
                b1df = spark.createDataFrame(
                    [(r["doc_id"], r["text"]) for r in b1], ["doc_id", "text"]
                )
                want1 = sorted(
                    r.doc_id for r in dedup_bands_greedy(b1df, bands=2).collect()
                )
                assert ids() == want1 == [1, 3]
                with open(f"{src}/b2.json", "w") as f:
                    f.write("\n".join(json.dumps(r) for r in b2))
                while time.time() < deadline and len(ids()) < 3:
                    time.sleep(1)
                # replay batch 2 relationally: drop docs holding any
                # claimed (band, key), then within-batch greedy
                b2df = spark.createDataFrame(
                    [(r["doc_id"], r["text"]) for r in b2], ["doc_id", "text"]
                )
                claims = (
                    attach_minhash_band_keys(b1df, bands=2, out="__bks__")
                    .filter(F.col("doc_id").isin(want1))
                    .select(F.posexplode("__bks__").alias("band", "key"))
                )
                keyed2 = attach_minhash_band_keys(b2df, bands=2, out="__bks__")
                hit = (
                    keyed2.select(
                        "doc_id", F.posexplode("__bks__").alias("band", "key")
                    )
                    .join(claims, ["band", "key"], "left_semi")
                    .select("doc_id")
                    .distinct()
                )
                kept2 = b2df.join(hit, "doc_id", "left_anti")
                want2 = sorted(
                    r.doc_id for r in dedup_bands_greedy(kept2, bands=2).collect()
                )
                assert ids() == want1 + want2 == [1, 3, 11]
            finally:
                q.stop()
        finally:
            shutil.rmtree(base, ignore_errors=True)


    def test_three_batch_stream_matches_pure_python_replay(self, spark):
        """r8 (judge #4): the multi-batch property — three
        micro-batches through the real engine give exactly the
        survivors of the pure-Python cross-batch replay
        (scripts.fuzz_dedup_reference.ref_greedy_bands_stream: greedy
        min-id within a batch, first-claim-wins across batches),
        including the documented boundary semantics: a LATER batch's
        LOWER-id copy loses to an earlier batch's claim."""
        import os
        import time

        from pyspark.sql.types import LongType, StringType

        from scripts.fuzz_dedup_reference import ref_greedy_bands_stream

        template = "the quick brown fox jumps over the lazy dog today"
        unique2 = "second batch unique content delta epsilon zeta"
        batches = [
            {5: template, 6: "unique first batch doc alpha beta gamma"},
            {1: template, 7: unique2},  # doc 1: lower id, must LOSE
            {0: template, 3: unique2, 8: "third batch fresh words eta theta iota"},
        ]
        want = ref_greedy_bands_stream(batches, k=3, rows_per_band=3, bands=2)
        assert want == [5, 6, 7, 8]  # 0, 1, 3 all claimed away
        cumulative = []
        counts = []
        for b in batches:
            alive = [i for i in want if i in b]
            cumulative.extend(alive)
            counts.append(len(cumulative))

        base = tempfile.mkdtemp(prefix="mb3_stream_")
        src, outd, hist, ckpt = (
            f"{base}/{d}" for d in ("src", "out", "hist", "ckpt")
        )
        os.makedirs(src)
        try:
            schema = StructType(
                [StructField("doc_id", LongType()), StructField("text", StringType())]
            )
            stream = (
                spark.readStream.format("json")
                .schema(schema)
                .option("maxFilesPerTrigger", 1)
                .load(src)
            )

            def ids():
                try:
                    return sorted(
                        r.doc_id for r in spark.read.parquet(outd).collect()
                    )
                except Exception:
                    return []

            deadline = time.time() + 120
            with open(f"{src}/b0.json", "w") as f:
                f.write(
                    "\n".join(
                        json.dumps({"doc_id": i, "text": t})
                        for i, t in batches[0].items()
                    )
                )
            q = W.streaming_greedy_band_dedup(
                stream, outd, hist, ckpt, k=3, rows_per_band=3, bands=2
            )
            try:
                for bi, n_expect in enumerate(counts):
                    if bi > 0:
                        with open(f"{src}/b{bi}.json", "w") as f:
                            f.write(
                                "\n".join(
                                    json.dumps({"doc_id": i, "text": t})
                                    for i, t in batches[bi].items()
                                )
                            )
                    while time.time() < deadline and len(ids()) < n_expect:
                        time.sleep(1)
                    assert sorted(ids()) == sorted(cumulative[:n_expect])
                assert sorted(ids()) == sorted(want)
                assert 1 not in ids() and 5 in ids()  # first-claim-wins
            finally:
                q.stop()
        finally:
            shutil.rmtree(base, ignore_errors=True)


class TestStreamingMinhashDedup:
    def test_near_dups_dropped_within_and_across_batches(self, spark):
        """foreachBatch near-dup dedup: batch 1's internal near-dup pair
        keeps one survivor; batch 2's near-dup OF A BATCH-1 DOC drops
        (history round-trip), while batch 2's novel doc survives."""
        import time

        from pyspark.sql.types import LongType, StringType

        base = tempfile.mkdtemp(prefix="mh_stream_")
        src, outd, hist, ckpt = (f"{base}/{d}" for d in ("src", "out", "hist", "ckpt"))
        import os

        os.makedirs(src)
        try:
            schema = StructType(
                [StructField("doc_id", LongType()), StructField("text", StringType())]
            )
            b1 = [
                {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog today"},
                {"doc_id": 2, "text": "the quick brown fox jumps over the lazy dog today"},
                {"doc_id": 3, "text": "completely different first batch content here now"},
            ]
            b2 = [
                # near-dup of doc 1 (one word changed) -> must drop
                {"doc_id": 10, "text": "the quick brown fox jumps over the lazy cat today"},
                {"doc_id": 11, "text": "brand new second batch content sharing nothing at all"},
            ]
            with open(f"{src}/b1.json", "w") as f:
                f.write("\n".join(json.dumps(r) for r in b1))
            stream = (
                spark.readStream.format("json")
                .schema(schema)
                .option("maxFilesPerTrigger", 1)
                .load(src)
            )
            q = W.streaming_minhash_dedup(
                stream, outd, hist, ckpt, k=3, num_hashes=12, bands=6, threshold=0.5
            )
            try:
                deadline = time.time() + 90
                def ids():
                    try:
                        return sorted(
                            r.doc_id for r in spark.read.parquet(outd).collect()
                        )
                    except Exception:
                        return []
                while time.time() < deadline and len(ids()) < 2:
                    time.sleep(1)
                assert ids() == [1, 3]  # within-batch near-dup 2 dropped
                with open(f"{src}/b2.json", "w") as f:
                    f.write("\n".join(json.dumps(r) for r in b2))
                while time.time() < deadline and len(ids()) < 3:
                    time.sleep(1)
                assert ids() == [1, 3, 11]  # 10 dropped vs history, 11 kept
                # r9 state layout: per-batch COMMITTED artifact deltas
                for sub in ("keys", "shingles", "docs"):
                    for b in (0, 1):
                        assert os.path.exists(
                            f"{hist}/{sub}/b={b}/_SUCCESS"
                        ), f"{sub}/b={b} not committed"
                docs = spark.read.parquet(
                    f"{hist}/docs/b=0", f"{hist}/docs/b=1"
                )
                assert sorted(r.doc_id for r in docs.collect()) == [1, 3, 11]
            finally:
                q.stop()
            # compaction folds the deltas BELOW the newest (b=1 stays:
            # its batch could replay after a crash and reads strictly
            # below its own id, so it must never be folded into a
            # generation that replay cannot see); a restarted stream
            # probes compacted + newest-delta state identically
            from pd_utils_spark.streaming.stateful import (
                compact_minhash_state,
            )

            assert compact_minhash_state(spark, hist) == 0
            assert os.path.exists(f"{hist}/keys/c=0/_SUCCESS")
            assert not os.path.exists(f"{hist}/keys/b=0")
            assert os.path.exists(f"{hist}/keys/b=1/_SUCCESS")
            assert compact_minhash_state(spark, hist) == 0  # no-op
            b3 = [
                # near-dup of doc 3 (one word changed) -> must drop
                # against the COMPACTED state
                {"doc_id": 20, "text": "completely different first batch content here soon"},
                {"doc_id": 21, "text": "yet another wholly novel third batch payload arrives"},
            ]
            with open(f"{src}/b3.json", "w") as f:
                f.write("\n".join(json.dumps(r) for r in b3))
            stream2 = (
                spark.readStream.format("json")
                .schema(schema)
                .option("maxFilesPerTrigger", 1)
                .load(src)
            )
            q2 = W.streaming_minhash_dedup(
                stream2, outd, hist, ckpt, k=3, num_hashes=12, bands=6,
                threshold=0.5, available_now=True,
            )
            try:
                q2.awaitTermination(120)
            finally:
                q2.stop()
            assert ids() == [1, 3, 11, 21]
        finally:
            shutil.rmtree(base, ignore_errors=True)


class TestWatermarkLateData:
    def test_late_event_beyond_watermark_dropped(self, spark):
        import time

        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StringType,
            StructField,
            StructType,
            TimestampType,
        )

        src = tempfile.mkdtemp(prefix="late_src_")
        try:
            schema = StructType(
                [
                    StructField("ts", TimestampType()),
                    StructField("event_type", StringType()),
                    StructField("value", DoubleType()),
                ]
            )
            # batch 1: events up to 12:00 -> watermark advances to 11:50
            with open(f"{src}/b1.json", "w") as f:
                f.write('{"ts": "2024-01-01 10:05:00", "event_type": "a", "value": 1.0}\n')
                f.write('{"ts": "2024-01-01 12:00:00", "event_type": "a", "value": 2.0}\n')
            stream = (
                spark.readStream.format("json")
                .schema(schema)
                .option("maxFilesPerTrigger", 1)
                .load(src)
            )
            agg = W.tumbling_window_agg(
                stream, "ts", "1 hour", keys="event_type",
                aggs={"value": "sum"}, watermark="10 minutes",
            )
            q = (
                agg.writeStream.format("memory")
                .queryName("late_test")
                .outputMode("append")
                .trigger(processingTime="1 second")
                .start()
            )
            try:
                deadline = time.time() + 90
                # in append mode the 10:00 window emits once the
                # watermark (12:00 - 10m) passes its end
                while time.time() < deadline:
                    rows = spark.sql(
                        "SELECT window_start, value_sum FROM late_test"
                    ).collect()
                    if rows:
                        break
                    time.sleep(1)
                got = {r.window_start.hour: r.value_sum for r in rows}
                assert got.get(10) == 1.0
                # batch 2: an event 3 hours LATE (08:30) — beyond the
                # watermark, must be dropped, its window never emitted
                with open(f"{src}/b2.json", "w") as f:
                    f.write('{"ts": "2024-01-01 08:30:00", "event_type": "a", "value": 99.0}\n')
                    # 14:00 pushes the watermark to 13:50, closing the
                    # 12:00-13:00 window so it emits
                    f.write('{"ts": "2024-01-01 14:00:00", "event_type": "a", "value": 3.0}\n')
                while time.time() < deadline:
                    rows = spark.sql(
                        "SELECT window_start, value_sum FROM late_test"
                    ).collect()
                    hours = {r.window_start.hour for r in rows}
                    if 12 in hours:  # batch-2 watermark advance emitted 12:00 window
                        break
                    time.sleep(1)
                hours = {r.window_start.hour: r.value_sum for r in rows}
                assert 8 not in hours, "late event's window must never appear"
                assert hours.get(12) == 2.0
            finally:
                q.stop()
        finally:
            shutil.rmtree(src, ignore_errors=True)


class TestStreamingDedup:
    def test_cross_batch_exact_dedup(self, spark):
        import time

        from pyspark.sql.types import LongType, StringType, StructField, StructType

        src = tempfile.mkdtemp(prefix="dd_src_")
        try:
            schema = StructType(
                [StructField("doc_id", LongType()), StructField("text", StringType())]
            )
            with open(f"{src}/b1.json", "w") as f:
                f.write('{"doc_id": 1, "text": "hello world"}\n')
                f.write('{"doc_id": 2, "text": "Hello  WORLD"}\n')  # same-batch dup
            stream = (
                spark.readStream.format("json")
                .schema(schema)
                .option("maxFilesPerTrigger", 1)
                .load(src)
            )
            q = (
                W.streaming_exact_dedup(stream)
                .writeStream.format("memory")
                .queryName("dd_test")
                .outputMode("append")
                .trigger(processingTime="1 second")
                .start()
            )
            try:
                deadline = time.time() + 60
                while time.time() < deadline:
                    got = sorted(
                        r.doc_id for r in spark.sql("SELECT doc_id FROM dd_test").collect()
                    )
                    if got:
                        break
                    time.sleep(1)
                assert got == [1]
                with open(f"{src}/b2.json", "w") as f:
                    f.write('{"doc_id": 3, "text": "hello world"}\n')  # cross-batch dup
                    f.write('{"doc_id": 4, "text": "fresh"}\n')
                while time.time() < deadline:
                    got = sorted(
                        r.doc_id for r in spark.sql("SELECT doc_id FROM dd_test").collect()
                    )
                    if 4 in got:
                        break
                    time.sleep(1)
                assert got == [1, 4]  # 3 deduped against batch-1 state
            finally:
                q.stop()
        finally:
            shutil.rmtree(src, ignore_errors=True)


class TestRealStreaming:
    def test_file_stream_tumbling_window(self, spark):
        src = tempfile.mkdtemp(prefix="stream_src_")
        try:
            with open(f"{src}/batch1.json", "w") as f:
                for _, row in EVENTS.iterrows():
                    f.write(
                        json.dumps(
                            {
                                "ts": row.ts.isoformat(sep=" "),
                                "user_id": int(row.user_id),
                                "event_type": row.event_type,
                                "value": row.value,
                            }
                        )
                        + "\n"
                    )
            schema = StructType(
                [
                    StructField("ts", TimestampType()),
                    StructField("user_id", StringType()),
                    StructField("event_type", StringType()),
                    StructField("value", DoubleType()),
                ]
            )
            stream = W.read_event_stream(spark, src, schema, fmt="json")
            assert stream.isStreaming
            agg = W.tumbling_window_agg(
                stream,
                "ts",
                "1 hour",
                keys="event_type",
                aggs={"value": "sum"},
                watermark="10 minutes",
            )
            q = (
                agg.writeStream.format("memory")
                .queryName("tumbling_test")
                .outputMode("complete")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(60)
            got = spark.sql(
                "SELECT event_type, sum(value_sum) AS total FROM tumbling_test GROUP BY 1"
            ).toPandas()
            totals = dict(zip(got.event_type, got.total))
            assert totals == {"view": 17.0, "click": 3.0}
        finally:
            shutil.rmtree(src, ignore_errors=True)


class TestStreamingDatasetGate:
    """The dataset-construction layer is stateless column expressions,
    so the same operators run UNCHANGED under Structured Streaming —
    documents can be gated and split in-flight during ingestion."""

    def test_gopher_gate_and_hash_split_on_stream(self, spark):
        import time

        from pd_utils_spark.extensions.sampling import hash_split
        from pd_utils_spark.extensions.text import gopher_quality_filter

        src = tempfile.mkdtemp(prefix="stream_docs_")
        try:
            with open(f"{src}/b1.json", "w") as f:
                f.write(
                    '{"doc_id": 1, "text": "the quick brown fox is not lazy and jumps over the dog again"}\n'
                    '{"doc_id": 2, "text": "shrt"}\n'
                )
            schema = StructType(
                [
                    StructField("doc_id", DoubleType()),
                    StructField("text", StringType()),
                ]
            )
            stream = (
                spark.readStream.format("json").schema(schema).load(src)
            )
            gated = gopher_quality_filter(stream, min_tokens=10)
            out = hash_split(gated, idcol="doc_id", seed=5)
            q = (
                out.writeStream.format("memory")
                .queryName("gate_stream")
                .outputMode("append")
                .start()
            )
            try:
                deadline = time.time() + 60
                rows = []
                while time.time() < deadline:
                    rows = spark.sql(
                        "SELECT doc_id, passes_gopher, split FROM gate_stream"
                    ).collect()
                    if len(rows) == 2:
                        break
                    time.sleep(1)
                got = {int(r.doc_id): (r.passes_gopher, r.split) for r in rows}
                assert got[1][0] is True and got[2][0] is False
                # split labels match the batch computation exactly
                batch = {
                    int(r.doc_id): r.split
                    for r in hash_split(
                        spark.createDataFrame(
                            pd.DataFrame({"doc_id": [1.0, 2.0], "text": ["a", "b"]})
                        ),
                        idcol="doc_id",
                        seed=5,
                    ).collect()
                }
                assert got[1][1] == batch[1] and got[2][1] == batch[2]
            finally:
                q.stop()
        finally:
            shutil.rmtree(src, ignore_errors=True)


class TestStreamingPIIRedaction:
    """PII scrubbing and URL signals are stateless column expressions —
    they run UNCHANGED under Structured Streaming, so ingestion can
    redact in-flight before anything lands on disk."""

    def test_redact_and_url_signals_on_stream(self, spark):
        import time

        from pd_utils_spark.extensions.pii import pii_signals, redact_pii
        from pd_utils_spark.extensions.web import url_signals

        src = tempfile.mkdtemp(prefix="stream_pii_")
        try:
            with open(f"{src}/b1.json", "w") as f:
                f.write(
                    '{"doc_id": 1, "text": "mail bob@example.com at https://a.example.org/x"}\n'
                    '{"doc_id": 2, "text": "nothing sensitive here"}\n'
                )
            schema = StructType(
                [
                    StructField("doc_id", DoubleType()),
                    StructField("text", StringType()),
                ]
            )
            stream = spark.readStream.format("json").schema(schema).load(src)
            out = url_signals(pii_signals(redact_pii(stream)))
            q = (
                out.writeStream.format("memory")
                .queryName("pii_stream")
                .outputMode("append")
                .start()
            )
            try:
                deadline = time.time() + 60
                rows = []
                while time.time() < deadline:
                    rows = spark.sql(
                        "SELECT doc_id, text, n_pii_total, n_urls FROM pii_stream"
                    ).collect()
                    if len(rows) == 2:
                        break
                    time.sleep(1)
                got = {int(r.doc_id): r for r in rows}
                assert "<EMAIL>" in got[1].text and "@" not in got[1].text
                assert got[1].n_pii_total == 0  # counted AFTER redaction
                assert got[1].n_urls == 1
                assert got[2].text == "nothing sensitive here"
            finally:
                q.stop()
        finally:
            shutil.rmtree(src, ignore_errors=True)


class TestStreamIntervalJoin:
    def _frames(self, spark):
        from datetime import datetime as dt

        views = spark.createDataFrame(
            pd.DataFrame(
                {
                    "user_id": [1, 1, 2],
                    "ts": [
                        dt(2025, 1, 1, 10, 0),
                        dt(2025, 1, 1, 12, 0),
                        dt(2025, 1, 1, 10, 0),
                    ],
                    "view_id": [10, 11, 20],
                }
            )
        )
        clicks = spark.createDataFrame(
            pd.DataFrame(
                {
                    "user_id": [1, 1, 2, 3],
                    "ts_r": [
                        dt(2025, 1, 1, 10, 30),
                        dt(2025, 1, 1, 13, 30),
                        dt(2025, 1, 1, 10, 10),
                        dt(2025, 1, 1, 10, 0),
                    ],
                    "click_id": [100, 101, 200, 300],
                }
            )
        )
        return views, clicks

    def test_batch_mode_inner_and_outer(self, spark):
        from pd_utils_spark.streaming.windows import stream_interval_join

        views, clicks = self._frames(spark)
        inner = sorted(
            (r.user_id, r.view_id, r.click_id)
            for r in stream_interval_join(
                views, clicks, "user_id", "ts", "ts_r", "0 seconds", "1 hour"
            ).collect()
        )
        # click 101 is 1.5h after view 11 -> out of interval; click 300
        # has no view for user 3
        assert inner == [(1, 10, 100), (2, 20, 200)]
        outer = sorted(
            (r.user_id, r.view_id, r.click_id)
            for r in stream_interval_join(
                views, clicks, "user_id", "ts", "ts_r",
                "0 seconds", "1 hour", how="left_outer",
            ).collect()
        )
        assert outer == [(1, 10, 100), (1, 11, None), (2, 20, 200)]

    def test_guards(self, spark):
        from pd_utils_spark.streaming.windows import stream_interval_join

        views, clicks = self._frames(spark)
        with pytest.raises(ValueError, match="must differ"):
            stream_interval_join(views, views, "user_id", "ts", "ts")
        with pytest.raises(ValueError, match="shared"):
            stream_interval_join(
                views, views.withColumnRenamed("ts", "ts_r"),
                "user_id", "ts", "ts_r",
            )

    def test_stream_buffers_left_across_batches(self, spark):
        """A click arriving in micro-batch 2 must still join the view
        from micro-batch 1 — the buffered-state property that makes a
        stream-stream join different from per-batch joins."""
        import time

        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        vsrc = tempfile.mkdtemp(prefix="ssj_views_")
        csrc = tempfile.mkdtemp(prefix="ssj_clicks_")
        try:
            vschema = StructType(
                [
                    StructField("user_id", LongType()),
                    StructField("ts", StringType()),
                    StructField("view_id", LongType()),
                ]
            )
            cschema = StructType(
                [
                    StructField("user_id", LongType()),
                    StructField("ts_r", StringType()),
                    StructField("click_id", LongType()),
                ]
            )
            with open(f"{vsrc}/v1.json", "w") as f:
                f.write('{"user_id": 1, "ts": "2025-01-01 10:00:00", "view_id": 10}\n')
            with open(f"{csrc}/c1.json", "w") as f:
                f.write('{"user_id": 1, "ts_r": "2025-01-01 10:05:00", "click_id": 100}\n')
            views = (
                spark.readStream.format("json")
                .schema(vschema)
                .option("maxFilesPerTrigger", 1)
                .load(vsrc)
                .withColumn("ts", F.col("ts").cast("timestamp"))
            )
            clicks = (
                spark.readStream.format("json")
                .schema(cschema)
                .option("maxFilesPerTrigger", 1)
                .load(csrc)
                .withColumn("ts_r", F.col("ts_r").cast("timestamp"))
            )
            from pd_utils_spark.streaming.windows import stream_interval_join

            joined = stream_interval_join(
                views, clicks, "user_id", "ts", "ts_r", "0 seconds", "1 hour"
            )
            q = (
                joined.writeStream.format("memory")
                .queryName("ssj_test")
                .outputMode("append")
                .trigger(processingTime="1 second")
                .start()
            )
            try:
                deadline = time.time() + 60
                while time.time() < deadline:
                    if spark.sql(
                        "SELECT * FROM ssj_test WHERE click_id = 100"
                    ).collect():
                        break
                    time.sleep(1)
                # second click lands LATER, still inside view 10's hour
                with open(f"{csrc}/c2.json", "w") as f:
                    f.write(
                        '{"user_id": 1, "ts_r": "2025-01-01 10:45:00", "click_id": 101}\n'
                    )
                got = []
                while time.time() < deadline:
                    got = sorted(
                        (r.view_id, r.click_id)
                        for r in spark.sql("SELECT * FROM ssj_test").collect()
                    )
                    if len(got) >= 2:
                        break
                    time.sleep(1)
                assert got == [(10, 100), (10, 101)]
            finally:
                q.stop()
        finally:
            shutil.rmtree(vsrc, ignore_errors=True)
            shutil.rmtree(csrc, ignore_errors=True)


class TestStreamStaticEnrich:
    def test_batch_parity_and_collision_guard(self, spark):
        import pytest as _pytest

        from pd_utils_spark.streaming.windows import stream_static_enrich

        ev = spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], ["user_id", "value"]
        )
        dim = spark.createDataFrame(
            [(1, "a"), (2, "b")], ["user_id", "segment"]
        )
        got = {
            r.user_id: r.segment
            for r in stream_static_enrich(ev, dim, "user_id").collect()
        }
        assert got == {1: "a", 2: "b", 3: None}  # left join keeps unmatched
        bad = spark.createDataFrame([(1, 9.0)], ["user_id", "value"])
        with _pytest.raises(ValueError, match="shared"):
            stream_static_enrich(ev, bad, "user_id")


class TestStreamingBandDedup:
    def test_band_key_matches_batch_band_zero(self, spark):
        from pd_utils_spark.extensions import dedup as D

        docs = spark.createDataFrame(
            [(i, f"alpha beta gamma delta {i % 4} epsilon zeta")
             for i in range(12)],
            "doc_id int, text string",
        )
        sig = D.minhash_signature(docs, num_hashes=12)
        batch = {
            r.doc_id: r.band_key
            for r in D.lsh_band_keys(sig, bands=4).filter("band = 0").collect()
        }
        expr = {
            r.doc_id: r.k
            for r in docs.select(
                "doc_id", D.minhash_band_key(F.col("text"), 3, 3).alias("k")
            ).collect()
        }
        assert expr == batch  # bit-for-bit batch band-0 parity

    def test_cross_batch_near_dedup(self, spark):
        """Batch 1's exact dup collapses; batch 2's EXACT copy of a
        batch-1 doc drops (state carried across micro-batches); a
        novel doc survives. Near-dup behavior is then asserted from
        the computed band keys, not guessed: whatever docs share a
        key, exactly one per key survives."""
        import time

        from pyspark.sql.types import LongType

        from pd_utils_spark.extensions.dedup import minhash_band_key

        src = tempfile.mkdtemp(prefix="bd_src_")
        try:
            schema = StructType(
                [StructField("doc_id", LongType()), StructField("text", StringType())]
            )
            t_dup = "the quick brown fox jumps over the lazy dog today"
            b1 = [
                {"doc_id": 1, "text": t_dup},
                {"doc_id": 2, "text": t_dup},                 # same-batch dup
                {"doc_id": 3, "text": "completely different first batch content"},
            ]
            b2 = [
                {"doc_id": 10, "text": t_dup},                # cross-batch dup
                {"doc_id": 11, "text": "brand new second batch content entirely"},
            ]
            with open(f"{src}/b1.json", "w") as f:
                f.write("\n".join(json.dumps(r) for r in b1))
            stream = (
                spark.readStream.format("json")
                .schema(schema)
                .option("maxFilesPerTrigger", 1)
                .load(src)
            )
            q = (
                W.streaming_band_dedup(stream)
                .writeStream.format("memory")
                .queryName("bd_test")
                .outputMode("append")
                .trigger(processingTime="1 second")
                .start()
            )
            try:
                deadline = time.time() + 60
                while time.time() < deadline:
                    got = sorted(
                        r.doc_id
                        for r in spark.sql("SELECT doc_id FROM bd_test").collect()
                    )
                    if got:
                        break
                    time.sleep(1)
                assert got == [1, 3]
                with open(f"{src}/b2.json", "w") as f:
                    f.write("\n".join(json.dumps(r) for r in b2))
                while time.time() < deadline:
                    got = sorted(
                        r.doc_id
                        for r in spark.sql("SELECT doc_id FROM bd_test").collect()
                    )
                    if 11 in got:
                        break
                    time.sleep(1)
                assert got == [1, 3, 11]  # 10 deduped against batch-1 state
                # survivors carry DISTINCT band keys — one per key group
                surv = spark.sql("SELECT text FROM bd_test")
                keys = [
                    r.k
                    for r in surv.select(
                        minhash_band_key(F.col("text"), 3, 3).alias("k")
                    ).collect()
                ]
                assert len(keys) == len(set(keys))
            finally:
                q.stop()
        finally:
            shutil.rmtree(src, ignore_errors=True)

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
        with pytest.raises(ValueError, match="rows_per_band"):
            W.streaming_band_dedup(df, rows_per_band=0)


class TestStreamingBloomDedup:
    def test_cross_batch_member_drops_and_state_stays_one_row(self, spark):
        """Constant-state streaming exact dedup: batch 1's survivor
        claims its fingerprint in the Bloom filter; batch 2's
        normalized copy drops while its fresh doc survives, and the
        history state remains ONE parquet row of m_bits/64 longs
        regardless of how many docs flowed through."""
        import os
        import time

        from pyspark.sql.types import LongType, StringType

        base = tempfile.mkdtemp(prefix="bloomstream_")
        src, outd, bld, ckpt = (
            f"{base}/{d}" for d in ("src", "out", "bloom", "ckpt")
        )
        os.makedirs(src)
        try:
            schema = StructType(
                [StructField("doc_id", LongType()), StructField("text", StringType())]
            )
            b1 = [
                {"doc_id": 5, "text": "alpha beta gamma"},
                {"doc_id": 1, "text": "alpha beta gamma"},
                {"doc_id": 3, "text": "unique one"},
            ]
            b2 = [
                {"doc_id": 10, "text": "Alpha  beta gamma"},  # normalized member
                {"doc_id": 11, "text": "fresh second batch"},
            ]
            with open(f"{src}/b1.json", "w") as f:
                f.write("\n".join(json.dumps(r) for r in b1))
            stream = (
                spark.readStream.format("json")
                .schema(schema)
                .option("maxFilesPerTrigger", 1)
                .load(src)
            )
            q = W.streaming_bloom_dedup(
                stream, outd, bld, ckpt, m_bits=4096, k=3
            )

            def ids():
                try:
                    return sorted(
                        r.doc_id for r in spark.read.parquet(outd).collect()
                    )
                except Exception:
                    return []

            try:
                deadline = time.time() + 90
                while time.time() < deadline and len(ids()) < 2:
                    time.sleep(1)
                assert ids() == [1, 3]  # min-id keeper within batch 1
                with open(f"{src}/b2.json", "w") as f:
                    f.write("\n".join(json.dumps(r) for r in b2))
                while time.time() < deadline and len(ids()) < 3:
                    time.sleep(1)
                assert ids() == [1, 3, 11]  # 10 dropped via the filter
                from pd_utils_spark.streaming.stateful import (
                    _latest_bloom_version,
                )

                # poll until batch 2's filter version COMMITS (the
                # output append precedes the filter write, so ids()
                # reaching 3 does not imply the write finished)
                v = None
                while time.time() < deadline and (v is None or v < 1):
                    v = _latest_bloom_version(spark, bld)
                    if v is None or v < 1:
                        time.sleep(1)
                assert v is not None and v >= 1
                bl = spark.read.parquet(f"{bld}/b={v}").collect()
                assert len(bl) == 1
                assert len(bl[0].bloom) == 4096 // 64
                assert bl[0].m_bits == 4096 and bl[0].k == 3
            finally:
                q.stop()
        finally:
            shutil.rmtree(base, ignore_errors=True)


class TestMergeBlooms:
    def test_union_semantics_and_geometry_guard(self, spark):
        from pd_utils_spark.extensions.dedup import (
            bloom_fingerprints,
            bloom_might_contain,
            merge_blooms,
        )

        h1 = spark.createDataFrame(
            [(i, f"first corpus doc {i}") for i in range(20)],
            ["doc_id", "text"],
        )
        h2 = spark.createDataFrame(
            [(i, f"second corpus doc {i}") for i in range(20)],
            ["doc_id", "text"],
        )
        merged = merge_blooms(
            bloom_fingerprints(h1, m_bits=2048, k=3),
            bloom_fingerprints(h2, m_bits=2048, k=3),
        )
        whole = bloom_fingerprints(
            h1.unionByName(h2.withColumn("doc_id", F.col("doc_id") + 100)),
            m_bits=2048,
            k=3,
        )
        # merge of the part filters == filter of the union corpus
        assert merged.collect() == whole.collect()
        probe = h1.unionByName(h2)
        flags = bloom_might_contain(probe, merged, out="m").collect()
        assert all(r.m for r in flags)  # every member of either side hits
        with pytest.raises(ValueError, match="geometry"):
            merge_blooms(
                bloom_fingerprints(h1, m_bits=2048, k=3),
                bloom_fingerprints(h2, m_bits=1024, k=3),
            )


class TestStreamingDistinctHll:
    def test_cross_batch_union_and_constant_state(self, spark):
        """Constant-state streaming distinct counting: batch 2's
        repeat of a batch-1 user must NOT re-count (the HLL union is
        idempotent on values), fresh users must; state stays one
        sketch row per group and the estimates snapshot always
        reflects the latest batch. Cardinalities here are coupon-mode
        (exact), so the asserts are equalities, not tolerances."""
        import os
        import time

        from pyspark.sql.types import LongType

        base = tempfile.mkdtemp(prefix="hllstream_")
        src, outd, skd, ckpt = (
            f"{base}/{d}" for d in ("src", "out", "sk", "ckpt")
        )
        os.makedirs(src)
        try:
            schema = StructType(
                [
                    StructField("event_type", StringType()),
                    StructField("user_id", LongType()),
                ]
            )
            b1 = [
                {"event_type": "g", "user_id": 1},
                {"event_type": "g", "user_id": 2},
                {"event_type": "g", "user_id": 2},
                {"event_type": "h", "user_id": 1},
            ]
            b2 = [
                {"event_type": "g", "user_id": 2},   # repeat: no-op
                {"event_type": "g", "user_id": 3},   # fresh
                {"event_type": "h", "user_id": 99},  # fresh
            ]
            with open(f"{src}/b1.json", "w") as f:
                f.write("\n".join(json.dumps(r) for r in b1))
            stream = (
                spark.readStream.format("json")
                .schema(schema)
                .option("maxFilesPerTrigger", 1)
                .load(src)
            )
            q = W.streaming_distinct_hll(
                stream, outd, skd, ckpt,
                byvars="event_type", col="user_id", lgk=12,
            )

            def snap():
                try:
                    return {
                        r.event_type: (r.distinct_estimate, r.as_of_batch)
                        for r in spark.read.parquet(outd).collect()
                    }
                except Exception:
                    return {}

            try:
                deadline = time.time() + 90
                while time.time() < deadline and snap().get("g", (0, 0))[0] < 2:
                    time.sleep(1)
                assert snap() == {"g": (2, 0), "h": (1, 0)}
                with open(f"{src}/b2.json", "w") as f:
                    f.write("\n".join(json.dumps(r) for r in b2))
                while time.time() < deadline and snap().get("g", (0, 0))[0] < 3:
                    time.sleep(1)
                assert snap() == {"g": (3, 1), "h": (2, 1)}
                from pd_utils_spark.streaming.stateful import (
                    _latest_bloom_version,
                )

                v = _latest_bloom_version(spark, skd)
                assert v == 1
                state = spark.read.parquet(f"{skd}/b={v}")
                assert state.count() == 2  # one sketch row per group
                assert dict(state.dtypes)["sk"] == "binary"
            finally:
                q.stop()
        finally:
            shutil.rmtree(base, ignore_errors=True)


class TestStreamingSampleQuantiles:
    def test_cross_batch_merge_exact_and_equals_batch_twin(self, spark):
        """Two micro-batches of per-group values; below k the sample
        IS the group, so every quantile is an exact order statistic
        after each batch. The accumulated state must also be
        BIT-IDENTICAL to the batch twin built over the full history
        in one pass — the deterministic-merge property the HLL row
        cannot offer."""
        import os
        import time

        from pyspark.sql.types import LongType

        base = tempfile.mkdtemp(prefix="qstream_")
        src, outd, smd, ckpt = (
            f"{base}/{d}" for d in ("src", "out", "sm", "ckpt")
        )
        os.makedirs(src)
        try:
            schema = StructType(
                [
                    StructField("event_type", StringType()),
                    StructField("event_id", LongType()),
                    StructField("value", DoubleType()),
                ]
            )
            b1 = [
                {"event_type": "g", "event_id": 1, "value": 10.0},
                {"event_type": "g", "event_id": 2, "value": 20.0},
                {"event_type": "g", "event_id": 3, "value": 30.0},
                {"event_type": "h", "event_id": 4, "value": 5.0},
            ]
            b2 = [
                {"event_type": "g", "event_id": 5, "value": 40.0},
                {"event_type": "g", "event_id": 6, "value": 50.0},
                {"event_type": "h", "event_id": 7, "value": 15.0},
            ]
            with open(f"{src}/b1.json", "w") as f:
                f.write("\n".join(json.dumps(r) for r in b1))
            stream = (
                spark.readStream.format("json")
                .schema(schema)
                .option("maxFilesPerTrigger", 1)
                .load(src)
            )
            q = W.streaming_sample_quantiles(
                stream, outd, smd, ckpt,
                byvars="event_type", col="value", id_cols="event_id",
                k=16, qs=(0.25, 0.5, 0.75),
            )

            def snap():
                try:
                    return {
                        r.event_type: (r.q25, r.q50, r.q75, r.n_sampled)
                        for r in spark.read.parquet(outd).collect()
                    }
                except Exception:
                    return {}

            try:
                deadline = time.time() + 90
                while time.time() < deadline and snap().get("g", (0,) * 4)[3] < 3:
                    time.sleep(1)
                assert snap() == {
                    "g": (10.0, 20.0, 30.0, 3),
                    "h": (5.0, 5.0, 5.0, 1),
                }
                with open(f"{src}/b2.json", "w") as f:
                    f.write("\n".join(json.dumps(r) for r in b2))
                while time.time() < deadline and snap().get("g", (0,) * 4)[3] < 5:
                    time.sleep(1)
                # g = {10..50}: idx ceil(q*5) -> 20/30/40; h = {5,15}
                assert snap() == {
                    "g": (20.0, 30.0, 40.0, 5),
                    "h": (5.0, 5.0, 15.0, 2),
                }
                from pd_utils_spark.extensions.sketches import (
                    sample_sketch_by,
                )
                from pd_utils_spark.streaming.stateful import (
                    _latest_bloom_version,
                )

                v = _latest_bloom_version(spark, smd)
                assert v == 1
                state = {
                    r.event_type: [tuple(e) for e in r.sk]
                    for r in spark.read.parquet(f"{smd}/b={v}").collect()
                }
                whole = spark.createDataFrame(
                    [tuple(r.values()) for r in b1 + b2],
                    ["event_type", "event_id", "value"],
                )
                twin = {
                    r.event_type: [tuple(e) for e in r.sk]
                    for r in sample_sketch_by(
                        whole, ["event_type"], "value",
                        id_cols="event_id", k=16, out="sk",
                    ).collect()
                }
                assert state == twin
            finally:
                q.stop()
        finally:
            shutil.rmtree(base, ignore_errors=True)


class TestStreamingTopk:
    def test_cross_batch_counts_exact_in_regime(self, spark):
        """Two micro-batches of per-group items; distinct <= max_items
        so every cross-batch count is EXACT (batch-1 counts + batch-2
        counts). Also pins the non-idempotence guard: the merge reads
        only versions STRICTLY older than the current batch id."""
        import os
        import time

        from pyspark.sql.types import LongType

        base = tempfile.mkdtemp(prefix="topkstream_")
        src, outd, skd, ckpt = (
            f"{base}/{d}" for d in ("src", "out", "sk", "ckpt")
        )
        os.makedirs(src)
        try:
            schema = StructType(
                [
                    StructField("event_type", StringType()),
                    StructField("item", LongType()),
                ]
            )
            b1 = [{"event_type": "g", "item": 1}] * 3 + [
                {"event_type": "g", "item": 2},
                {"event_type": "h", "item": 9},
            ]
            b2 = [{"event_type": "g", "item": 1}] * 2 + [
                {"event_type": "g", "item": 3},
                {"event_type": "h", "item": 9},
            ]
            with open(f"{src}/b1.json", "w") as f:
                f.write("\n".join(json.dumps(r) for r in b1))
            stream = (
                spark.readStream.format("json")
                .schema(schema)
                .option("maxFilesPerTrigger", 1)
                .load(src)
            )
            q = W.streaming_topk(
                stream, outd, skd, ckpt,
                byvars="event_type", col="item", max_items=16, k=16,
            )

            def snap():
                try:
                    return {
                        (r.event_type, r.item): (r["count"], r.as_of_batch)
                        for r in spark.read.parquet(outd).collect()
                    }
                except Exception:
                    return {}

            try:
                deadline = time.time() + 90
                while time.time() < deadline and snap().get(("g", 1), (0, 0))[0] < 3:
                    time.sleep(1)
                assert snap() == {
                    ("g", 1): (3, 0),
                    ("g", 2): (1, 0),
                    ("h", 9): (1, 0),
                }
                with open(f"{src}/b2.json", "w") as f:
                    f.write("\n".join(json.dumps(r) for r in b2))
                while time.time() < deadline and snap().get(("g", 1), (0, 0))[0] < 5:
                    time.sleep(1)
                assert snap() == {
                    ("g", 1): (5, 1),
                    ("g", 2): (1, 1),
                    ("g", 3): (1, 1),
                    ("h", 9): (2, 1),
                }
            finally:
                q.stop()
        finally:
            shutil.rmtree(base, ignore_errors=True)


class TestReadLatestState:
    def test_reader_sees_only_committed_versions(self, spark):
        import os

        from pd_utils_spark.streaming import read_latest_state

        base = tempfile.mkdtemp(prefix="statereader_")
        try:
            v, df = read_latest_state(spark, base)
            assert v is None and df is None
            spark.range(3).write.mode("overwrite").parquet(f"{base}/b=0")
            spark.range(5).write.mode("overwrite").parquet(f"{base}/b=1")
            # simulate a crash mid-write of version 2: dir, no _SUCCESS
            os.makedirs(f"{base}/b=2")
            v, df = read_latest_state(spark, base)
            assert v == 1 and df.count() == 5
        finally:
            shutil.rmtree(base, ignore_errors=True)


class TestStreamingWeightedSample:
    def test_cross_batch_exact_regime_and_batch_twin(self, spark):
        import os
        import time

        from pyspark.sql.types import LongType

        base = tempfile.mkdtemp(prefix="wstream_")
        src, outd, smd, ckpt = (
            f"{base}/{d}" for d in ("src", "out", "sm", "ckpt")
        )
        os.makedirs(src)
        try:
            schema = StructType(
                [
                    StructField("event_type", StringType()),
                    StructField("event_id", LongType()),
                    StructField("value", DoubleType()),
                    StructField("weight", DoubleType()),
                ]
            )
            b1 = [
                {"event_type": "g", "event_id": 1, "value": 10.0, "weight": 1.0},
                {"event_type": "g", "event_id": 2, "value": 20.0, "weight": 2.0},
                {"event_type": "g", "event_id": 3, "value": 30.0, "weight": 0.0},
            ]
            b2 = [
                {"event_type": "g", "event_id": 4, "value": 40.0, "weight": 3.0},
                {"event_type": "h", "event_id": 5, "value": 5.0, "weight": 1.0},
            ]
            with open(f"{src}/b1.json", "w") as f:
                f.write("\n".join(json.dumps(r) for r in b1))
            stream = (
                spark.readStream.format("json")
                .schema(schema)
                .option("maxFilesPerTrigger", 1)
                .load(src)
            )
            q = W.streaming_weighted_sample(
                stream, outd, smd, ckpt,
                byvars="event_type", col="value", weight_col="weight",
                id_cols="event_id", k=16,
            )

            def snap():
                try:
                    return {
                        r.event_type: (r.n_sampled, r.sum_sampled)
                        for r in spark.read.parquet(outd).collect()
                    }
                except Exception:
                    return {}

            try:
                deadline = time.time() + 90
                while time.time() < deadline and snap().get("g", (0, 0))[0] < 2:
                    time.sleep(1)
                # weight-0 row excluded; sample fits in k -> exact
                assert snap() == {"g": (2, 30.0)}
                with open(f"{src}/b2.json", "w") as f:
                    f.write("\n".join(json.dumps(r) for r in b2))
                while time.time() < deadline and snap().get("g", (0, 0))[0] < 3:
                    time.sleep(1)
                assert snap() == {"g": (3, 70.0), "h": (1, 5.0)}
                from pd_utils_spark.extensions.sketches import (
                    weighted_sample_sketch_by,
                )
                from pd_utils_spark.streaming import read_latest_state

                v, state_df = read_latest_state(spark, smd)
                assert v == 1
                state = {
                    r.event_type: [tuple(e) for e in r.sk]
                    for r in state_df.collect()
                }
                whole = spark.createDataFrame(
                    [tuple(r.values()) for r in b1 + b2],
                    ["event_type", "event_id", "value", "weight"],
                )
                twin = {
                    r.event_type: [tuple(e) for e in r.sk]
                    for r in weighted_sample_sketch_by(
                        whole, ["event_type"], "value", "weight",
                        id_cols="event_id", k=16, out="sk",
                    ).collect()
                }
                assert state == twin
            finally:
                q.stop()
        finally:
            shutil.rmtree(base, ignore_errors=True)


class TestStreamingContainmentDedup:
    def test_truncations_blocked_within_and_across_batches(self, spark):
        import os
        import time

        from pyspark.sql.types import LongType

        base = tempfile.mkdtemp(prefix="cstream_")
        src, outd, hist, ckpt = (
            f"{base}/{d}" for d in ("src", "out", "hist", "ckpt")
        )
        os.makedirs(src)
        full = "alpha bravo charlie delta echo foxtrot golf hotel india"
        try:
            schema = StructType(
                [
                    StructField("doc_id", LongType()),
                    StructField("text", StringType()),
                ]
            )
            b1 = [
                {"doc_id": 1, "text": full},
                {"doc_id": 2, "text": "alpha bravo charlie delta echo"},
                {"doc_id": 3, "text": "zulu yankee xray whiskey victor"},
            ]
            b2 = [
                {"doc_id": 4, "text": "bravo charlie delta echo foxtrot"},
                {"doc_id": 5, "text": "zulu yankee xray whiskey victor"},
                {"doc_id": 6, "text": "novel content about spark streams"},
            ]
            with open(f"{src}/b1.json", "w") as f:
                f.write("\n".join(json.dumps(r) for r in b1))
            stream = (
                spark.readStream.format("json")
                .schema(schema)
                .option("maxFilesPerTrigger", 1)
                .load(src)
            )
            q = W.streaming_containment_dedup(
                stream, outd, hist, ckpt, threshold=0.9, k=1
            )

            def ids():
                try:
                    return {
                        r.doc_id for r in spark.read.parquet(outd).collect()
                    }
                except Exception:
                    return set()

            try:
                deadline = time.time() + 90
                while time.time() < deadline and len(ids()) < 2:
                    time.sleep(1)
                # 2 (prefix of 1) dropped within the batch
                assert ids() == {1, 3}
                with open(f"{src}/b2.json", "w") as f:
                    f.write("\n".join(json.dumps(r) for r in b2))
                while time.time() < deadline and len(ids()) < 3:
                    time.sleep(1)
                # 4 (inner slice of 1) and 5 (copy of 3) blocked by
                # HISTORY; only the novel doc enters
                assert ids() == {1, 3, 6}
                # state layout: per-batch COMMITTED delta versions of
                # the three precomputed artifacts + the docs corpus
                for sub in ("index", "sets", "dfreq", "docs"):
                    for b in (0, 1):
                        assert os.path.exists(
                            f"{hist}/{sub}/b={b}/_SUCCESS"
                        ), f"{sub}/b={b} not committed"
                docs = spark.read.parquet(
                    f"{hist}/docs/b=0", f"{hist}/docs/b=1"
                )
                assert {r.doc_id for r in docs.collect()} == {1, 3, 6}
                # summed dfreq deltas == document frequency recomputed
                # from the accepted corpus (the exactness the probe's
                # prefix order rests on)
                from pd_utils_spark.extensions.dedup import (
                    containment_index_frames,
                )
                from pd_utils_spark.utils import release_registered

                dfreq = (
                    spark.read.parquet(
                        f"{hist}/dfreq/b=0", f"{hist}/dfreq/b=1"
                    )
                    .groupBy("__tok__")
                    .agg(F.sum("__df__").alias("__df__"))
                )
                want = containment_index_frames(docs, k=1)["dfreq"]
                got_m = {r["__tok__"]: r["__df__"] for r in dfreq.collect()}
                want_m = {r["__tok__"]: r["__df__"] for r in want.collect()}
                release_registered("containment_index_frames")
                assert got_m == want_m
            finally:
                q.stop()
        finally:
            shutil.rmtree(base, ignore_errors=True)

    def test_compaction_preserves_gate_behavior(self, spark):
        """compact_containment_state folds b= deltas into one c=
        generation; a restarted stream probes the compacted state and
        blocks/admits exactly as before (doc contained in batch-1
        content dropped, novel doc enters), with the stale deltas
        pruned."""
        import os
        import time

        from pyspark.sql.types import LongType

        from pd_utils_spark.streaming.stateful import (
            compact_containment_state,
        )

        base = tempfile.mkdtemp(prefix="cstream_compact_")
        src, outd, hist, ckpt = (
            f"{base}/{d}" for d in ("src", "out", "hist", "ckpt")
        )
        os.makedirs(src)
        schema = StructType(
            [
                StructField("doc_id", LongType()),
                StructField("text", StringType()),
            ]
        )
        full = "alpha bravo charlie delta echo foxtrot golf hotel india"

        def ids():
            try:
                return {r.doc_id for r in spark.read.parquet(outd).collect()}
            except Exception:
                return set()

        def run_batch(fname, rows, want_ids):
            with open(f"{src}/{fname}", "w") as f:
                f.write("\n".join(json.dumps(r) for r in rows))
            stream = (
                spark.readStream.format("json")
                .schema(schema)
                .option("maxFilesPerTrigger", 1)
                .load(src)
            )
            q = W.streaming_containment_dedup(
                stream, outd, hist, ckpt, threshold=0.9, k=1,
                available_now=True,
            )
            try:
                q.awaitTermination(120)
            finally:
                q.stop()
            assert ids() == want_ids

        try:
            run_batch(
                "b1.json",
                [
                    {"doc_id": 1, "text": full},
                    {"doc_id": 2, "text": "zulu yankee xray whiskey victor"},
                ],
                {1, 2},
            )
            run_batch(
                "b2.json",
                [{"doc_id": 3, "text": "novel content about spark streams"}],
                {1, 2, 3},
            )
            top = compact_containment_state(spark, hist)
            # folds only deltas BELOW the newest: b=0 -> c=0, b=1
            # stays (its batch could replay and reads strictly below
            # its own id — folding it would strand that replay on
            # empty history)
            assert top == 0
            assert os.path.exists(f"{hist}/index/c=0/_SUCCESS")
            assert not os.path.exists(f"{hist}/index/b=0")
            assert os.path.exists(f"{hist}/index/b=1/_SUCCESS")
            # re-compacting with nothing new is a no-op returning c0
            assert compact_containment_state(spark, hist) == 0
            # the crash-replay hole the fold-below-newest rule closes:
            # a replayed batch 1 (state committed, checkpoint not)
            # reads strictly below its own id and must still resolve
            # batch 0's full history — not the empty set the old
            # fold-everything compaction left it
            from pd_utils_spark.streaming.stateful import (
                _containment_state_frames,
                _versioned_state_pieces,
            )

            assert _versioned_state_pieces(spark, hist, "index", 1) == [
                "c=0"
            ]
            replay_state = _containment_state_frames(spark, hist, below=1)
            assert replay_state is not None
            assert {
                r["__hid__"] for r in replay_state[1].collect()
            } == {1, 2}  # batch 0's two docs
            # batch 3 (id 2) probes c=0 + delta b=1: 10 (inner slice
            # of doc 1) and 11 (slice of doc 3) blocked, 12 enters
            run_batch(
                "b3.json",
                [
                    {"doc_id": 10, "text": "bravo charlie delta echo foxtrot"},
                    {"doc_id": 11, "text": "novel content about spark"},
                    {"doc_id": 12, "text": "wholly fresh third batch words"},
                ],
                {1, 2, 3, 12},
            )
        finally:
            shutil.rmtree(base, ignore_errors=True)

    def test_compaction_race_double_read_is_harmless(self, spark, tmp_path):
        """Pins the documented compaction race claim (run with the
        stream stopped; 'nothing corrupts, but that delta could be
        read twice by a reader racing the prune'): (a) the official
        piece enumerator never double-reads — with the folded delta
        still on disk (prune=False, i.e. compaction crashed before
        prune or a reader races it) it resolves the compacted
        generation plus only NEWER deltas; (b) even a hypothetical
        reader that reads a folded delta twice (c=0 AND the stale
        b=0 it covers) derives identical survivors — the double-read
        inflates __df__ (prefix ORDER only) and duplicates candidate
        rows (absorbed by .distinct()), never changing the answer."""
        from pyspark.sql import functions as F

        from pd_utils_spark.extensions.dedup import (
            containment_index_frames,
            dedup_containment_against_index,
        )
        from pd_utils_spark.streaming.stateful import (
            _containment_state_frames,
            _versioned_state_pieces,
            compact_containment_state,
        )
        from pd_utils_spark.utils import release_registered

        hist = str(tmp_path / "hist")
        b0 = spark.createDataFrame(
            [(1, "alpha bravo charlie delta echo foxtrot golf hotel"),
             (2, "zulu yankee xray whiskey victor")],
            ["doc_id", "text"],
        )
        b1 = spark.createDataFrame(
            [(3, "novel content about spark streams")], ["doc_id", "text"]
        )
        for bid, frame in ((0, b0), (1, b1)):
            frames = containment_index_frames(frame, k=1)
            for name in ("dfreq", "sets", "index"):
                frames[name].write.mode("overwrite").parquet(
                    f"{hist}/{name}/b={bid}"
                )
            release_registered("containment_index_frames")
        assert compact_containment_state(spark, hist, prune=False) == 0
        # (a) stale delta b=0 still on disk; the enumerator resolves
        # c=0 + b=1 only — no path is read twice
        import os

        assert os.path.exists(f"{hist}/index/b=0/_SUCCESS")
        assert _versioned_state_pieces(spark, hist, "index", 2) == [
            "c=0", "b=1",
        ]
        batch = spark.createDataFrame(
            [(10, "bravo charlie delta echo foxtrot"),  # slice of doc 1
             (11, "novel content about spark"),         # slice of doc 3
             (12, "wholly fresh third batch words")],   # novel
            ["doc_id", "text"],
        )
        index, sets, dfreq = _containment_state_frames(spark, hist, below=2)
        want = sorted(
            tuple(r)
            for r in dedup_containment_against_index(
                batch, index, sets, dfreq, threshold=0.9, k=1
            ).collect()
        )
        release_registered("dedup_containment_against_index")
        assert {r[0] for r in want} == {12}
        # (b) the hypothetical double-read: batch-0 artifacts via BOTH
        # c=0 and the stale b=0 it folded
        double = ["c=0", "b=0", "b=1"]
        index2 = spark.read.parquet(*[f"{hist}/index/{p}" for p in double])
        sets2 = spark.read.parquet(*[f"{hist}/sets/{p}" for p in double])
        dfreq2 = (
            spark.read.parquet(*[f"{hist}/dfreq/{p}" for p in double])
            .groupBy("__tok__")
            .agg(F.sum("__df__").alias("__df__"))
        )
        got = sorted(
            tuple(r)
            for r in dedup_containment_against_index(
                batch, index2, sets2, dfreq2, threshold=0.9, k=1
            ).collect()
        )
        release_registered("dedup_containment_against_index")
        assert got == want


class TestCompactionReappliesFloodCap:
    """Per-delta flood caps bound each delta independently, so a hot
    bucket can grow to num_deltas x max_bucket across a stream's
    lifetime; compaction is the write-once place that re-bounds it.
    Pins: the builders stamp the applied cap into artifact metadata
    (parquet-persistent), the compactors re-apply it to the folded
    frame, and uncapped builds still fold losslessly."""

    def test_minhash_compaction_recaps_folded_keys(self, spark, tmp_path):
        from pd_utils_spark.extensions.dedup import minhash_history_frames
        from pd_utils_spark.streaming.stateful import (
            _minhash_state_frames,
            compact_minhash_state,
        )
        from pd_utils_spark.utils import release_registered

        hist = str(tmp_path / "hist")
        hot = "the quick brown fox jumps over the lazy dog today"
        # three deltas; each delta's hot-text bucket is 3 rows <= cap 4,
        # but the FOLD of b=0 + b=1 holds 6 — over the cap the build
        # enforced per delta
        for bid in (0, 1, 2):
            frame = spark.createDataFrame(
                [(bid * 10 + i, hot) for i in range(3)]
                + [(bid * 10 + 5, f"wholly unique delta {bid} payload words")],
                ["doc_id", "text"],
            )
            frames = minhash_history_frames(
                frame, k=3, num_hashes=12, bands=4, max_bucket=4
            )
            for name in ("shingles", "keys"):
                frames[name].write.mode("overwrite").parquet(
                    f"{hist}/{name}/b={bid}"
                )
            release_registered("minhash_history_frames")
        keys_b0 = spark.read.parquet(f"{hist}/keys/b=0")
        # the applied cap is stamped, parquet-persistent
        assert keys_b0.schema["band_key"].metadata["max_bucket"] == 4
        # per-delta state respects the cap (3 <= 4, nothing dropped)
        assert keys_b0.count() == 4 * 4  # 4 docs x 4 bands
        assert compact_minhash_state(spark, hist) == 1  # folds b=0,b=1
        folded = spark.read.parquet(f"{hist}/keys/c=1")
        sizes = folded.groupBy("band", "band_key").count()
        assert sizes.filter(F.col("count") > 4).count() == 0
        # the 6-row hot buckets were dropped outright (cap semantics);
        # the two unique docs' keys survive
        assert {
            r["__hid__"] for r in folded.select("__hid__").collect()
        } == {5, 15}
        # metadata survives the fold -> a later re-compaction still
        # knows the cap
        assert folded.schema["band_key"].metadata["max_bucket"] == 4

    def test_containment_compaction_recaps_folded_index(
        self, spark, tmp_path
    ):
        from pd_utils_spark.extensions.dedup import containment_index_frames
        from pd_utils_spark.streaming.stateful import (
            compact_containment_state,
        )
        from pd_utils_spark.utils import release_registered

        hist = str(tmp_path / "hist")
        # "common" appears in 2 docs per delta (<= cap 3); folded across
        # b=0 + b=1 it holds 4 rows — over the build-time cap
        for bid in (0, 1, 2):
            frame = spark.createDataFrame(
                [
                    (bid * 10 + 1, f"common alpha{bid} beta{bid}"),
                    (bid * 10 + 2, f"common gamma{bid} delta{bid}"),
                ],
                ["doc_id", "text"],
            )
            frames = containment_index_frames(frame, k=1, max_bucket=3)
            for name in ("dfreq", "sets", "index"):
                frames[name].write.mode("overwrite").parquet(
                    f"{hist}/{name}/b={bid}"
                )
            release_registered("containment_index_frames")
        idx_b0 = spark.read.parquet(f"{hist}/index/b=0")
        assert idx_b0.schema["__tok__"].metadata["max_bucket"] == 3
        assert idx_b0.count() == 6  # 2 docs x 3 tokens, nothing capped
        assert compact_containment_state(spark, hist) == 1
        folded = spark.read.parquet(f"{hist}/index/c=1")
        sizes = folded.groupBy("__tok__").count()
        assert sizes.filter(F.col("count") > 3).count() == 0
        # the shared-token bucket (4 rows folded) was dropped; each
        # doc's two unique tokens survive
        assert folded.count() == 8

    def test_uncapped_containment_build_folds_losslessly(
        self, spark, tmp_path
    ):
        from pd_utils_spark.extensions.dedup import containment_index_frames
        from pd_utils_spark.streaming.stateful import (
            compact_containment_state,
        )
        from pd_utils_spark.utils import release_registered

        hist = str(tmp_path / "hist")
        for bid in (0, 1, 2):
            frame = spark.createDataFrame(
                [(bid * 10 + 1, "common alpha beta")], ["doc_id", "text"]
            )
            frames = containment_index_frames(frame, k=1)  # uncapped
            for name in ("dfreq", "sets", "index"):
                frames[name].write.mode("overwrite").parquet(
                    f"{hist}/{name}/b={bid}"
                )
            release_registered("containment_index_frames")
        idx_b0 = spark.read.parquet(f"{hist}/index/b=0")
        assert "max_bucket" not in (idx_b0.schema["__tok__"].metadata or {})
        assert compact_containment_state(spark, hist) == 1
        # every folded row kept: 2 deltas x 1 doc x 3 tokens
        assert spark.read.parquet(f"{hist}/index/c=1").count() == 6


class TestSpreadBatchSizeAware:
    """r12: _spread_batch spreads proportional to estimated input
    bytes, not blindly to defaultParallelism — a KB-scale single-file
    micro-batch must be left alone (the r11 blanket spread made the
    two big gates anti-scale with cores at the driver), while a batch
    whose estimated bytes exceed the per-task grain still fans out."""

    def test_tiny_batch_not_spread(self, spark, tmp_path):
        from pd_utils_spark.streaming.stateful import _spread_batch

        p = str(tmp_path / "tiny")
        spark.range(100).coalesce(1).write.parquet(p)
        df = spark.read.parquet(p)
        n_in = df.rdd.getNumPartitions()
        out = _spread_batch(df)
        # a KB-sized batch is far under the 4 MiB/task grain: no spread
        assert out.rdd.getNumPartitions() == n_in

    def test_large_estimate_spreads_to_parallelism(
        self, spark, tmp_path, monkeypatch
    ):
        from pd_utils_spark.streaming.stateful import _spread_batch

        p = str(tmp_path / "grain")
        spark.range(100).coalesce(1).write.parquet(p)
        df = spark.read.parquet(p)
        # 1-byte grain: every batch's estimate exceeds it -> full fan
        monkeypatch.setenv("SPARK_GRAFT_SPREAD_TARGET_BYTES", "1")
        out = _spread_batch(df)
        assert (
            out.rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism
        )

    def test_grain_scales_partition_count(self, spark, tmp_path, monkeypatch):
        from pd_utils_spark.streaming.stateful import _spread_batch

        p = str(tmp_path / "mid")
        spark.range(1000).coalesce(1).write.parquet(p)
        df = spark.read.parquet(p)
        est = int(
            str(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        )
        assert est > 0
        # grain = half the estimate -> exactly ceil(est/grain) = 2 parts
        monkeypatch.setenv(
            "SPARK_GRAFT_SPREAD_TARGET_BYTES", str((est + 1) // 2)
        )
        out = _spread_batch(df)
        assert out.rdd.getNumPartitions() == 2


class TestRecapValidationAndPolicy:
    """r12 (ADVICE r11): cap values that would wipe the folded state
    fail loudly, recap=False is the explicit lossless override for a
    capped build, and the fold's stamp is resolved PER PIECE (minimum
    across stamped pieces) instead of trusting whichever footer a
    merged multi-path read happens to sample."""

    def _write_minhash_deltas(self, spark, hist, caps):
        from pd_utils_spark.extensions.dedup import minhash_history_frames
        from pd_utils_spark.utils import release_registered

        hot = "the quick brown fox jumps over the lazy dog today"
        for bid, cap in enumerate(caps):
            frame = spark.createDataFrame(
                [(bid * 10 + i, hot) for i in range(3)],
                ["doc_id", "text"],
            )
            frames = minhash_history_frames(
                frame, k=3, num_hashes=12, bands=4, max_bucket=cap
            )
            for name in ("shingles", "keys"):
                frames[name].write.mode("overwrite").parquet(
                    f"{hist}/{name}/b={bid}"
                )
            release_registered("minhash_history_frames")

    def test_zero_cap_raises_everywhere(self, spark, tmp_path):
        from pd_utils_spark.extensions.dedup import _cap_buckets
        from pd_utils_spark.streaming.stateful import (
            compact_containment_state,
            compact_minhash_state,
        )

        df = spark.createDataFrame([(1, 2)], ["a", "b"])
        with pytest.raises(ValueError, match="max_bucket"):
            _cap_buckets(df, ["a"], 0, "m")
        with pytest.raises(ValueError, match="max_bucket"):
            compact_minhash_state(spark, str(tmp_path / "x"), max_bucket=0)
        with pytest.raises(ValueError, match="max_bucket"):
            compact_containment_state(
                spark, str(tmp_path / "y"), max_bucket=-1
            )

    def test_recap_false_folds_capped_build_losslessly(
        self, spark, tmp_path
    ):
        from pd_utils_spark.streaming.stateful import compact_minhash_state

        hist = str(tmp_path / "hist")
        # per-delta cap 4; the fold of b=0 + b=1 has 6-row buckets
        self._write_minhash_deltas(spark, hist, caps=(4, 4, 4))
        assert compact_minhash_state(spark, hist, recap=False) == 1
        folded = spark.read.parquet(f"{hist}/keys/c=1")
        # every folded row kept: 2 deltas x 3 docs x 4 bands
        assert folded.count() == 2 * 3 * 4
        sizes = folded.groupBy("band", "band_key").count()
        assert sizes.filter(F.col("count") > 4).count() > 0  # over-cap kept

    def test_mixed_stamps_take_minimum_per_piece(self, spark, tmp_path):
        from pd_utils_spark.streaming.stateful import (
            _stamped_max_bucket_pieces,
            compact_minhash_state,
        )

        hist = str(tmp_path / "hist")
        # deltas built under DIFFERENT caps (a restarted stream with a
        # changed max_bucket); b=2 stays unfolded (newest delta)
        self._write_minhash_deltas(spark, hist, caps=(9, 5, 7))
        assert (
            _stamped_max_bucket_pieces(
                spark, [f"{hist}/keys/b=0", f"{hist}/keys/b=1"], "band_key"
            )
            == 5
        )
        assert compact_minhash_state(spark, hist) == 1
        folded = spark.read.parquet(f"{hist}/keys/c=1")
        sizes = folded.groupBy("band", "band_key").count()
        # the fold's 6-row hot buckets exceed the MIN stamp (5) and are
        # dropped — deterministic policy, not footer-sampling luck
        assert sizes.filter(F.col("count") > 5).count() == 0
        assert folded.count() == 0  # every bucket was hot here
