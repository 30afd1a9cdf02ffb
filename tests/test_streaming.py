"""Streaming operators: batch twins + a real Structured Streaming run
(file source → watermark → tumbling window, availableNow trigger)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from vectra_py_spark.streaming import events as ev

pytestmark = pytest.mark.slow  # excluded from the smoke tier

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{SF}/events.parquet")


def test_windowed_counts_shape(events):
    out = ev.windowed_counts(events).collect()
    assert len(out) > 0
    for r in out:
        assert r.window_start_us % ev.MICROS_PER_HOUR == 0
        assert r.n_events > 0
    total = sum(r.n_events for r in out)
    assert total == events.count()


def test_sessionize_invariants(events):
    sessions = ev.sessionize(events).collect()
    assert sum(r.n_events for r in sessions) == events.count()
    by_user: dict[int, list] = {}
    for s in sessions:
        assert s.session_start_us <= s.session_end_us
        by_user.setdefault(s.user_id, []).append(s)
    for user_sessions in by_user.values():
        user_sessions.sort(key=lambda s: s.session_start_us)
        for a, b in zip(user_sessions, user_sessions[1:]):
            # gap between consecutive sessions exceeds the threshold
            assert b.session_start_us - a.session_end_us > ev.DEFAULT_SESSION_GAP_US


def test_top_users_per_type(events):
    out = ev.top_users_per_type(events, n=3).collect()
    by_type: dict[str, list] = {}
    for r in out:
        by_type.setdefault(r.event_type, []).append(r)
    for rows in by_type.values():
        ranks = [r.rnk for r in rows]
        assert min(ranks) == 1 and max(ranks) <= 3
        vals = [r.total_value for r in rows]
        assert vals == sorted(vals, reverse=True)


def test_streaming_windowed_counts_matches_batch(spark, events):
    """The streaming plan (file source, watermark, availableNow) must
    produce the same windows as the batch twin."""
    d = tempfile.mkdtemp()
    try:
        # stage events as a real TIMESTAMP parquet stream source
        src = events.select(
            F.timestamp_micros(ev.event_time_col("ts", events)).alias("event_time"),
            "event_type",
            "value",
        )
        src.write.mode("overwrite").parquet(f"{d}/src")
        stream = spark.readStream.schema(src.schema).parquet(f"{d}/src")
        q = (
            ev.streaming_windowed_counts(stream, "1 hour", "2 hours")
            .writeStream.format("memory")
            .queryName("win_counts")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.window_start, r.event_type): (r.n_events, round(r.total_value, 2))
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
        want = {
            (r.window_start_us, r.event_type): (r.n_events, r.total_value)
            for r in ev.windowed_counts(events).collect()
        }
        assert len(got) == len(want)
        for (ws, et), (n, v) in got.items():
            key = (int(ws.timestamp() * 1_000_000), et)
            assert key in want
            assert want[key][0] == n
            assert want[key][1] == pytest.approx(v, abs=0.01)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    """State survives micro-batches: a text seen in batch 1 is dropped in
    batch 2; a new text in batch 2 is emitted."""
    import time

    from vectra_py_spark.streaming.dedup import streaming_exact_dedup

    src = tmp_path / "src"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    schema = "doc_id string, text string"
    b1 = spark.createDataFrame(
        [("d1", "alpha beta"), ("d2", "gamma delta"), ("d3", "alpha beta")],
        schema,
    )
    b1.coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        streaming_exact_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            r.doc_id for r in spark.sql("SELECT * FROM dedup_out").collect()
        }
        assert first == {"d1", "d2"}  # d3 duplicates d1 within the batch

        b2 = spark.createDataFrame(
            [("d4", "alpha beta"), ("d5", "epsilon zeta")], schema
        )
        b2.coalesce(1).write.mode("append").parquet(str(src))
        time.sleep(0.2)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM dedup_out").collect()
        ids = {r.doc_id for r in rows}
        assert ids == {"d1", "d2", "d5"}  # d4 deduped ACROSS batches
    finally:
        q.stop()


def test_sessionize_matches_native_session_window(spark, events):
    """Our gaps-and-islands sessionize ≡ Spark's built-in
    F.session_window on the same 30-min gap (same starts/ends/counts)."""
    from pyspark.sql import functions as F

    from vectra_py_spark.streaming.events import (
        DEFAULT_SESSION_GAP_US,
        event_time_col,
        sessionize,
    )

    ours = sessionize(events).collect()

    native = (
        events.withColumn(
            "event_time", F.timestamp_micros(event_time_col("ts", events))
        )
        .groupBy(
            F.session_window("event_time", "30 minutes"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("session_start_us"),
            F.unix_micros("session_window.end").alias("session_end_us"),
            "n_events",
        )
        .orderBy("user_id", "session_start_us")
        .collect()
    )
    assert len(ours) == len(native)
    for a, b in zip(ours, native):
        assert a.user_id == b.user_id
        assert a.session_start_us == b.session_start_us
        # native end = last event + gap; ours = last event timestamp
        assert a.session_end_us == b.session_end_us - DEFAULT_SESSION_GAP_US
        assert a.n_events == b.n_events


def test_streaming_clean_corpus_filters_then_dedups_across_batches(
    spark, tmp_path
):
    """Junk is dropped BEFORE the stateful dedup; survivorship holds
    across micro-batches; result matches the batch signal semantics."""
    import time

    from vectra_py_spark.streaming.curation import streaming_clean_corpus

    # long and non-repeating: every bigram touches a unique token, so
    # the quality floor passes without tripping the bigram filters
    conns = [("the", "of"), ("a", "and"), ("it", "is"), ("to", "in")]
    good = " ".join(
        f"{conns[i % 4][0]} word{i} {conns[i % 4][1]} thing{i}"
        for i in range(40)
    )
    german = (
        "der hund und die katze und das haus und der baum ist hier und da "
    ) * 5
    repetitive = "spam ham spam ham " * 40

    src = tmp_path / "src"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    schema = "doc_id string, text string"
    b1 = spark.createDataFrame(
        [("d1", good), ("d2", german), ("d3", repetitive), ("d4", good)],
        schema,
    )
    b1.coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        streaming_clean_corpus(stream)
        .writeStream.format("memory")
        .queryName("clean_out")
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
        ids = {r.doc_id for r in spark.sql("SELECT * FROM clean_out").collect()}
        # d2 fails the language gate, d3 the repetition filter, d4
        # duplicates d1 within the batch
        assert ids == {"d1"}

        b2 = spark.createDataFrame(
            [("d5", good), ("d6", good + "completely new ending here ")],
            schema,
        )
        b2.coalesce(1).write.mode("append").parquet(str(src))
        time.sleep(0.2)
        q.processAllAvailable()
        ids = {r.doc_id for r in spark.sql("SELECT * FROM clean_out").collect()}
        # d5 duplicates d1 ACROSS batches (state survived); d6 is new
        assert ids == {"d1", "d6"}
    finally:
        q.stop()


def test_sliding_counts_each_event_in_k_windows(spark, events):
    from vectra_py_spark.streaming.events import sliding_counts

    out = sliding_counts(events).collect()
    n_events = events.count()
    # every event lands in exactly window/slide = 4 windows (up to the
    # stream head, where early events have fewer preceding windows)
    total = sum(r.n_events for r in out)
    assert total <= 4 * n_events
    assert total >= 4 * n_events - 3 * 4  # head truncation bound
    # window starts are on the 15-min grid
    assert all(r.window_start_us % (900 * 1_000_000) == 0 for r in out)


def test_streaming_sliding_counts_matches_batch(spark, events):
    """The sliding streaming plan must reproduce the batch twin's
    (window_start, type) -> count map on a drained file source."""
    import tempfile

    from vectra_py_spark.streaming.events import (
        sliding_counts,
        streaming_sliding_counts,
    )

    d = tempfile.mkdtemp()
    try:
        src = events.select(
            F.timestamp_micros(ev.event_time_col("ts", events)).alias(
                "event_time"
            ),
            "event_type",
            "value",
        )
        src.write.mode("overwrite").parquet(f"{d}/src")
        stream = spark.readStream.schema(src.schema).parquet(f"{d}/src")
        q = (
            streaming_sliding_counts(stream)
            .writeStream.format("memory")
            .queryName("slide_counts")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{d}/ckpt")
            .start()
        )
        q.awaitTermination(120)
        got = {
            (int(r.window_start.timestamp() * 1_000_000), r.event_type):
                r.n_events
            for r in spark.sql("select * from slide_counts").collect()
        }
        want = {
            (r.window_start_us, r.event_type): r.n_events
            for r in sliding_counts(events).collect()
        }
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)
