"""Streaming near-dup ingest loop (foreachBatch + fingerprint store):
cross-batch dedup must flow through the persisted store, not session
state — a second drop into the source directory must dedup against
batch 1's survivors after the first run already stopped."""

from __future__ import annotations

import pytest

from vectra_py_spark.streaming.incremental_dedup import (
    stream_neardup_dedup,
)

pytestmark = pytest.mark.slow  # excluded from the smoke tier


def _run_drop(spark, src, store, out, ckpt, rows):
    spark.createDataFrame(rows, "doc_id bigint, text string").write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    q = stream_neardup_dedup(
        stream, store_path=store, out_path=out, checkpoint_dir=ckpt, radius=0
    )
    q.awaitTermination(120)


@pytest.mark.usefixtures("spark")
def test_cross_batch_dedup_via_store(spark, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _run_drop(
        spark, src, store, out, ckpt,
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),   # in-batch dup of 1
            (3, "completely different text"),
        ],
    )
    kept1 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept1 == {1, 3}

    # second drop, new streaming run (AvailableNow drained + stopped):
    # 4 duplicates batch-1 survivor 1 → dropped via the STORE;
    # 5 is fresh → survives
    _run_drop(
        spark, src, store, out, ckpt,
        [
            (4, "alpha beta gamma delta"),
            (5, "brand new words entirely"),
        ],
    )
    kept2 = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept2 == {1, 3, 5}
    # the store now carries every survivor's fingerprint
    store_ids = {r.doc_id for r in spark.read.parquet(store).collect()}
    assert store_ids == {1, 3, 5}


@pytest.mark.usefixtures("spark")
def test_replay_is_idempotent(spark, tmp_path):
    """Replaying a batch whose writes already landed (crash before the
    checkpoint commit) must not duplicate sink rows, and must not let
    the batch match its OWN store fingerprints and drop its survivors.
    Simulated by re-running batch 0 against the same sinks with a fresh
    checkpoint — an exact replay."""
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),  # in-batch dup of 1
        (3, "completely different text"),
    ]
    _run_drop(spark, src, store, out, str(tmp_path / "ckpt1"), [])
    # first full run
    spark.createDataFrame([], "doc_id bigint, text string")  # no-op
    _run_drop(spark, src, store, out, str(tmp_path / "ckpt2"), rows)
    kept1 = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert kept1 == [1, 3]

    # replay: same source files, fresh checkpoint → batch 0 again
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    q = stream_neardup_dedup(
        stream,
        store_path=store,
        out_path=out,
        checkpoint_dir=str(tmp_path / "ckpt3"),
        radius=0,
    )
    q.awaitTermination(120)
    kept2 = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert kept2 == [1, 3], "replay duplicated or dropped sink rows"
    store_ids = sorted(r.doc_id for r in spark.read.parquet(store).collect())
    assert store_ids == [1, 3]


def test_legacy_store_without_batch_id_still_dedupes(spark, tmp_path):
    """Fingerprints written by a pre-partitioning release have no
    _batch_id column (reads back NULL); the current-batch exclusion
    must be null-safe or the whole historical store silently drops out
    of the corpus side and every historical dup gets re-admitted."""
    from vectra_py_spark.operators.dedup import simhash

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # legacy-format store: flat parquet, no _batch_id partition dirs
    legacy = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id bigint, text string"
    )
    simhash(legacy).select("doc_id", "simhash16").write.parquet(store)

    _run_drop(
        spark, src, store, out, ckpt,
        [
            (4, "alpha beta gamma delta"),   # dup of the LEGACY doc
            (5, "brand new words entirely"),
        ],
    )
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept == {5}


def test_stream_kmeans_carries_centroid_state_across_runs(spark, tmp_path):
    """Mini-batch k-means: the second drained run must assign against
    centroids accumulated from the first (store-carried state), and a
    vector equal to first-run data must land in that data's cluster."""
    from vectra_py_spark.streaming.kmeans import stream_kmeans

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drop(rows):
        spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        ).write.mode("append").parquet(src)
        stream = spark.readStream.schema(
            "vec_id bigint, embedding array<double>"
        ).parquet(src)
        q = stream_kmeans(
            stream, store_path=store, out_path=out,
            checkpoint_dir=ckpt, k=2,
        )
        q.awaitTermination(120)

    # two tight groups; seeds = ids 1, 2 (one from each group)
    drop([
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),
        (3, [0.9, 0.1]),
        (4, [0.1, 0.9]),
    ])
    a1 = {r.vec_id: r.cluster for r in spark.read.parquet(out).collect()}
    assert a1[1] == a1[3] and a1[2] == a1[4] and a1[1] != a1[2]

    # second run: assignment uses STORE state (running means), not seeds
    drop([
        (10, [0.95, 0.05]),   # group of 1/3
        (11, [0.05, 0.95]),   # group of 2/4
    ])
    a2 = {r.vec_id: r.cluster for r in spark.read.parquet(out).collect()}
    assert a2[10] == a1[1] and a2[11] == a1[2]
    # store carries per-(cluster, dim) running sums for both batches
    st = spark.read.parquet(store)
    assert {r._batch_id for r in st.select("_batch_id").distinct().collect()} >= {0}
    tot = st.groupBy().sum("n").collect()[0][0]
    assert tot == 6 * 2  # 6 vectors x 2 dims


def test_km_store_absent_seeds_but_transient_failure_propagates(
    spark, tmp_path
):
    """ADVICE r3 guard: an ABSENT store (first batch) seeds an empty
    state frame, but any OTHER store-read failure (permissions, FS
    hiccup, corruption) must PROPAGATE and fail the batch — silently
    re-seeding centroids against a store that exists-but-didn't-read
    would corrupt the running clustering with no error."""
    from pyspark.errors import AnalysisException

    from vectra_py_spark.streaming.kmeans import _read_km_store

    # absent path -> empty seed frame, no raise
    seed = _read_km_store(spark, str(tmp_path / "never_written"))
    assert seed.count() == 0

    # non-PATH AnalysisException -> must propagate untouched
    class _Reader:
        def schema(self, _s):
            return self

        def parquet(self, _p):
            raise AnalysisException(
                "[INSUFFICIENT_PERMISSIONS] simulated transient FS failure"
            )

    class _FakeSpark:
        read = _Reader()

    with pytest.raises(AnalysisException, match="INSUFFICIENT_PERMISSIONS"):
        _read_km_store(_FakeSpark(), str(tmp_path / "store"))
