"""Pre-staged round-11 registry entries, validated through the
driver's exact compare harness BEFORE they enter the window — so the
round-11 rotation adds them with evidence already in hand (the same
discipline that staged round 10's four crawl entries in round 9; see
COVERAGE.md's budget policy)."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from oracle_harness import compare  # noqa: E402

from vectra_py_spark.plans.entry_queries import (  # noqa: E402
    _CLF_FEATURES,
    _sql_audio_neardup,
    _sql_bitext_mine,
    _sql_image_neardup,
    _sql_feed_entries,
    _sql_fetch_schedule,
    _sql_host_components,
    _sql_host_hits,
    _sql_html_tables,
    _sql_mojibake_repair,
    _sql_textclf_score,
    _sql_textclf_train,
    q_audio_neardup,
    q_bitext_mine,
    q_image_neardup,
    q_feed_entries,
    q_fetch_schedule,
    q_host_components,
    q_host_hits,
    q_html_tables,
    q_mojibake_repair,
    q_textclf_score,
    q_textclf_train,
)

pytestmark = pytest.mark.slow  # excluded from the smoke tier

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

PRESTAGED = [
    (q_html_tables, _sql_html_tables),
    (q_mojibake_repair, _sql_mojibake_repair),
    (q_textclf_score, _sql_textclf_score),
    (q_textclf_train, _sql_textclf_train),
    (q_feed_entries, _sql_feed_entries),
    (q_bitext_mine, _sql_bitext_mine),
    (q_image_neardup, _sql_image_neardup),
    (q_audio_neardup, _sql_audio_neardup),
    (q_fetch_schedule, _sql_fetch_schedule),
    (q_host_components, _sql_host_components),
    (q_host_hits, _sql_host_hits),
]


@pytest.mark.parametrize(
    "qfn,sfn", PRESTAGED, ids=[q.__name__ for q, _ in PRESTAGED]
)
@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_prestaged_oracle(spark, sf_dir, qfn, sfn):
    ok, detail = compare(spark, sf_dir, qfn(spark, sf_dir), sfn())
    assert ok, detail


def test_textclf_score_vocab_is_collision_free(spark):
    """q_textclf_score's closed-form margin assumes no two grams of
    the synthetic vocabulary share a hash bucket — pin it (xxhash64 is
    fixed, so green once means green forever)."""
    from pyspark.sql import functions as F

    grams = [
        "good", "spam", "pad",
        "good good", "good spam", "spam spam",
        "spam pad", "good pad", "pad good", "pad spam",
    ]
    df = spark.createDataFrame([(g,) for g in grams], "g STRING")
    idxs = [
        r.idx
        for r in df.select(
            F.pmod(F.xxhash64("g"), F.lit(_CLF_FEATURES)).alias("idx")
        ).collect()
    ]
    assert len(set(idxs)) == len(idxs)
