"""Pre-staged round-13 registry entries, validated through the
driver's exact compare harness BEFORE they enter the window — so the
round-13 rotation adds them with evidence already in hand (the
discipline that staged r11's eleven entries in r10 and r12's six in
r11; see COVERAGE.md's budget policy). The six round-12 entries
(video_neardup, bitext_shards, image_text_pairs, subtitle_clips,
retrieval_eval, webdataset_roundtrip) GRADUATED into the registry this
round and are now swept by tests/test_entry_oracle.py like every
registered query."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))

from oracle_harness import compare  # noqa: E402

from vectra_py_spark.plans.entry_queries import (  # noqa: E402
    _CLF_FEATURES,
    _sql_chat_turns,
    _sql_chrf_eval,
    _sql_generation_eval,
    _sql_preference_fit,
    _sql_webdataset_sized,
    q_chat_turns,
    q_chrf_eval,
    q_generation_eval,
    q_preference_fit,
    q_webdataset_sized,
)

pytestmark = pytest.mark.slow  # excluded from the smoke tier

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

# (query_fn, oracle_sql_fn) pairs staged for the round-13 window.
PRESTAGED: list = [
    (q_webdataset_sized, _sql_webdataset_sized),
    (q_chat_turns, _sql_chat_turns),
    (q_preference_fit, _sql_preference_fit),
    (q_generation_eval, _sql_generation_eval),
    (q_chrf_eval, _sql_chrf_eval),
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
