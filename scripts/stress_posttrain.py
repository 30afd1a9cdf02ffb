#!/usr/bin/env python
"""Scale stress for the round-12 post-training layer: conversation
parsing/validation/dedup (chat.py — from_json + one conv-keyed
shuffle + one digest shuffle), preference validation + Bradley–Terry
MM fit (preference.py — digest window/self-join; per-iteration joins
over the directed games frame), and BLEU / ROUGE-L generation eval
(geneval.py — tagged-n-gram explode + (id, n, gram) equi-join; the
bounded mapInPandas LCS). Each at 1x and 10x; vs_10x ratio ≤ ~1 means
the plan scales at worst linearly on a fixed-parallelism box.

All inputs synthesize IN SPARK (codegen'd concat over a range — the
driver never materializes the corpora), so the measured work is the
operator, not a createDataFrame upload.

Usage: python scripts/stress_posttrain.py
Output: one JSON line; paste the numbers into BENCH.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from vectra_py_spark.session import get_spark  # noqa: E402

N_CONVS_1X = 50_000     # ~8 turns each
N_PREFS_1X = 200_000    # preference triples
N_COMPS_1X = 200_000    # comparisons over 1,000 items
N_PAIRS_1X = 50_000     # cand/ref text pairs, ~24 ref tokens


def timed(fn):
    t0 = time.monotonic()
    n = fn()
    return round(time.monotonic() - t0, 3), n


def synth_convs(spark, n: int):
    """Valid 3-round conversations; every 7th conversation repeats the
    transcript of its (id - 7) twin's assistant side (dedup signal);
    every 31st is malformed (quarantine path exercised)."""
    d = F.col("id")
    # assistant content keys on id//7 for the dup structure
    a = (d - d % 7).cast("string")
    s = d.cast("string")

    def rnd(j: int):
        return F.concat(
            F.lit(',{"role":"user","content":"question %d for ' % j), s,
            F.lit(' alpha beta"},{"role":"assistant","content":"answer'
                  ' %d of ' % j),
            a, F.lit(' gamma delta epsilon"}'),
        )

    good = F.concat(
        F.lit('[{"role":"system","content":"be helpful"}'),
        rnd(0), rnd(1), rnd(2), F.lit("]"),
    )
    payload = F.when(d % 31 == 0, F.lit('{"broken": ')).otherwise(good)
    return spark.range(n).select(
        d.alias("conv_id"), payload.alias("messages")
    )


def synth_prefs(spark, n: int):
    d = F.col("id")
    groups = n // 20  # 20-copy duplicate-triple groups
    g = (d % groups).cast("string")
    # one member (k=0) of every 5th GROUP is the mirrored conflict, so
    # 20% of groups conflict and 80% keep one valid canonical row
    mirror = (d < groups) & (d % 5 == 0)
    return spark.range(n).select(
        F.concat(F.lit("prompt "), g).alias("prompt"),
        F.when(mirror, F.concat(F.lit("resp B "), g))
        .otherwise(F.concat(F.lit("resp A "), g)).alias("chosen"),
        F.when(mirror, F.concat(F.lit("resp A "), g))
        .otherwise(F.concat(F.lit("resp B "), g)).alias("rejected"),
    )


def synth_comps(spark, n: int, items: int = 1000):
    d = F.col("id")
    return spark.range(n).select(
        (d % items).alias("winner"),
        ((d * 7 + 3) % items).alias("loser"),
    ).filter(F.col("winner") != F.col("loser"))


def synth_textpairs(spark, n: int):
    d = F.col("id")
    s = d.cast("string")
    word = lambda k: F.concat(  # noqa: E731
        F.lit("w"), ((d + k) % 211).cast("string")
    )
    ref = F.concat_ws(
        " ", *[word(k) for k in range(24)]
    )
    cand = F.concat_ws(
        " ", *[word(k) for k in range(0, 16, 2)],
        F.concat(F.lit("x"), s),
        *[word(k) for k in range(16, 22)],
    )
    return spark.range(n).select(
        d.alias("pair_id"), cand.alias("candidate"), ref.alias("reference")
    )


def main() -> None:
    from vectra_py_spark.operators.chat import (
        conversation_stats,
        dedup_conversations,
        parse_conversations,
        validate_conversations,
    )
    from vectra_py_spark.operators.geneval import (
        bleu_corpus,
        bleu_pairs,
        rouge_l_pairs,
    )
    from vectra_py_spark.operators.preference import (
        bradley_terry_fit,
        validate_preference_pairs,
    )

    spark = get_spark("stress-posttrain")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    # warmup (JIT/codegen) — every measured path, discarded
    wturns = parse_conversations(synth_convs(spark, 2_000))
    validate_conversations(wturns).count()
    conversation_stats(wturns).count()
    dedup_conversations(wturns).count()
    validate_preference_pairs(synth_prefs(spark, 2_000)).count()
    bradley_terry_fit(synth_comps(spark, 2_000), iterations=2).count()
    wpairs = synth_textpairs(spark, 2_000)
    bleu_pairs(wpairs).agg(F.sum("bleu")).first()
    bleu_corpus(wpairs).first()
    rouge_l_pairs(wpairs).agg(F.sum("lcs_len")).first()

    for mult in (1, 10):
        tag = f"{mult}x"
        convs = synth_convs(spark, N_CONVS_1X * mult)
        turns = parse_conversations(convs)
        out[f"chat_parse_validate_{tag}"] = timed(
            lambda: validate_conversations(turns).count()
        )
        out[f"chat_stats_{tag}"] = timed(
            lambda: conversation_stats(turns).count()
        )
        out[f"chat_dedup_{tag}"] = timed(
            lambda: dedup_conversations(turns)
            .where(~F.col("is_canonical")).count()
        )
        prefs = synth_prefs(spark, N_PREFS_1X * mult)
        out[f"pref_validate_{tag}"] = timed(
            lambda: validate_preference_pairs(prefs)
            .where(F.col("valid")).count()
        )
        comps = synth_comps(spark, N_COMPS_1X * mult)
        out[f"bt_fit3_{tag}"] = timed(
            lambda: bradley_terry_fit(
                comps, iterations=3, broadcast_strengths=True
            ).count()
        )
        pairs = synth_textpairs(spark, N_PAIRS_1X * mult)
        # force the metric VALUES, not just cardinality — under count()
        # Catalyst can prune the unique-keyed left join and skip the
        # n-gram aggregates entirely
        out[f"bleu_pairs_{tag}"] = timed(
            lambda: int(
                bleu_pairs(pairs).agg(F.sum("bleu")).first()[0] or 0
            )
        )
        out[f"bleu_corpus_{tag}"] = timed(
            lambda: int(bleu_corpus(pairs).first().bleu * 1e6)
        )
        out[f"rouge_l_{tag}"] = timed(
            lambda: int(
                rouge_l_pairs(pairs).agg(F.sum("lcs_len")).first()[0]
            )
        )

    ratios = {
        k[:-3]: round(out[f"{k[:-3]}_10x"][0] / (10 * out[k][0]), 2)
        for k in list(out)
        if k.endswith("_1x") and out[k][0] > 0
    }
    print(json.dumps({"walls": out, "vs_10x": ratios}))
    spark.stop()


if __name__ == "__main__":
    main()
