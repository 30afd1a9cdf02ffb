"""Streaming conversation ingest (`streaming/chat.py`): streamed turn
rows equal the batch parse on identical payloads, string conv_ids
(the ShareGPT/OASST shape) pass through, malformed/id-less lines
quarantine instead of vanishing, incremental drops process exactly
once, and the sink feeds the validator directly."""

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.slow  # streaming twins live in the slow tier

CONVS = [
    {"conv_id": 1, "messages": [
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "hello"},
    ]},
    # string id — the ShareGPT/OASST interchange shape
    {"conv_id": "identity_0", "messages": [
        {"role": "system", "content": "be terse"},
        {"role": "user", "content": "q"},
        {"role": "assistant", "content": "a"},
    ]},
    {"conv_id": 3, "messages": []},
]


def _write_jsonl(path, objs, extra_lines=()):
    with open(path, "w") as f:
        for o in objs:
            f.write(json.dumps(o) + "\n")
        for line in extra_lines:
            f.write(line + "\n")


def test_stream_matches_batch_and_quarantines(spark):
    from vectra_py_spark.operators.chat import (
        parse_conversations,
        validate_conversations,
    )
    from vectra_py_spark.streaming.chat import (
        conversation_file_stream,
        stream_conversation_turns,
    )

    drop = tempfile.mkdtemp()
    sink = tempfile.mkdtemp() + "/out"
    ckpt = tempfile.mkdtemp() + "/ckpt"
    # file 1: two clean conversations + one id-less garbage line
    _write_jsonl(
        os.path.join(drop, "a.jsonl"), CONVS[:2],
        extra_lines=["this is not json at all"],
    )
    q = stream_conversation_turns(
        conversation_file_stream(spark, drop), sink, ckpt
    )
    q.awaitTermination(120)
    streamed = spark.read.parquet(sink)

    batch = parse_conversations(
        spark.createDataFrame(
            [
                (str(o["conv_id"]), json.dumps(o["messages"]))
                for o in CONVS[:2]
            ],
            "conv_id string, messages string",
        )
    )
    key = lambda r: (r.conv_id, r.turn_idx, r.role, r.content, r.kind)  # noqa: E731
    real = streamed.where(~F.col("conv_id").startswith("_line_"))
    got = sorted(map(key, real.collect()))
    assert got == sorted(map(key, batch.collect()))
    # the string id came through verbatim
    assert any(k[0] == "identity_0" for k in got)
    # the garbage line quarantined under its synthetic id
    errs = streamed.where(F.col("conv_id").startswith("_line_")).collect()
    assert len(errs) == 1 and errs[0].kind == "error"

    # incremental drop: a second file processes exactly once (batch-id
    # checkpoint), including the empty-array conversation
    _write_jsonl(os.path.join(drop, "b.jsonl"), CONVS[2:])
    q2 = stream_conversation_turns(
        conversation_file_stream(spark, drop), sink, ckpt
    )
    q2.awaitTermination(120)
    after = spark.read.parquet(sink)
    assert after.count() == len(got) + 1 + 1  # + error row + empty row
    empty = after.where("conv_id = '3'").collect()
    assert len(empty) == 1 and empty[0].kind == "empty"

    # the sink is validator-shaped: hygiene straight off parquet
    v = {r.conv_id: r for r in validate_conversations(after).collect()}
    assert v["1"].valid and v["identity_0"].valid
    assert not v["3"].valid and v["3"].is_empty
