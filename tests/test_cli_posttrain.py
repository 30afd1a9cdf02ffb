"""Post-training CLI verbs (`cli.py`): chat-curate over a JSONL dump,
bt-rank over a comparisons parquet, eval-gen over a pairs parquet —
all index-free (no --index demanded, the dedup-media rule)."""

import json
import os
import tempfile

import pytest

from vectra_py_spark.cli import main

pytestmark = pytest.mark.slow  # CLI e2e lives in the slow tier


def run_cli(capsys, argv):
    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def test_chat_curate(spark, capsys, tmp_path):
    drop = tmp_path / "convs"
    drop.mkdir()
    lines = [
        # INVALID twin with the same assistant transcript as conv 1 and
        # a smaller id: dedup runs among VALID conversations only, so
        # this must NOT become the canonical and erase conv 1 (review
        # r12 regression)
        json.dumps({"conv_id": 0, "messages": [
            {"role": "user", "content": "hey"},
            {"role": "assistant", "content": "HELLO "},
            {"role": "user", "content": "dangling"},
        ]}),
        json.dumps({"conv_id": 1, "messages": [
            {"role": "user", "content": "hi"},
            {"role": "assistant", "content": "hello"},
        ]}),
        # duplicate assistant transcript of conv 1 -> dedup-dropped
        json.dumps({"conv_id": 2, "messages": [
            {"role": "user", "content": "hi again"},
            {"role": "assistant", "content": "HELLO  "},
        ]}),
        # dangling user -> invalid
        json.dumps({"conv_id": 3, "messages": [
            {"role": "user", "content": "no answer"},
        ]}),
        "garbage line",
    ]
    (drop / "a.jsonl").write_text("\n".join(lines) + "\n")
    out = tmp_path / "turns"
    rc, rep = run_cli(capsys, [
        "chat-curate", "--path", str(drop), "--out", str(out),
    ])
    assert rc == 0
    assert rep["conversations"] == 5
    assert rep["valid"] == 2
    assert rep["errors"] == 1
    assert rep["valid_dup_dropped"] == 1
    kept = spark.read.parquet(str(out))
    # conv ids are STRINGS now (the ShareGPT shape survives verbatim)
    assert {r.conv_id for r in kept.select("conv_id").collect()} == {"1"}


def test_bt_rank(spark, capsys, tmp_path):
    comps = spark.createDataFrame(
        [("a", "b")] * 3 + [("b", "c")] * 2 + [("c", "a")],
        "winner string, loser string",
    )
    src = tmp_path / "comps"
    comps.write.parquet(str(src))
    rc, rep = run_cli(capsys, [
        "bt-rank", "--path", str(src), "--iterations", "4", "--top", "2",
    ])
    assert rc == 0
    board = rep["leaderboard"]
    assert len(board) == 2 and board[0]["item"] == "a"
    assert board[0]["strength"] >= board[1]["strength"]
    assert board[0]["wins"] == 3


def test_eval_gen(spark, capsys, tmp_path):
    pairs = spark.createDataFrame(
        [
            (0, "the cat sat", "the cat sat"),
            (1, "a dog ran far", "a dog ran very far"),
        ],
        "pair_id bigint, candidate string, reference string",
    )
    src = tmp_path / "pairs"
    pairs.write.parquet(str(src))
    rc, rep = run_cli(capsys, ["eval-gen", "--path", str(src)])
    assert rc == 0
    assert rep["n_pairs"] == 2
    assert 0.0 < rep["bleu"] <= 1.0
    assert rep["p1"] == 1.0  # every candidate unigram appears in its ref
    assert 0.0 < rep["rouge1_f_mean"] <= 1.0


def test_verbs_do_not_demand_index(capsys, tmp_path):
    # an empty folder still runs (0 conversations), proving --index is
    # not demanded for the post-training verbs
    drop = tmp_path / "empty"
    drop.mkdir()
    (drop / "a.jsonl").write_text("\n")
    rc, rep = run_cli(capsys, ["chat-curate", "--path", str(drop)])
    assert rc == 0 and rep["conversations"] in (0, 1)
