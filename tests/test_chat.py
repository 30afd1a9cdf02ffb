"""Conversation (SFT) operators (`operators/chat.py`): JSON parsing +
quarantine, the structural validation contract, per-conversation
stats, fingerprint dedup, and the DuckDB parse twin."""

import json

import duckdb
import pytest
from pyspark.sql import functions as F

from vectra_py_spark.operators.chat import (
    conversation_stats,
    dedup_conversations,
    parse_conversations,
    parse_conversations_sql,
    validate_conversations,
)


def conv(*turns):
    return json.dumps([{"role": r, "content": c} for r, c in turns])


@pytest.fixture(scope="module")
def convs(spark):
    rows = [
        # 0: canonical valid conversation with a system turn
        (0, conv(("system", "be terse"), ("user", "hi"),
                 ("assistant", "hello"))),
        # 1: valid, two rounds, no system
        (1, conv(("user", "a"), ("assistant", "b"),
                 ("user", "c"), ("assistant", "d"))),
        # 2: consecutive users + blank assistant + dangling user
        (2, conv(("user", "q1"), ("user", "q2"),
                 ("assistant", "  "), ("user", "q3"))),
        # 3: unknown role mid-conversation
        (3, conv(("user", "x"), ("tool", "t"), ("assistant", "y"))),
        # 4: system AFTER a user turn (placement violation)
        (4, conv(("user", "x"), ("system", "late"), ("assistant", "y"))),
        # 5: assistant speaks first
        (5, conv(("assistant", "preemptive"), ("user", "ok"))),
        # 6: bare object, not an array -> error (explicit guard; Spark
        #    from_json would otherwise coerce it to a 1-elem array)
        (6, '{"role": "user", "content": "x"}'),
        # 7: truncated JSON -> error
        (7, '[{"role": "user", "content": "x"'),
        # 8: empty array
        (8, "[]"),
        # 9: NULL payload -> error
        (9, None),
        # 10: duplicate of 0 modulo whitespace/case in the assistant turn
        (10, conv(("system", "be friendly"), ("user", "hi there"),
                  ("assistant", "  HELLO\n"))),
        # 11: only system turns -> no core, invalid
        (11, conv(("system", "a"), ("system", "b"))),
    ]
    return spark.createDataFrame(rows, "conv_id bigint, messages string")


def test_parse_kinds_and_quarantine(spark, convs):
    turns = parse_conversations(convs).cache()
    kinds = {
        r.conv_id: r.kind
        for r in turns.groupBy("conv_id")
        .agg(F.max("kind").alias("kind")).collect()
    }
    assert kinds[6] == "error" and kinds[7] == "error" and kinds[9] == "error"
    assert kinds[8] == "empty"
    got = turns.where("conv_id = 1").orderBy("turn_idx").collect()
    assert [(t.turn_idx, t.role, t.content) for t in got] == [
        (0, "user", "a"), (1, "assistant", "b"),
        (2, "user", "c"), (3, "assistant", "d"),
    ]
    err = turns.where("conv_id = 6").first()
    assert err.turn_idx == -1 and err.content == "not a JSON message array"


@pytest.mark.slow
def test_parse_matches_duckdb_twin(spark, convs):
    turns = parse_conversations(convs)
    got = sorted(
        (r.conv_id, r.turn_idx, r.role, r.content, r.kind)
        for r in turns.collect()
    )
    con = duckdb.connect()
    pdf = convs.toPandas()
    con.register("conversations", pdf)
    want = sorted(
        tuple(r)
        for r in con.execute(parse_conversations_sql()).fetchall()
    )
    assert got == want


@pytest.mark.slow
def test_parse_twin_non_object_elements(spark):
    """Engine-parity pin for the non-object-element rule (review r12):
    '[1,2]' and mixed arrays quarantine in BOTH engines; '[null]' is a
    legal null turn in BOTH (Spark from_json keeps null elements)."""
    rows = [
        (0, "[1, 2]"),                                   # error
        (1, "[null]"),                                   # one null turn
        (2, '[{"role": "user", "content": "a"}, 7]'),    # error
        (3, '[{"role": "user", "content": "a"}, null]'), # turn + null turn
        (4, "[[1], [2]]"),                               # error
        (5, '["a"]'),                                    # error
    ]
    df = spark.createDataFrame(rows, "conv_id bigint, messages string")
    got = sorted(
        (r.conv_id, r.turn_idx, r.role, r.content, r.kind)
        for r in parse_conversations(df).collect()
    )
    con = duckdb.connect()
    con.register("conversations", df.toPandas())
    want = sorted(
        tuple(r)
        for r in con.execute(parse_conversations_sql()).fetchall()
    )
    assert got == want
    kinds = {cid: k for cid, _, _, _, k in got}
    assert kinds[0] == kinds[2] == kinds[4] == kinds[5] == "error"
    assert kinds[1] == "turn" and kinds[3] == "turn"


def test_validation_flags(spark, convs):
    v = validate_conversations(parse_conversations(convs))
    rows = {r.conv_id: r for r in v.collect()}
    assert rows[0].valid and rows[1].valid
    r2 = rows[2]
    assert r2.broken_alternation and r2.empty_content and r2.dangling_user
    assert not r2.valid
    assert rows[3].unknown_role and rows[3].broken_alternation
    assert rows[4].bad_system_placement and not rows[4].valid
    assert rows[5].bad_first_role and not rows[5].valid
    assert rows[6].has_error and rows[6].n_turns == 0 and not rows[6].valid
    assert rows[8].is_empty and not rows[8].valid
    assert rows[9].has_error
    # only-system conversation: no flag fires but there is no core turn
    r11 = rows[11]
    assert not r11.bad_first_role and not r11.valid and r11.n_turns == 2


@pytest.mark.slow
def test_stats(spark, convs):
    s = conversation_stats(parse_conversations(convs))
    r1 = s.where("conv_id = 1").first()
    assert (r1.n_turns, r1.n_user, r1.n_assistant, r1.n_system) == (4, 2, 2, 0)
    assert r1.user_words == 2 and r1.assistant_words == 2
    r2 = s.where("conv_id = 2").first()
    # blank assistant content counts 0 words but its chars (2 spaces)
    assert r2.assistant_words == 0 and r2.assistant_chars == 2


def test_dedup_on_assistant_transcript(spark, convs):
    d = dedup_conversations(parse_conversations(convs))
    rows = {r.conv_id: r for r in d.collect()}
    # 0 and 10 share the normalized assistant transcript "hello"
    assert rows[0].fingerprint == rows[10].fingerprint
    assert rows[10].canonical_id == 0 and not rows[10].is_canonical
    assert rows[0].is_canonical and rows[0].n_copies == 2
    # 1 is unique
    assert rows[1].n_copies == 1 and rows[1].is_canonical
    # all conversations appear, even all-error ones (empty transcript)
    assert len(rows) == 12


@pytest.mark.slow
def test_dedup_plan_single_digest_shuffle(spark, convs):
    plan = dedup_conversations(
        parse_conversations(convs)
    )._jdf.queryExecution().executedPlan().toString()
    # transcript concat groupBy + fingerprint window share the digest
    # key; no Python stage anywhere
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


@pytest.mark.slow
def test_parse_total_on_adversarial_payloads(spark):
    """The quarantine contract is TOTAL: any payload string yields
    exactly one classification (turn rows with contiguous 0..n-1
    indices, one empty row, or one error row) and never raises —
    one pass over a hostile corpus."""
    payloads = [
        "", " ", "null", "true", "0", "-1.5e300", '"just a string"',
        "[", "]", "[[", "[]]", "{}", "[{}]", "[{}, {}]",
        '[{"role": null, "content": null}]',
        '[{"role": 5, "content": {"x": 1}}]',      # wrong types
        '[{"content": "no role"}]',
        '[{"role": "user"}]',
        '[[1, 2], [3]]',                           # arrays of arrays
        '[{"role": "user", "content": "a"}, 7]',   # mixed elements
        '[{"role": "user", "content": "' + "x" * 5000 + '"}]',
        '[{"role": "\\u0000", "content": "\\ud83d\\ude00 ünïcode"}]',
        "[{\"role\": \"user\", \"content\": \"tab\tnewline\nquote\\\"\"}]",
        '   [  {"role": "user", "content": "leading ws"} ]  ',
        "\t[]", "\n{}", "[nonsense]", "[{]}",
        '{"messages": [{"role": "user", "content": "nested"}]}',
        "[" + ",".join('{"role":"user","content":"%d"}' % i
                       for i in range(200)) + "]",
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)],
        "conv_id bigint, messages string",
    )
    turns = parse_conversations(df).collect()
    by_conv: dict = {}
    for r in turns:
        by_conv.setdefault(r.conv_id, []).append(r)
    assert set(by_conv) == set(range(len(payloads)))  # total, no loss
    for cid, rows in by_conv.items():
        kinds = {r.kind for r in rows}
        if kinds == {"turn"}:
            idxs = sorted(r.turn_idx for r in rows)
            assert idxs == list(range(len(rows))), cid
        else:
            # empty/error conversations are exactly one row
            assert len(rows) == 1 and rows[0].turn_idx == -1, cid
            assert kinds <= {"empty", "error"}
    # validation is total over the same frame
    v = validate_conversations(parse_conversations(df))
    assert v.count() == len(payloads)
