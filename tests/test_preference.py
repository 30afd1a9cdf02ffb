"""Preference-pair operators (`operators/preference.py`): validation
flags, the win matrix, and the Bradley–Terry MM fit (numpy parity +
MLE sanity + plan hygiene)."""

import pytest
from pyspark.sql import functions as F

from vectra_py_spark.operators.preference import (
    bradley_terry_fit,
    pairwise_wins,
    validate_preference_pairs,
)


@pytest.fixture(scope="module")
def pairs(spark):
    rows = [
        # prompt, chosen, rejected
        ("p1", "good answer", "bad answer"),          # clean
        ("p1", "good  ANSWER", "bad answer"),         # dup modulo ws/case
        ("p1", "bad answer", "good answer"),          # mirror -> conflict
        ("p2", "same", "same"),                       # identical sides
        ("p2", "x", None),                            # empty side
        ("p3", "alpha", "beta"),                      # clean, unique
    ]
    return spark.createDataFrame(
        rows, "prompt string, chosen string, rejected string"
    )


def test_validate_flags(pairs):
    v = validate_preference_pairs(pairs).collect()
    by = {}
    for r in v:
        by.setdefault((r.prompt, r.chosen, r.rejected), r)
    # canonical = first by RAW triple bytes: "good  ANSWER" (double
    # space, 0x20 < 'a') sorts before "good answer"
    dup = by[("p1", "good  ANSWER", "bad answer")]
    assert dup.n_copies == 2 and dup.is_canonical and dup.conflicting
    dup2 = by[("p1", "good answer", "bad answer")]
    assert not dup2.is_canonical and dup2.conflicting
    mirror = by[("p1", "bad answer", "good answer")]
    assert mirror.conflicting and not mirror.valid
    assert by[("p2", "same", "same")].identical_sides
    assert by[("p2", "x", None)].empty_side
    clean = by[("p3", "alpha", "beta")]
    assert clean.valid and clean.n_copies == 1 and not clean.conflicting


@pytest.mark.slow
def test_pairwise_wins(spark):
    comps = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "a"), ("c", "a")],
        "winner string, loser string",
    )
    m = {(r.item_a, r.item_b): r for r in pairwise_wins(comps).collect()}
    ab = m[("a", "b")]
    assert (ab.wins_a, ab.wins_b, ab.n_games) == (2, 1, 3)
    ac = m[("a", "c")]
    assert (ac.wins_a, ac.wins_b, ac.n_games) == (0, 1, 1)


def _mm_numpy(comps, iterations):
    """Reference MM implementation (Hunter 2004) over a comparison
    list — the oracle for the DataFrame fit."""
    items = sorted({x for c in comps for x in c})
    wins = {i: 0 for i in items}
    games: dict = {}
    for w, l in comps:
        wins[w] += 1
        games[(w, l)] = games.get((w, l), 0) + 1
        games[(l, w)] = games.get((l, w), 0) + 1
    s = {i: 1.0 for i in items}
    for _ in range(iterations):
        new = {}
        for i in items:
            d = sum(
                n / (s[i] + s[j])
                for (a, j), n in games.items()
                if a == i
            )
            new[i] = wins[i] / d
        s = new
    return s, wins


def test_bt_fit_matches_numpy(spark):
    comps = [
        ("a", "b"), ("a", "b"), ("a", "c"), ("b", "c"),
        ("c", "b"), ("a", "d"), ("d", "b"), ("b", "d"),
    ]
    df = spark.createDataFrame(comps, "winner string, loser string")
    got = {
        r.item: r
        for r in bradley_terry_fit(df, iterations=4).collect()
    }
    want, wins = _mm_numpy(comps, 4)
    total = sum(want.values())
    for i, s in want.items():
        assert got[i].strength == pytest.approx(s, abs=2e-6)
        assert got[i].strength_norm == pytest.approx(s / total, abs=2e-6)
        assert got[i].wins == wins[i]


@pytest.mark.slow
def test_bt_zero_win_item_goes_to_zero(spark):
    df = spark.createDataFrame(
        [("a", "z"), ("b", "z"), ("a", "b"), ("b", "a")],
        "winner string, loser string",
    )
    got = {r.item: r for r in bradley_terry_fit(df, iterations=3).collect()}
    assert got["z"].strength == 0.0 and got["z"].wins == 0
    assert got["z"].n_games == 2
    # a and b are symmetric (each beat z once, split head-to-head):
    # equal positive strengths
    assert got["a"].strength == got["b"].strength > 0


@pytest.mark.slow
def test_bt_order_invariance(spark):
    comps = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "a")]
    df1 = spark.createDataFrame(comps, "winner string, loser string")
    df2 = spark.createDataFrame(comps[::-1], "winner string, loser string")
    r1 = sorted(
        (r.item, r.strength) for r in bradley_terry_fit(df1, iterations=3).collect()
    )
    r2 = sorted(
        (r.item, r.strength) for r in bradley_terry_fit(df2, iterations=3).collect()
    )
    assert r1 == r2


@pytest.mark.slow
def test_bt_no_python_stages(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "winner string, loser string"
    )
    plan = (
        bradley_terry_fit(df, iterations=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
