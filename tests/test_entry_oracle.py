"""Driver-contract parity: every queries() entry hash-matches its DuckDB
oracle at sf0.001 (fast) and sf0.01 (the driver's actual gate)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.oracle_harness import compare

NAMES = sorted(entry_mod.queries().keys())


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_every_query_has_callable():
    qs = entry_mod.queries()
    for name, fn in qs.items():
        assert callable(fn), name


@pytest.mark.slow
@pytest.mark.parametrize("name", NAMES)
def test_oracle_sf_smoke(spark, name):
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    if name not in oracles:
        df = qs[name](spark, SF_SMOKE)
        assert df.count() >= 0
        return
    ok, detail = compare(spark, SF_SMOKE, qs[name](spark, SF_SMOKE), oracles[name])
    assert ok, f"{name}: {detail}"


@pytest.mark.slow
@pytest.mark.parametrize("name", NAMES)
def test_oracle_sf_driver_gate(spark, name):
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    if name not in oracles:
        df = qs[name](spark, SF_ORACLE)
        assert df.count() >= 0
        return
    ok, detail = compare(spark, SF_ORACLE, qs[name](spark, SF_ORACLE), oracles[name])
    assert ok, f"{name}: {detail}"


def test_driver_check_window_is_exactly_priority_50():
    """The correctness driver oracles the FIRST 50 registry entries;
    _CHECK_FIRST is that evidence policy. Guard: it stays exactly 50
    names, all registered, all oracle-able (a rows-only query would
    waste a window slot), and the registry leads with it verbatim."""
    from vectra_py_spark.plans.entry_queries import _CHECK_FIRST

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert len(_CHECK_FIRST) == 50
    assert list(qs)[:50] == _CHECK_FIRST
    missing = [n for n in _CHECK_FIRST if n not in oracles]
    assert not missing, f"window slots without oracles: {missing}"


# ---------------------------------------------------------------------------
# Retired registry entries (round 11, VERDICT r10 item 2): driver-window
# slots released, but correctness evidence continues here — the same
# compare harness, both SFs, every round.
# ---------------------------------------------------------------------------
from vectra_py_spark.plans.entry_queries import (  # noqa: E402
    RETIRED_ORACLES,
    RETIRED_QUERIES,
)

RETIRED_NAMES = sorted(RETIRED_QUERIES.keys())


def test_retired_entries_left_the_registry():
    """Guard: a retired entry must be fully subsumed — absent from the
    driver export (queries() AND oracle_sql()) but still oracle-able
    here, so retirement never silently drops correctness evidence."""
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    for name in RETIRED_NAMES:
        assert name not in qs, f"{name} retired but still exported"
        assert name not in oracles, f"{name} retired but still exported"
        assert name in RETIRED_ORACLES, f"{name} retired without an oracle"


@pytest.mark.slow
@pytest.mark.parametrize("name", RETIRED_NAMES)
def test_retired_oracle_sf_smoke(spark, name):
    ok, detail = compare(
        spark, SF_SMOKE, RETIRED_QUERIES[name](spark, SF_SMOKE),
        RETIRED_ORACLES[name],
    )
    assert ok, f"{name}: {detail}"


@pytest.mark.slow
@pytest.mark.parametrize("name", RETIRED_NAMES)
def test_retired_oracle_sf_driver_gate(spark, name):
    ok, detail = compare(
        spark, SF_ORACLE, RETIRED_QUERIES[name](spark, SF_ORACLE),
        RETIRED_ORACLES[name],
    )
    assert ok, f"{name}: {detail}"
