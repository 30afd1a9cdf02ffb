"""The bench stdout contract line must stay under the driver's ~3 KB
stdout truncation window (ADVICE r12: the line regrew headroom risk
when cpu_canary_s + the longer timing note landed). Checked against
the committed artifact of record, which carries real field widths."""

from __future__ import annotations

import json
from pathlib import Path

from bench import compact_from_full

REPO = Path(__file__).resolve().parents[1]

# the driver parses the JSON line out of the LAST ~3 KB of stdout;
# leave slack for the trailing newline + a stray progress-bar frame
TRUNCATION_WINDOW = 3 * 1024
SLACK = 512


def test_compact_line_fits_truncation_window():
    full = json.loads((REPO / "BENCH_LATEST.json").read_text())
    line = json.dumps(compact_from_full(full))
    assert len(line) <= TRUNCATION_WINDOW - SLACK, len(line)


def test_compact_line_contract_fields():
    full = json.loads((REPO / "BENCH_LATEST.json").read_text())
    compact = compact_from_full(full)
    for field in ("metric", "value", "unit", "queries", "sf"):
        assert field in compact
    assert len(compact["queries"]) <= 20
