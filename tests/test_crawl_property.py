"""Property tests over the round-9 crawl-layer parsers (pure Python,
no Spark): totality and invariants hypothesis can explore that
example tests can't."""

import pytest

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from vectra_py_spark.operators.boilerplate import (
    classify_blocks,
    extract_main_text,
    page_blocks,
)
from vectra_py_spark.operators.robots import parse_robots, robots_allowed
from vectra_py_spark.sources.cdx import (
    format_cdxj_line,
    parse_cdxj_line,
    surt_key,
)

pytestmark = pytest.mark.slow  # excluded from the smoke tier

# --------------------------------------------------------------------------
# robots.txt: parsing is TOTAL (any text yields rules, never raises)
# and evaluation is deterministic
# --------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=400), st.text(max_size=60))
def test_robots_total_and_deterministic(txt, path):
    a = robots_allowed(txt, path)
    assert a is robots_allowed(txt, path)
    assert isinstance(a, bool)


_path = st.builds(
    lambda segs: "/" + "/".join(segs),
    st.lists(st.text(string.ascii_lowercase + "0123456789", min_size=1, max_size=6), max_size=4),
)


@settings(max_examples=200, deadline=None)
@given(_path)
def test_robots_disallow_all_blocks_everything_but_exact_allow_wins(path):
    assert not robots_allowed("User-agent: *\nDisallow: /", path)
    # an Allow for the exact path is at least as long as any matching
    # literal Disallow prefix → longest-match + allow-tie-win admits it
    txt = f"User-agent: *\nDisallow: /\nAllow: {path}$\n"
    assert robots_allowed(txt, path)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_robots_empty_rules_allow_everything(path):
    assert robots_allowed("", path)
    assert robots_allowed("User-agent: *\nDisallow:\n", path)


# --------------------------------------------------------------------------
# CDXJ line codec: format→parse round-trips for arbitrary entries
# --------------------------------------------------------------------------

_token = st.text(
    string.ascii_lowercase + string.digits + ",)/._-", min_size=1, max_size=30
)


@settings(max_examples=300, deadline=None)
@given(
    surt=_token,
    ts=st.text(string.digits, min_size=14, max_size=14),
    url=st.text(string.printable.replace(" ", "").replace("\n", "").replace("\r", "").replace("\t", ""), min_size=1, max_size=50),
    mime=st.sampled_from(["text/html", "application/pdf", "x/y"]),
    status=st.integers(100, 599),
    digest=_token,
    filename=_token,
    offset=st.integers(0, 2**53),
    length=st.integers(0, 2**40),
)
def test_cdxj_roundtrip(surt, ts, url, mime, status, digest, filename, offset, length):
    entry = {
        "surt": surt, "ts": ts, "url": url, "mime": mime,
        "status": status, "digest": digest, "filename": filename,
        "offset": offset, "length": length,
    }
    assert parse_cdxj_line(format_cdxj_line(entry)) == entry


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=120))
def test_parse_cdxj_total_contract(line):
    try:
        parse_cdxj_line(line)
    except ValueError:
        pass  # the only permitted failure mode


# --------------------------------------------------------------------------
# SURT: same-host URLs share a prefix up to ')'; key is lowercase
# --------------------------------------------------------------------------

_host = st.builds(
    lambda segs: ".".join(segs),
    st.lists(
        st.text(string.ascii_letters + string.digits, min_size=1, max_size=8),
        min_size=2,
        max_size=4,
    ),
)


@settings(max_examples=300, deadline=None)
@given(_host, _path, _path)
def test_surt_same_host_shares_prefix(host, p1, p2):
    k1 = surt_key(f"https://{host}{p1}")
    k2 = surt_key(f"http://{host}{p2}")  # scheme-invariant
    assert k1.split(")")[0] == k2.split(")")[0]
    assert k1 == k1.lower()


# --------------------------------------------------------------------------
# boilerplate: total over arbitrary text, features bounded, labels
# from the closed set
# --------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=800))
def test_boilerplate_total_and_bounded(html):
    blocks = page_blocks(html)
    for b in blocks:
        assert 0.0 <= b["link_density"] <= 1.0
        assert 0.0 <= b["stopword_density"] <= 1.0
        assert b["n_chars"] == len(b["text"]) > 0
    labels = classify_blocks(blocks)
    assert len(labels) == len(blocks)
    assert set(labels) <= {"good", "bad"}
    text, kept, total = extract_main_text(html)
    assert kept <= total == len(blocks)
    assert (kept == 0) == (text == "")
