"""Property tests for the PDF stream-filter codecs: every encoder⇄
decoder pair round-trips arbitrary bytes (LZW at both EarlyChange
settings, ASCIIHex/ASCII85 via the stdlib encoders, RunLength via a
real run-compressing encoder), and the predictors invert themselves."""

import pytest

import base64
import sys

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from vectra_py_spark.operators.pdf import (
    _apply_predictor,
    _ascii85_decode,
    _asciihex_decode,
    _lzw_decode,
    _runlength_decode,
)

pytestmark = pytest.mark.slow  # excluded from the smoke tier

sys.path.insert(0, "tests")


def _rl_encode(data: bytes) -> bytes:
    """Spec-faithful RunLength encoder: repeat runs ≥3 become repeat
    records, everything else literal records."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3:
            out += bytes([257 - (j - i), data[i]])
            i = j
            continue
        j = i + 1
        while (
            j < n and j - i < 128
            and not (j + 2 < n and data[j] == data[j + 1] == data[j + 2])
        ):
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    out.append(128)
    return bytes(out)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=2048), st.sampled_from([0, 1]))
def test_lzw_round_trip(data, early):
    from test_pdf import _lzw_encode

    assert _lzw_decode(_lzw_encode(data, early), 1 << 24, early) == data


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_ascii_and_runlength_round_trip(data):
    assert _asciihex_decode(base64.b16encode(data) + b">") == data
    assert _ascii85_decode(base64.a85encode(data) + b"~>") == data
    assert _runlength_decode(_rl_encode(data), 1 << 24) == data


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 4),    # colors (bpp)
    st.integers(1, 24),   # columns
    st.integers(1, 12),   # rows
    st.integers(0, 2**32 - 1),
)
def test_png_predictors_invert(colors, columns, rows, seed):
    rng = np.random.default_rng(seed)
    rowlen = colors * columns
    raw = rng.integers(0, 256, size=rows * rowlen, dtype=np.uint8)
    # encode with a per-row filter-type chosen from all five, applying
    # the spec filter against the RAW previous row (like PNG encoders)
    enc = bytearray()
    prev = bytes(rowlen)
    for r in range(rows):
        row = raw[r * rowlen : (r + 1) * rowlen]
        ft = int(rng.integers(0, 5))
        enc.append(ft)
        for i in range(rowlen):
            a = int(row[i - colors]) if i >= colors else 0
            b = int(prev[i])
            c = int(prev[i - colors]) if i >= colors else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c
                )
            enc.append((int(row[i]) - pred) & 0xFF)
        prev = bytes(row)
    got = _apply_predictor(bytes(enc), 12, colors, 8, columns)
    assert got == raw.tobytes()


@settings(max_examples=40, deadline=None)
@given(st.integers(1, 4), st.integers(1, 24), st.integers(0, 2**32 - 1))
def test_tiff_predictor_inverts(colors, columns, seed):
    rng = np.random.default_rng(seed)
    rowlen = colors * columns
    raw = rng.integers(0, 256, size=3 * rowlen, dtype=np.uint8)
    enc = bytearray(raw.tobytes())
    for r in range(0, len(enc), rowlen):
        for i in range(rowlen - 1, colors - 1, -1):
            enc[r + i] = (enc[r + i] - enc[r + i - colors]) & 0xFF
    assert _apply_predictor(bytes(enc), 2, colors, 8, columns) == (
        raw.tobytes()
    )
