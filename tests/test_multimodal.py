"""Audio framing stub (operators/multimodal.audio_windows): framing
math, the deterministic energy stand-in, and the short-payload edge —
pinned against a pure-Python model of the spec."""

from __future__ import annotations

import hashlib

import pytest

from spark_cdc_replication_spark.operators.multimodal import (
    attach_binary,
    audio_windows,
)


def model_windows(payload: bytes, window: int = 16, hop: int = 8):
    out = []
    for start in range(0, len(payload) - window + 1, hop):
        win = payload[start : start + window]
        e = int(hashlib.md5(win.hex().encode()).hexdigest()[:8], 16) % 1_000_000
        out.append((start, e, e >= 500_000))
    return out


def test_audio_windows_match_python_model(spark):
    # ids chosen so doc_id % 3 == 1 -> audio/wav; unicode text so the
    # byte/character distinction is actually exercised
    docs = spark.createDataFrame(
        [
            (1, "héllo wörld this is a longer payload for framing"),
            (4, "短い非ASCIIテキスト with some ascii too"),
            (7, "x" * 16),          # exactly one window
            (10, "tiny"),           # shorter than one window: no rows
        ],
        "doc_id long, text string",
    )
    rows = audio_windows(attach_binary(docs)).collect()
    got: dict[int, list] = {}
    for r in rows:
        got.setdefault(r.doc_id, []).append((r.window_idx, r.energy, r.voiced))
    for doc_id, text in ((1, "héllo wörld this is a longer payload for framing"),
                         (4, "短い非ASCIIテキスト with some ascii too"),
                         (7, "x" * 16)):
        assert sorted(got[doc_id]) == model_windows(text.encode()), doc_id
    assert 10 not in got  # sub-window payloads emit nothing
    assert got[7] == [(0, *model_windows(b"x" * 16)[0][1:])]


def test_audio_windows_filters_to_audio_rows(spark):
    # doc_id % 3: 0 -> image, 1 -> audio, 2 -> video (attach_binary)
    docs = spark.createDataFrame(
        [(i, "a reasonably long text payload for the framing loop") for i in range(6)],
        "doc_id long, text string",
    )
    rows = audio_windows(attach_binary(docs)).collect()
    assert {r.doc_id for r in rows} == {1, 4}


def test_audio_windows_skips_null_payloads(spark):
    """NULL text -> attach_binary yields a NULL payload; the framing
    loop must emit nothing for that row instead of killing the Arrow
    worker with bytes(None) (r10 ADVICE)."""
    docs = spark.createDataFrame(
        [
            (1, "a reasonably long text payload for the framing loop"),
            (4, None),  # doc_id % 3 == 1 -> audio/wav, NULL payload
        ],
        "doc_id long, text string",
    )
    rows = audio_windows(attach_binary(docs)).collect()
    assert {r.doc_id for r in rows} == {1}


def test_audio_windows_validates_params(spark):
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError, match="window/hop"):
        audio_windows(attach_binary(docs), window=0)
    with pytest.raises(ValueError, match="window/hop"):
        audio_windows(attach_binary(docs), hop=0)
