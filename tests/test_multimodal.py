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


def test_phash_stub_is_locality_sensitive():
    """The stub must behave like a perceptual hash, not a checksum: a
    same-length localized edit flips few bits; disjoint content lands
    far away.  (This property is what the banded near-dup join
    dedupes on — md5 would put every edit at ~32 bits.)"""
    from spark_cdc_replication_spark.operators.multimodal import phash_stub

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    t = ("the quick brown fox jumps over the lazy dog " * 10).encode()
    assert ham(phash_stub(t), phash_stub(t)) == 0
    assert ham(phash_stub(t), phash_stub(b"X" + t[1:])) <= 2
    u = ("completely different content with other words entirely " * 9).encode()
    assert ham(phash_stub(t), phash_stub(u)) > 6
    assert phash_stub(b"") == 0  # empty payload is the zero hash


def test_phash_near_dup_equals_brute_force(spark):
    """Pigeonhole recall proof on a planted corpus: with max_hamming <
    num_bands and no bucket cap, the banded join's pair set must equal
    the all-pairs brute force EXACTLY (the simhash_candidates bound,
    now exercised through the image path)."""
    from spark_cdc_replication_spark.operators.multimodal import (
        attach_binary,
        image_phash,
        phash_near_dup,
    )

    base = "the quick brown fox jumps over the lazy dog " * 10
    # ids multiples of 3 -> every row is an image; same-length edits
    docs = spark.createDataFrame(
        [
            (0, base),
            (3, "X" + base[1:]),            # twin of 0
            (6, base[:-1] + "Z"),           # twin of 0 (tail edit)
            (9, "another corpus of words that shares nothing at all " * 9),
            (12, None),                      # NULL payload: skipped
        ],
        "doc_id long, text string",
    )
    media = attach_binary(docs)
    hashes = {r.doc_id: r.phash for r in image_phash(media).collect()}
    assert 12 not in hashes  # NULL payload skipped

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    ids = sorted(hashes)
    want = {
        (a, b, ham(hashes[a], hashes[b]))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if ham(hashes[a], hashes[b]) <= 6
    }
    got = {
        tuple(r) for r in phash_near_dup(media, max_hamming=6, num_bands=8).collect()
    }
    assert got == want and {(0, 3), (0, 6)} <= {(a, b) for a, b, _ in got}
    # the shipped default (radius 3, 4x16-bit bands — the measured r12
    # A/B winner) must equal ITS brute force too
    want3 = {t for t in want if t[2] <= 3}
    assert {tuple(r) for r in phash_near_dup(media).collect()} == want3
    # partition invariance
    again = {
        tuple(r)
        for r in phash_near_dup(
            media.repartition(7), max_hamming=6, num_bands=8
        ).collect()
    }
    assert again == got


def test_phash_near_dup_bucket_cap_drops_degenerate_buckets(spark):
    """A degenerate band value (byte-identical payloads) explodes the
    self-join quadratically at scale; max_bucket drops the crowded
    bucket BEFORE the join at a documented recall cost, and must not
    touch pairs found through uncapped buckets."""
    from spark_cdc_replication_spark.operators.multimodal import (
        attach_binary,
        phash_near_dup,
    )

    same = "identical payload text repeated for every clone here " * 8
    docs = spark.createDataFrame(
        [(3 * i, same) for i in range(12)],  # 12 byte-identical images
        "doc_id long, text string",
    )
    media = attach_binary(docs)
    full = phash_near_dup(media, max_hamming=6, num_bands=8).collect()
    assert len(full) == 12 * 11 // 2  # uncapped: all clone pairs
    capped = phash_near_dup(
        media, max_hamming=6, num_bands=8, max_bucket=5
    ).collect()
    # every band bucket holds all 12 clones -> all capped away
    assert capped == []


def test_phash_dedup_keeps_one_canonical_per_cluster(spark):
    """Survivors: a transitive near-dup chain collapses to its min-id
    member; unpaired images and ALL non-image rows pass through."""
    from spark_cdc_replication_spark.operators.multimodal import (
        attach_binary,
        phash_dedup,
    )

    base = "the quick brown fox jumps over the lazy dog " * 10
    docs = spark.createDataFrame(
        [
            (0, base),                       # image (id % 3 == 0), canonical
            (3, "X" + base[1:]),             # image twin of 0 -> dropped
            (6, base[:-1] + "Z"),            # image twin of 0 -> dropped
            (9, "another corpus of words that shares nothing at all " * 9),
            (1, base),                        # AUDIO row: never touched even
                                              # though its bytes near-match
            (12, None),                       # NULL payload image: passes
        ],
        "doc_id long, text string",
    )
    media = attach_binary(docs)
    kept = {r.doc_id for r in phash_dedup(media, max_hamming=6, num_bands=8).collect()}
    assert kept == {0, 9, 1, 12}
    # partition invariance
    again = {
        r.doc_id
        for r in phash_dedup(media.repartition(5), max_hamming=6, num_bands=8).collect()
    }
    assert again == kept
