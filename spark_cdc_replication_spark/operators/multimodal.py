"""Multimodal (binary) column plumbing ([EXT], SURVEY.md §7 M5).

Images / audio / video are opaque ``binary`` columns with a typed
metadata struct.  The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signature, partition sizing — is real and tested; the
actual codec decode is STUBBED (this container has no image/audio
libraries) behind ``decode_stub``: a clearly-marked deterministic fake
that derives "features" purely from the byte content, so tests and
oracles stay deterministic.

Scale notes: binary payloads ride in the same parquet row groups as
their metadata, so filters on metadata (e.g. ``media_type``) prune
row groups before any bytes are decoded.  ``mapInPandas`` streams
Arrow batches — set ``spark.sql.execution.arrow.maxRecordsPerBatch``
down if payloads are large (a 10k-row batch of 1 MB blobs is 10 GB).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the feature extractor (DDL form keeps it in one place).
FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, checksum string, "
    "width int, height int, n_frames int"
)


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Test fixture: synthesize an opaque media column + metadata struct
    from a text column (deterministic: utf-8 bytes of the text)."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.when(F.col(id_col) % 3 == 0, F.lit("image/png"))
            .when(F.col(id_col) % 3 == 1, F.lit("audio/wav"))
            .otherwise(F.lit("video/mp4"))
            .alias("media_type"),
            F.octet_length(F.encode(F.col(text_col), "utf-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decode.

    A real deployment would replace this with PIL / torchaudio /
    pyav decoding — the function signature (bytes in, dict of features
    out) and everything around it stays identical.
    """
    n = len(payload)
    return {
        "width": (n * 7) % 512,
        "height": (n * 13) % 512,
        "n_frames": n % 32,
    }


def extract_features(media: DataFrame) -> DataFrame:
    """``mapInPandas`` feature extraction over binary payloads.

    Arrow-batched: each pandas batch holds the payload bytes column;
    per-row Python cost is one ``decode_stub`` call (the pattern a real
    decoder would follow).  Output is a flat, typed feature row.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": [m["media_type"] for m in pdf["meta"]],
                    "n_bytes": [int(m["n_bytes"]) for m in pdf["meta"]],
                    "checksum": [
                        hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]
                    ],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "n_frames": [f["n_frames"] for f in feats],
                }
            )
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


#: Resize keeps the payload opaque; only the metadata changes shape.
RESIZE_SCHEMA = "doc_id bigint, payload binary, width int, height int"


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub over image rows (``mapInPandas``).

    A real decoder would be ``PIL.Image.open(bytes).resize((w, h))``;
    the stub passes bytes through and stamps the target geometry, so
    the Arrow round-trip of the BINARY column — the part that matters
    for the 100 TB plumbing — is exercised for real.  Non-image rows
    are filtered before decode (metadata predicate prunes row groups
    ahead of any byte movement).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pdf["payload"],  # stub: bytes pass through
                    "width": width,
                    "height": height,
                }
            )

    images = media.filter(F.col("meta.media_type") == "image/png")
    return images.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes binary"


def sample_frames(media: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame-sampling stub over video rows: one output row per sampled
    frame (``mapInPandas`` fan-out — the 1->N batch shape a real
    ``pyav`` demuxer produces).  Frames are deterministic byte slices
    of the payload so tests/oracles are exact."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                n_frames = len(payload) % 32
                for i in range(0, n_frames, every_n):
                    ids.append(int(row["doc_id"]))
                    idxs.append(i)
                    frames.append(payload[i : i + 16])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    videos = media.filter(F.col("meta.media_type") == "video/mp4")
    return videos.mapInPandas(run, schema=FRAME_SCHEMA)


AUDIO_WINDOW_SCHEMA = "doc_id bigint, window_idx int, energy bigint, voiced boolean"


def audio_windows(
    media: DataFrame, window: int = 16, hop: int = 8
) -> DataFrame:
    """Audio framing stub over audio rows: one output row per FULL
    ``window``-byte frame at ``hop``-byte stride (the 25 ms-window /
    10 ms-hop framing every VAD / feature frontend uses, expressed in
    bytes because the codec is stubbed) — the third modality's
    ``mapInPandas`` fan-out, completing image (``resize_images``) and
    video (``sample_frames``).

    ``energy`` is a clearly-marked deterministic stand-in for RMS
    energy: ``md5`` of the window's LOWERCASE hex, first 8 hex digits
    mod 1e6 (hex-string hashing because the DuckDB oracle can md5 only
    VARCHAR — the ``sample_frames`` frame_hex technique); ``voiced``
    is ``energy >= 500000``, a ~50 % pseudo-VAD.  A real deployment
    replaces the energy line with ``np.frombuffer(win, '<i2')`` RMS
    and a threshold — the framing loop, the Arrow batch shape, and
    every downstream aggregate stay identical.

    Docs shorter than one window emit nothing (no partial frames —
    partial-window energy would depend on padding policy, which is a
    codec concern the stub must not invent).
    """
    if window < 1 or hop < 1:
        raise ValueError(f"window/hop must be >= 1: {window}/{hop}")
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, energies = [], [], []
            for _, row in pdf.iterrows():
                # NULL payload (attach_binary over a NULL text) emits
                # nothing — the same contract as sub-window payloads
                # (r10 ADVICE: bytes(None) would kill the Arrow worker)
                if row["payload"] is None:
                    continue
                payload = bytes(row["payload"])
                for start in range(0, len(payload) - window + 1, hop):
                    win = payload[start : start + window]
                    e = (
                        int(
                            hashlib.md5(win.hex().encode()).hexdigest()[:8], 16
                        )
                        % 1_000_000
                    )
                    ids.append(int(row["doc_id"]))
                    idxs.append(start)
                    energies.append(e)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "window_idx": pd.Series(idxs, dtype="int32"),
                    "energy": pd.Series(energies, dtype="int64"),
                    "voiced": pd.Series(
                        [e >= 500_000 for e in energies], dtype="bool"
                    ),
                }
            )

    audio = media.filter(F.col("meta.media_type") == "audio/wav")
    return audio.mapInPandas(run, schema=AUDIO_WINDOW_SCHEMA)


PHASH_SCHEMA = "doc_id bigint, phash bigint"


def phash_stub(payload: bytes) -> int:
    """Deterministic 64-bit perceptual hash over the raw byte stream —
    average-hash (aHash) with the payload standing in for the decoded
    thumbnail: split the bytes into 64 near-equal buckets (the 8x8
    grid a real pHash would DCT), bit i = 1 iff bucket i's mean byte
    value exceeds the global mean.

    Unlike ``extract_features``'s md5 checksum this is LOCALITY-
    SENSITIVE — a localized edit moves few bucket means across the
    global mean, so near-identical payloads land at small Hamming
    distance — which is the property the banded near-dup join needs.
    A real deployment replaces this with DCT-based pHash over decoded
    pixels (PIL + a DCT); the 64-bit contract and everything
    downstream stay identical.
    """
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return 0
    bounds = np.linspace(0, arr.size, 65).astype(np.int64)
    g = float(arr.mean())
    val = 0
    for i in range(64):
        chunk = arr[bounds[i] : bounds[i + 1]]
        if chunk.size and float(chunk.mean()) > g:
            val |= 1 << i
    if val >= 1 << 63:  # two's-complement into a Spark LongType
        val -= 1 << 64
    return val


def image_phash(media: DataFrame) -> DataFrame:
    """``(doc_id, phash)`` over image rows (``mapInPandas``, Arrow-
    batched like every payload crossing in this module).  The
    metadata predicate filters non-image rows BEFORE any bytes move —
    at parquet scale that prunes row groups ahead of decode.  NULL
    payloads are skipped (the ``audio_windows`` contract)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep = pdf["payload"].notna()
            yield pd.DataFrame(
                {
                    "doc_id": pdf.loc[keep, "doc_id"].astype("int64"),
                    "phash": [
                        phash_stub(bytes(p)) for p in pdf.loc[keep, "payload"]
                    ],
                }
            )

    images = media.filter(F.col("meta.media_type") == "image/png")
    return images.mapInPandas(run, schema=PHASH_SCHEMA)


def phash_near_dup(
    media: DataFrame,
    max_hamming: int = 3,
    num_bands: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate image pairs by perceptual-hash Hamming distance
    — the image-modality sibling of text MinHash/SimHash dedup and a
    core crawl-curation operator (re-encoded / lightly-edited copies
    of one image share most of the corpus's image bytes at 100 TB).

    Output: ``(id_a, id_b, hamming)`` with ``id_a < id_b``, every pair
    at ``Hamming(phash) <= max_hamming``.

    Plan: one ``mapInPandas`` scan computes the 64-bit hash (payload
    bytes never survive past it — only 8-byte hashes shuffle), then
    :func:`~.dedup.simhash_candidates` does the banded self-join:
    pigeonhole-exact recall while ``max_hamming < num_bands`` and no
    bucket is capped; ``max_bucket`` bounds degenerate band values
    (all-black thumbnails …) at the documented recall cost.  Nothing
    is all-pairs; the only corpus-sized exchange carries
    ``num_bands`` 16-byte rows per image.

    BAND-WIDTH TRADE (measured r12, SCALE.md): band width is
    ``64 // num_bands`` bits, so widening the radius shrinks the band
    domain and inflates every bucket — at sf3, radius 3 with 4×16-bit
    bands returns the IDENTICAL pair set 3.0× faster than with
    8×8-bit bands (14.2 s vs 42.0 s), because 8-bit bands have only
    256 values and every bucket goes O(N/256)².  Default is the
    measured-efficient (3, 4); raise ``num_bands`` past 4 only when
    the radius truly must exceed 3, and cap buckets when you do.
    """
    from .dedup import simhash_candidates

    hashes = image_phash(media).select(
        "doc_id", F.col("phash").alias("simhash")
    )
    return simhash_candidates(
        hashes,
        id_col="doc_id",
        max_hamming=max_hamming,
        num_bands=num_bands,
        max_bucket=max_bucket,
    )


def phash_dedup(
    media: DataFrame,
    max_hamming: int = 3,
    num_bands: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Survivor-returning image dedup — the composition every crawl
    pipeline actually runs (pairs are diagnostics; the deliverable is
    the deduplicated corpus): :func:`phash_near_dup` pairs →
    :func:`~.dedup.dup_clusters` connected components → keep ONE
    canonical member per cluster (the component-min id, the same
    lowest-id-survives rule as text ``dedup_corpus``).  Non-image rows
    and unpaired images pass through untouched.

    Scale: the pair/cluster stages shuffle only hashes and
    ``(node, label)`` longs; the final drop is a left-anti join of the
    corpus against the (pair-touched-only, hence small) non-canonical
    id set — AQE broadcasts it when it fits.  Payload bytes cross the
    network zero times beyond the initial hash scan.
    """
    from .dedup import dup_clusters

    pairs = phash_near_dup(
        media,
        max_hamming=max_hamming,
        num_bands=num_bands,
        max_bucket=max_bucket,
    )
    clusters = dup_clusters(pairs)
    drop = clusters.filter(F.col("cluster_id") != F.col("doc_id")).select("doc_id")
    return media.join(drop, on="doc_id", how="left_anti")
