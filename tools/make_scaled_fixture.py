"""Build an N× scaled copy of a testdata fixture for scale rehearsals.

The driver ships sf0.001/0.01/0.1; the 2× perf bar has only ever been
exercised at sf0.1.  This tool manufactures a larger fixture (default
10× -> "sf1") from sf0.1 by replicating every scaling table K times
with *remapped keys*, so the result keeps the star-schema join
semantics (replica i of ``orders`` references replica i of
``customer``; replica i of ``lineitem`` references replica i of
``orders``/``part``/``supplier``) instead of multiplying join fan-out.

Deliberate shape choices (documented in SCALE.md's sf1 appendix):

- ``region``/``nation`` stay fixed — they are bounded dimensions in
  TPC-H at every sf.
- ``documents``: replica i > 0 rotates each text by i words.  Rotation
  preserves almost all shingles, so cross-replica docs are NEAR
  duplicates (Jaccard ≈ 1 - O(shingle_len·i / n_words)) — exactly the
  crawl-data shape that stresses LSH candidate generation (dup groups
  of ~K docs) rather than degenerate byte-identical copies.
- ``embeddings``: replica i > 0 adds small deterministic per-replica
  noise (seeded by (replica, vec_id)) so ANN / semantic-dedup sees
  near-dup clusters, not exact collisions.
- Key offsets are 10**9 per replica — far above any sf0.1 key, far
  below int64, and aligned across fact/dim so FK joins stay 1:1.

Writes one parquet per table (snappy), mirroring the driver layout, so
``SPARK_GRAFT_SF_DIR=<out> python bench.py`` runs unmodified.

Usage:  python tools/make_scaled_fixture.py [--src /root/testdata/sf0.1]
            [--out /root/repo/.scratch/sf1] [--copies 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

OFFSET = 10**9

# Tables copied verbatim (bounded dims).
FIXED = ["region", "nation"]

# table -> list of BIGINT key columns shifted by replica*OFFSET.
SHIFTED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _replica_select(table: str, keys: list[str], src: str, i: int) -> str:
    """SQL for one replica of ``table`` with keys shifted by i*OFFSET."""
    con = duckdb.connect()
    cols = [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{table}.parquet')"
        ).fetchall()
    ]
    exprs = []
    for c in cols:
        if c in keys:
            exprs.append(f"{c} + {i * OFFSET} AS {c}")
        elif table == "documents" and c == "text" and i > 0:
            # Rotate by 1 + ((i-1) % (n_words-1)) words: always a
            # NON-identity rotation for any doc with >= 2 words, so no
            # replica degenerates to a byte-identical copy (ADVICE r6:
            # a flat rotate-by-i is the identity whenever n_words <= i
            # — DuckDB's [i+1:] slice is empty and [:i] is the whole
            # list).  One-word docs stay verbatim (flagged exact dups
            # by construction; nothing to rotate).
            w = "string_split(text, ' ')"
            rot = f"(1 + (({i} - 1) % (len({w}) - 1)))"
            exprs.append(
                f"CASE WHEN len({w}) > 1 THEN array_to_string("
                f"  list_concat({w}[{rot} + 1:], {w}[:{rot}]), ' ')"
                "  ELSE text END AS text"
            )
        elif table == "embeddings" and c == "embedding" and i > 0:
            # Deterministic tiny perturbation keyed by (replica, vec_id,
            # position): keeps cosine ≈ 1 to the source replica.
            exprs.append(
                "list_transform(embedding, (x, j) -> "
                " CAST(x + (CAST(hash(vec_id * 131 + j * 17 + "
                f"{i}) % 1000 AS BIGINT)"
                "        - 500) * 1e-6 AS FLOAT)) AS embedding"
            )
        else:
            exprs.append(c)
    return (
        f"SELECT {', '.join(exprs)} "
        f"FROM read_parquet('{src}/{table}.parquet')"
    )


def build(src: str, out: str, copies: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table in FIXED:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{table}.parquet')) "
            f"TO '{out}/{table}.parquet' (FORMAT parquet, CODEC snappy)"
        )
        print(f"{table}: copied")
    for table, keys in SHIFTED.items():
        union = " UNION ALL ".join(
            _replica_select(table, keys, src, i) for i in range(copies)
        )
        con.execute(
            f"COPY ({union}) TO '{out}/{table}.parquet' "
            "(FORMAT parquet, CODEC snappy)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows ({copies}x)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.scratch/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    build(args.src, args.out, args.copies)
