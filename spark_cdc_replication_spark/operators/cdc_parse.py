"""CDC envelope parsing and op routing.

Reference behavior being re-expressed (never copied):

* Kafka record cast ``(timestamp, value)``:
  ``/root/reference/pipelines/raw_data_handler.py:51`` (P1).
* ``from_json`` + ``select("data.*")`` struct flatten:
  ``daily_data_handler.py:63-66``, ``history_data_handler.py:88-90``
  (P3).
* Name sanitization: ``daily_data_handler.py:70-72``,
  ``history_data_handler.py:94-109`` (P5) — unified here, see
  :mod:`..functions.names`.
* Op routing by ``__op``: inserts ``isin('c','r')``, updates ``== 'u'``,
  deletes ``== 'd'`` projected to PK: ``daily_data_handler.py:33-35``,
  ``history_data_handler.py:38-40`` (P7, P8).

Everything here is a narrow projection/filter over the scan, so
Catalyst pushes the predicates into the source and prunes columns —
no RDDs, no Python UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..functions.names import INGEST_TS, sanitized_payload_names
from ..schemas import DELETE_OP, DELETED_COL, INSERT_OPS, META_COLS, OP_COL, UPDATE_OP


def decode_envelope(df: DataFrame, ts_col: str = "timestamp", value_col: str = "value") -> DataFrame:
    """Kafka binary -> typed ``(timestamp, value)`` (reference P1)."""
    return df.select(
        F.col(ts_col).cast("timestamp").alias(INGEST_TS),
        F.col(value_col).cast("string").alias("value"),
    )


def parse_envelope(
    df: DataFrame,
    payload_schema: StructType,
    value_col: str = "value",
    keep_cols: Sequence[str] = (INGEST_TS,),
) -> DataFrame:
    """JSON payload -> flattened, name-sanitized change rows.

    One declarative projection: ``from_json`` with an *explicit* schema
    (no per-run inference scan — SURVEY.md §4 "double scan"), struct
    flatten, deterministic rename.  The ingest timestamp (and any other
    ``keep_cols``) stay top-level; a payload column that collides with a
    reserved name is renamed deterministically *at flatten time* (a
    naive ``select("data.*")`` would materialize two same-named columns
    and make the rename ambiguous).
    """
    keep = [c for c in keep_cols if c in df.columns]
    renames = sanitized_payload_names(
        [f.name for f in payload_schema.fields], reserved=tuple(keep)
    )
    data = F.from_json(F.col(value_col), payload_schema).alias("data")
    return df.select(*[F.col(c) for c in keep], data).select(
        *keep,
        *[
            F.col("data").getField(f.name).alias(renames[f.name])
            for f in payload_schema.fields
        ],
    )


@dataclass
class RoutedOps:
    """The three-way ``__op`` split (reference step 4, §3.2)."""

    inserts: DataFrame  # __op in ('c','r')
    updates: DataFrame  # __op == 'u'
    delete_keys: DataFrame  # __op == 'd', projected to the primary key


def route_ops(changes: DataFrame, primary_keys: Sequence[str]) -> RoutedOps:
    """Split a parsed change batch by operation.

    Meta columns are dropped from inserts/updates
    (``daily_data_handler.py:33-34``); deletes are projected to the PK
    only (``daily_data_handler.py:35``) since a delete needs no payload.
    """
    keep = [c for c in changes.columns if c not in META_COLS]
    return RoutedOps(
        inserts=changes.filter(F.col(OP_COL).isin(list(INSERT_OPS))).select(keep),
        updates=changes.filter(F.col(OP_COL) == UPDATE_OP).select(keep),
        delete_keys=changes.filter(F.col(OP_COL) == DELETE_OP).select(
            [F.col(k) for k in primary_keys]
        ),
    )


def drop_meta(df: DataFrame) -> DataFrame:
    """Drop ``__op`` / ``__deleted`` after routing (reference P6)."""
    return df.drop(*[c for c in META_COLS if c in df.columns])


__all__ = [
    "decode_envelope",
    "parse_envelope",
    "route_ops",
    "drop_meta",
    "RoutedOps",
    "OP_COL",
    "DELETED_COL",
]
