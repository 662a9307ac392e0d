"""Schema registry.

The reference has a static schema path that is *defined but never
called* (``/root/reference/pipelines/daily_data_handler.py:45-49``,
``history_data_handler.py:58-62``; sample file
``json_schemas/TEST_schema.json:1``) and instead re-infers the payload
schema on every run with a full extra scan through the RDD API
(``daily_data_handler.py:61``).  We invert that: the static registry is
the primary path, and single-pass sampled inference is an explicit
opt-in fallback (no RDD round-trip, no second full scan).
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: Debezium-flattened metadata columns carried in every CDC payload
#: (``/root/reference/json_schemas/TEST_schema.json:1``; consumed at
#: ``daily_data_handler.py:33-35``).
OP_COL = "__op"
DELETED_COL = "__deleted"
META_COLS = (OP_COL, DELETED_COL)

#: ``__op`` values: create / snapshot-read / update / delete.
INSERT_OPS = ("c", "r")
UPDATE_OP = "u"
DELETE_OP = "d"


class SchemaRegistry:
    """Loads ``StructType`` payload schemas from ``<dir>/<table>_schema.json``.

    File format is Spark's own ``StructType.jsonValue()`` — identical to
    the reference's dead ``_load_json_schema``
    (``daily_data_handler.py:45-49``), resurrected as the primary path.
    """

    def __init__(self, schema_dir: str | Path):
        self.schema_dir = Path(schema_dir)

    def path_for(self, table: str) -> Path:
        return self.schema_dir / f"{table}_schema.json"

    def load(self, table: str) -> StructType:
        with open(self.path_for(table)) as fh:
            return StructType.fromJson(json.load(fh))

    def save(self, table: str, schema: StructType) -> Path:
        p = self.path_for(table)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(schema.jsonValue(), indent=2))
        return p

    def exists(self, table: str) -> bool:
        return self.path_for(table).exists()


def infer_payload_schema(
    spark: SparkSession, raw_df: DataFrame, value_col: str = "value", sample: int = 1000
) -> StructType:
    """Sampled JSON schema inference — the opt-in fallback.

    The reference runs ``spark.read.json(raw_df.rdd.map(lambda r:
    r.value))`` — a second full pass over the day's data through a
    Python lambda, executed *every* merge run
    (``daily_data_handler.py:61``, ``history_data_handler.py:84``).  At
    100 TB that is a second 100 TB scan.  Here the inference input is a
    bounded driver-side sample (``limit(sample)``), so the cost is
    O(sample) regardless of data size.  For drift-free production use,
    register the schema once and read it from :class:`SchemaRegistry`.
    """
    rows = raw_df.select(value_col).limit(sample).collect()
    if not rows:
        return StructType([])
    return spark.read.json(
        spark.sparkContext.parallelize([r[0] for r in rows])
    ).schema


def schema_union(a: StructType, b: StructType) -> StructType:
    """Widen schema ``a`` with any fields only present in ``b`` (drift)."""
    names = {f.name for f in a.fields}
    out = StructType(list(a.fields))
    for f in b.fields:
        if f.name not in names:
            out.add(f)
    return out
