"""spark-cdc-engine: PySpark-native CDC replication + LLM-data pipeline
engine with the capabilities of ``niickau/spark-cdc-replication``,
rebuilt Spark-first (SURVEY.md is the blueprint)."""

from .config import TableSpec
from .session import get_spark

__all__ = ["TableSpec", "get_spark"]
__version__ = "0.1.0"
