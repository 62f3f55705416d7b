"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``dynamodb_stream_processor_2_0_spark.plans.registry``:
every implemented operator from SURVEY.md §2 is a QuerySpec pairing a
PySpark plan builder with a DuckDB oracle SQL twin.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from dynamodb_stream_processor_2_0_spark.plans import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the full disposition pipeline (SURVEY.md §3.2) over ``events``
    and returns the per-disposition summary counters.
    """
    spec = _registry.get("pipeline_disposition_summary")
    return spec.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable SQL twin for each SQL-expressible query."""
    return _registry.all_oracle_sql()
