"""Flagship pipeline queries (SURVEY.md §3.2 dataflow over ``events``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dynamodb_stream_processor_2_0_spark.config import DEFAULT_CONFIG
from dynamodb_stream_processor_2_0_spark.operators import disposition as D
from dynamodb_stream_processor_2_0_spark.plans.registry import register
from dynamodb_stream_processor_2_0_spark.sources.catalog import load_table


@register(
    "pipeline_disposition_summary",
    oracle=D.summary_oracle_sql(DEFAULT_CONFIG),
    tags=("pipeline", "S1", "S4", "F1", "F2", "F7", "F9", "F10", "F12", "D1", "D3", "D5", "A1", "P2", "P4", "P12"),
    doc="Flagship: full disposition pipeline + A1 counters (index.js:143-321, 42-92).",
)
def pipeline_disposition_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.disposition_summary(load_table(spark, sf_dir, "events"), DEFAULT_CONFIG)


@register(
    "pipeline_disposition_ledger",
    oracle=D.ledger_oracle_sql(DEFAULT_CONFIG),
    tags=("pipeline", "F12", "P10"),
    doc="Per-record disposition ledger with priority routing (index.js:307-315, 563).",
)
def pipeline_disposition_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.disposition_ledger(load_table(spark, sf_dir, "events"), DEFAULT_CONFIG)
