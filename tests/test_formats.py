"""Round-trip tests for the format-agnostic IO surface."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from dynamodb_stream_processor_2_0_spark.sources.catalog import load_table
from dynamodb_stream_processor_2_0_spark.sources.formats import read_batch, write_batch


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv", "orc"])
def test_roundtrip(spark, events, fmt):
    out = tempfile.mkdtemp(prefix=f"fmt_{fmt}_")
    # CSV can't carry nested/timestamp_ntz faithfully without options;
    # normalize to the columns every format handles.
    df = events.select("event_id", "user_id", "event_type", "value")
    write_batch(df, out, fmt=fmt)
    back = read_batch(spark, out, fmt=fmt, schema=df.schema)
    assert back.count() == df.count()
    assert [f.name for f in back.schema.fields] == [f.name for f in df.schema.fields]
    assert (
        back.agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("s")).collect()[0].s
        == df.agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("s")).collect()[0].s
    )


def test_partitioned_write_prunes(spark, events):
    out = tempfile.mkdtemp(prefix="fmt_part_")
    write_batch(events.select("event_id", "event_type", "value"), out, partition_by=["event_type"])
    back = read_batch(spark, out).filter(F.col("event_type") == "purchase")
    # partition pruning: the physical scan must read only the purchase dir
    plan = back._jdf.queryExecution().executedPlan().toString()
    n = back.count()
    assert n == events.filter("event_type = 'purchase'").count()
    assert "event_type=purchase" in plan or "PartitionFilters" in plan


def test_schema_required_for_json(spark):
    with pytest.raises(ValueError, match="explicit schema"):
        read_batch(spark, "/nonexistent", fmt="json")


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unsupported format"):
        read_batch(spark, "/nonexistent", fmt="avro")
