"""3-valued-logic property tests (SURVEY.md §5.4): the reference's
``?.``/``||``-default semantics must hold for every null combination —
the hardest correctness detail of the stateless layer (SURVEY §7
phase 1)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F, types as T

from dynamodb_stream_processor_2_0_spark.operators.disposition import (
    ACTION_EMAIL_TRIGGERED,
    with_disposition,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def null_grid(spark):
    """Every combination of nullable inputs (event_type, value, props,
    user_id) x a healthy row."""
    import datetime as dt

    rows = []
    eid = 0
    for et, val, props, uid in itertools.product(
        ["purchase", "bogus", None],
        [50.0, None],
        ['{"k": 3}', '{"k": 0}', "not json", None],
        [7, None],
    ):
        rows.append((eid, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=eid), uid, et, val, props))
        eid += 1
    return spark.createDataFrame(rows, SCHEMA)


def test_every_row_gets_exactly_one_action(spark, null_grid):
    """F12/E1: tag-don't-drop — no null combination may produce a null
    action or drop a row."""
    out = with_disposition(null_grid)
    assert out.count() == null_grid.count()
    assert out.filter(F.col("action").isNull()).count() == 0


def test_null_inputs_never_trigger(spark, null_grid):
    """The reference's guards (F2/F7) stop null rows before the
    trigger: a row with null event_type, props, value, or user_id must
    never reach email_triggered."""
    out = with_disposition(null_grid)
    bad = out.filter(
        (F.col("action") == ACTION_EMAIL_TRIGGERED)
        & (
            F.col("event_type").isNull()
            | F.col("props").isNull()
            | F.col("value").isNull()
            | F.col("user_id").isNull()
        )
    )
    assert bad.count() == 0


def test_malformed_json_defaults_to_zero(spark, null_grid):
    """P4: parseInt(x ?? '0') — malformed/missing props parse to k=0,
    never to an error or null (the reference's ?.-semantics)."""
    from dynamodb_stream_processor_2_0_spark.operators.disposition import (
        parse_event_props,
    )

    out = parse_event_props(null_grid)
    assert out.filter(F.col("k").isNull()).count() == 0
    malformed = out.filter(F.col("props") == "not json")
    assert malformed.count() > 0
    assert malformed.filter(F.col("k") != 0).count() == 0


def test_disposition_is_idempotent(spark, null_grid):
    """§5.4 idempotency: tagging the same batch twice yields identical
    ledgers (pure function of the input — no hidden state)."""
    a = with_disposition(null_grid).select("event_id", "action", "priority")
    b = with_disposition(null_grid).select("event_id", "action", "priority")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_filter_stage_order_matters_like_reference(spark, null_grid):
    """The CASE chain must encode the reference's early-return ORDER:
    a row failing both the type filter and the threshold must report
    the type reason (first return site, index.js:146-153)."""
    out = with_disposition(null_grid)
    both_bad = out.filter(
        (F.col("event_type") == "bogus") & (F.col("value").isNull())
    )
    assert both_bad.count() > 0
    assert (
        both_bad.filter(F.col("action") != "skipped_change_type").count() == 0
    )
