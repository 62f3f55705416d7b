"""Unit tests for operators/ranking.global_rank — the scalable
replacement for single-partition global windows."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamodb_stream_processor_2_0_spark.operators.ranking import global_rank


def _ranks(df, order_cols, **kw):
    out = global_rank(df, order_cols, out_col="r", **kw)
    return {tuple(row[c] for c in order_cols): row["r"] for row in out.collect()}


def test_matches_global_window_semantics(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") * 37 % 1000).alias("k"), F.col("id").alias("tie")
    )
    got = _ranks(df, ["k", "tie"], num_partitions=8)
    rows = sorted(got)
    assert [got[r] for r in rows] == list(range(1, 1001))


def test_single_row_and_empty(spark):
    one = spark.range(1).select(F.col("id").alias("k"))
    assert _ranks(one, ["k"]) == {(0,): 1}
    empty = spark.range(0).select(F.col("id").alias("k"))
    assert global_rank(empty, ["k"]).count() == 0


def test_more_partitions_than_rows(spark):
    df = spark.range(3).select(F.col("id").alias("k"))
    got = _ranks(df, ["k"], num_partitions=16)
    assert got == {(0,): 1, (1,): 2, (2,): 3}


def test_descending_order_expression_columns(spark):
    # order columns must be names (the contract) — ranks follow the
    # ascending total order of the named columns
    df = spark.createDataFrame(
        [("b", 2), ("a", 1), ("a", 2), ("b", 1)], "s string, n int"
    )
    got = _ranks(df, ["s", "n"], num_partitions=2)
    assert got == {("a", 1): 1, ("a", 2): 2, ("b", 1): 3, ("b", 2): 4}


def test_no_single_partition_exchange_in_plan(spark):
    df = spark.range(0, 500).select((F.col("id") % 91).alias("k"), "id")
    out = global_rank(df, ["k", "id"], out_col="r")
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Window" in line:
            assert "Exchange SinglePartition" not in " ".join(lines[i + 1 : i + 3])


def test_rank_is_permutation_under_checkpoint_and_topandas(spark):
    """Regression: before the localCheckpoint pin inside global_rank,
    the offset subtree was a column-pruned (non-reusable) copy of the
    data subtree, so the sampled range exchange could execute twice
    with different boundaries — local ranks from boundary set A got
    offsets from boundary set B and ranks stopped being a permutation
    (observed 15000 rows / 14726 distinct under toPandas and
    localCheckpoint consumers, while plain aggregates happened to
    reuse the exchange and looked fine)."""
    df = spark.range(0, 6000).select(
        (F.col("id") * 2654435761 % 100003).alias("k"), "id"
    )
    for _ in range(3):
        ranked = global_rank(df, ["k", "id"], out_col="r").localCheckpoint()
        agg = ranked.agg(
            F.count(F.lit(1)).alias("n"),
            F.max("r").alias("mx"),
            F.countDistinct("r").alias("nd"),
        ).collect()[0]
        assert agg["n"] == agg["mx"] == agg["nd"] == 6000, agg
        pdf = global_rank(df, ["k", "id"], out_col="r").toPandas()
        assert len(pdf) == pdf.r.nunique() == pdf.r.max() == 6000


def test_global_running_sum_matches_single_partition_window(spark):
    from dynamodb_stream_processor_2_0_spark.operators.ranking import (
        global_running_sum,
    )

    df = spark.range(0, 5000).select(
        (F.col("id") * 2654435761 % 99991).alias("k"),
        "id",
        (F.col("id") % 37 + 1).alias("v"),
    )
    got = {
        (r["k"], r["id"]): r["cum"]
        for r in global_running_sum(df, ["k", "id"], "v", out_col="cum")
        .collect()
    }
    rows = sorted(df.collect(), key=lambda r: (r["k"], r["id"]))
    cum = 0
    for r in rows:
        cum += r["v"]
        assert got[(r["k"], r["id"])] == cum
