"""Salted aggregation / join must be semantics-preserving."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamodb_stream_processor_2_0_spark.operators.skew import salted_join
from dynamodb_stream_processor_2_0_spark.sources.catalog import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_mktsegment"
    )
    salted = salted_join(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        cust,
        on="c_custkey",
        entropy_col="o_orderkey",
        n_salts=8,
    ).select("o_orderkey", "c_mktsegment")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salt_is_deterministic(spark, sf_dir):
    from dynamodb_stream_processor_2_0_spark.operators.skew import with_salt

    ev = load_table(spark, sf_dir, "events").select("event_id")
    a = with_salt(ev, "event_id", 16).collect()
    b = with_salt(ev, "event_id", 16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    salts = {r[1] for r in a}
    assert salts == set(range(16))
