"""Unit tests for the advanced scale-pattern operators — edge cases the
sf-table parity gate cannot reach (64-bit keys beyond int32 in the
bitmap semi-join, crafted repetition profiles for the Gopher rules,
NULL-key matching in the null-safe join)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bitmap_semi_join_matches_semi_join_on_64bit_keys(spark):
    """The bucket/bit decomposition must hold for keys far beyond int32
    (bucket = key >> 6 stays long; only key % 64 < 64 is narrowed)."""
    big = 1 << 40
    fact = spark.createDataFrame(
        [(big + i,) for i in range(200)] + [(7,), (8,), (9,)], "k long"
    )
    dim = spark.createDataFrame(
        [(big + i,) for i in range(0, 200, 3)] + [(8,)], "k long"
    )
    dim_bits = (
        dim.select(
            F.shiftright("k", 6).alias("bucket"),
            F.expr("shiftleft(1L, int(k % 64))").alias("bit"),
        )
        .groupBy("bucket")
        .agg(F.bit_or("bit").alias("mask"))
    )
    via_bitmap = (
        fact.join(
            F.broadcast(dim_bits),
            F.shiftright(F.col("k"), 6) == F.col("bucket"),
        )
        .filter(
            F.col("mask").bitwiseAND(F.expr("shiftleft(1L, int(k % 64))")) != 0
        )
        .select("k")
    )
    via_semi = fact.join(dim, "k", "left_semi")
    got = sorted(r.k for r in via_bitmap.collect())
    want = sorted(r.k for r in via_semi.collect())
    assert got == want and len(got) == 68  # 67 big keys + key 8


def test_gopher_repetition_flags_degenerate_doc(spark, tmp_path):
    """A doc that is one bigram repeated must be dropped; a doc of all
    distinct tokens must be kept; a single-token doc yields no bigrams
    and is excluded from the bigram-stats output (no sequence() blowup)."""
    docs = spark.createDataFrame(
        [
            (1, "spam ham spam ham spam ham spam ham", "en", "t", 35),
            (2, "one two three four five six seven eight", "en", "t", 39),
            (3, "solo", "en", "t", 4),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out_dir = str(tmp_path / "docs")
    docs.coalesce(1).write.mode("overwrite").parquet(out_dir + "/documents.parquet")
    from dynamodb_stream_processor_2_0_spark.plans import registry

    rows = {
        r.doc_id: r
        for r in registry.get("text_gopher_repetition")
        .fn(spark, out_dir)
        .collect()
    }
    assert not rows[1].gopher_keep  # top bigram "ham spam"/"spam ham" dominates
    assert rows[1].distinct_token_frac == 2 / 8
    assert rows[2].gopher_keep
    assert rows[2].top_bigram_frac == 1 / 7
    assert 3 not in rows  # no bigrams -> no row, and no sequence(2,1) descent


def test_nullsafe_join_keeps_null_partition(spark):
    left = spark.createDataFrame([("a",), (None,), (None,)], "lk string")
    right = spark.createDataFrame([("a", 1), (None, 2)], "rk string, v int")
    joined = left.join(right, F.col("lk").eqNullSafe(F.col("rk")), "inner")
    # 1 'a' match + 2 NULL<=>NULL matches
    assert joined.count() == 3


def test_incremental_rollup_snapshot_equals_batch(spark, sf_dir):
    from dynamodb_stream_processor_2_0_spark.plans import registry
    from dynamodb_stream_processor_2_0_spark.sources.catalog import load_table

    snap = {
        r.event_type: (r.n_events, r.sum_cents)
        for r in registry.get("streaming_incremental_rollup_e2e")
        .fn(spark, sf_dir)
        .collect()
    }
    batch = {
        r.event_type: (r.n, r.s)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"),
        )
        .collect()
    }
    assert snap == batch
