"""Temporal join operators Spark lacks natively (SURVEY.md §2.7
"custom operators"): as-of join and band/range join.

Both are implemented as compositions of existing DataFrame ops (the
preferred path) with scale-correct plan shapes:

- As-of join: the union-and-window formulation — tag both streams,
  union, per-key window ordered by time with ``last_value(ignoreNulls)``
  carrying the most recent right-side row forward, then keep left rows.
  ONE shuffle on the key (no range explosion, no per-row probe); this is
  the standard distributed as-of used for trade/quote-style alignment.
- Band join: time-bucketed equi-join — each left row joins only its
  own and adjacent buckets, turning an inequality join into an
  equi-join with a residual filter. Shuffle is keyed on
  (key, bucket), so cost is O(rows x bucket_pair_density), never the
  n^2 of a naive theta join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
) -> DataFrame:
    """For every left row, attach ``right_vals`` from the latest right
    row with the same ``key`` and ``right_ts`` <= ``left_ts``; null when
    no right row precedes. Ties on right_ts must be pre-resolved by the
    caller (one row per (key, right_ts)) for determinism."""
    lt = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("__ts"),
            *[F.col(c) for c in right_vals],
        )
        .withColumn("__side", F.lit(0))
    )
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in right_vals:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None).cast(dict(rt.dtypes)[c]))
    unioned = lt.select(rt.columns).unionByName(rt.select(rt.columns))
    # right rows sort before left rows at the same timestamp (__side 0
    # first), so a left row at exactly right_ts sees that right row.
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"__asof_{c}")
            for c in right_vals
        ],
    )
    out = carried.filter(F.col("__side") == 1).drop("__side", *right_vals)
    for c in right_vals:
        out = out.withColumnRenamed(f"__asof_{c}", c)
    return out.drop("__ts")


def band_join_count(
    df: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    band_seconds: int,
) -> DataFrame:
    """Per row: how many OTHER rows with the same key fall within
    [ts - band, ts + band]. Bucketed equi-join: rows land in bucket
    floor(epoch/band); each row probes its own bucket plus both
    neighbors, and the exact band predicate filters residuals."""
    bucket = (F.unix_timestamp(F.col(ts)) / band_seconds).cast("bigint")
    a = df.select(
        F.col(key), F.col(id_col).alias("a_id"), F.col(ts).alias("a_ts"), bucket.alias("b")
    )
    b = df.select(
        F.col(key), F.col(id_col).alias("b_id"), F.col(ts).alias("b_ts"), bucket.alias("bb")
    )
    probes = a.withColumn("probe", F.explode(F.array(F.col("b") - 1, F.col("b"), F.col("b") + 1)))
    joined = probes.join(b, (probes[key] == b[key]) & (F.col("probe") == F.col("bb"))).drop(b[key])
    in_band = (
        F.abs(F.unix_timestamp("a_ts") - F.unix_timestamp("b_ts")) <= band_seconds
    ) & (F.col("a_id") != F.col("b_id"))
    return (
        joined.filter(in_band)
        .groupBy(key, "a_id")
        .agg(F.count(F.lit(1)).alias("n_neighbors"))
    )
