"""User-defined aggregate / table functions (SURVEY §2.7: the
reference has "no UDAF/UDTF surface" — this is the engine's).

Both are the Arrow path, never row-at-a-time Python:
- the UDAF is a grouped-agg ``pandas_udf`` (one vectorized call per
  group partition, map-side combine unavailable to Python aggs, so the
  groupBy shuffles raw (value, weight) pairs — acceptable for
  moderate-cardinality groups; for billions-per-group prefer the
  built-in expression form);
- the UDTF is a Spark 4 Python table function fed by a lateral join,
  emitting multiple rows per input row in Arrow batches.

Determinism note: the UDAF reduces in int64 cents (exact, order
independent) and divides once at the boundary — a float sum inside
pandas would be partition-order dependent and could never hash-match
the oracle. Both callables are defined INSIDE the query builders so
cloudpickle ships them by value (a module-level function would pickle
by reference and require this package on the Python workers'
sys.path, which the driver's harness does not guarantee — see
operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dynamodb_stream_processor_2_0_spark.plans.registry import register
from dynamodb_stream_processor_2_0_spark.sources.catalog import load_table


@register(
    "udaf_weighted_value",
    oracle="""
        WITH t AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   COALESCE(TRY_CAST(json_extract_string(props, '$.k')
                                     AS INTEGER), 0) AS k
            FROM events
            WHERE value IS NOT NULL
        )
        SELECT event_type,
               CAST(sum(cents * k) AS DOUBLE)
                   / (100.0 * greatest(sum(k), 1)) AS weighted_value,
               CAST(sum(k) AS BIGINT) AS total_weight,
               count(*) AS n
        FROM t
        GROUP BY event_type
    """,
    tags=("udaf", "extension", "agg"),
    doc="Grouped-aggregate pandas UDAF: k-weighted mean of value per "
    "event_type, reduced in exact int64 cents inside the UDF (order-"
    "independent) with one double division at the boundary.",
)
def udaf_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # annotations set as real objects: this module uses
    # `from __future__ import annotations`, which would turn inline
    # hints into strings pandas_udf cannot inspect
    def weighted_mean(cents, k):
        num = int((cents * k).sum())
        den = int(k.sum())
        return float(num) / (100.0 * max(den, 1))

    weighted_mean.__annotations__ = {
        "cents": pd.Series, "k": pd.Series, "return": float,
    }
    weighted_mean = pandas_udf("double")(weighted_mean)

    def weight_sum(k):
        return int(k.sum())

    weight_sum.__annotations__ = {"k": pd.Series, "return": int}
    weight_sum = pandas_udf("long")(weight_sum)

    # Spark refuses to mix pandas UDAFs with built-in aggregates in one
    # agg (INVALID_PANDAS_UDF_PLACEMENT), so the row count is a pandas
    # UDAF too.
    def row_count(k):
        return len(k)

    row_count.__annotations__ = {"k": pd.Series, "return": int}
    row_count = pandas_udf("long")(row_count)

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    prepared = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.coalesce(
            F.expr("try_cast(get_json_object(props, '$.k') AS int)"), F.lit(0)
        ).alias("k"),
    )
    return prepared.groupBy("event_type").agg(
        weighted_mean("cents", "k").alias("weighted_value"),
        weight_sum("k").alias("total_weight"),
        row_count("k").alias("n"),
    )


@register(
    "udtf_token_positions",
    oracle="""
        WITH sampled AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 20 = 0
        ), toks AS (
            SELECT doc_id, string_split(text, ' ') AS ts FROM sampled
        ), expanded AS (
            SELECT doc_id,
                   unnest(list_transform(range(len(ts)),
                          i -> struct_pack(pos := i, tok := ts[i + 1]))) AS e
            FROM toks
        )
        SELECT doc_id,
               CAST(e.pos AS INTEGER) AS pos,
               e.tok AS token,
               CAST(length(e.tok) AS INTEGER) AS token_len
        FROM expanded
        WHERE length(e.tok) > 0
    """,
    tags=("udtf", "extension", "text"),
    doc="Python UDTF (Spark 4): one input document row expands to "
    "(position, token, length) rows via a lateral join — the table-function "
    "surface the reference lacks; oracle is DuckDB's unnest-with-index.",
)
def udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDTF runs over a 5% doc sample (UDTFs are the slow path —
    fine for expansion logic too irregular for builtins, but this
    particular expansion IS expressible with posexplode; the point here
    is exercising the UDTF surface against the same oracle).
    useArrow=True pins the Arrow-batched eval path (ArrowEvalPythonUDTF
    in the plan) regardless of session conf — row-at-a-time
    BatchEvalPython is banned engine-wide by the plan lint."""
    from pyspark.sql.functions import lit, udtf

    @udtf(
        returnType="doc_id: long, pos: int, token: string, token_len: int",
        useArrow=True,
    )
    class TokenPositions:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            for pos, tok in enumerate(text.split(" ")):
                if tok:
                    yield doc_id, pos, tok, len(tok)

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 20 == 0
    )
    docs.createOrReplaceTempView("udtf_docs_in")
    spark.udtf.register("token_positions", TokenPositions)
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.token, t.token_len "
        "FROM udtf_docs_in, LATERAL token_positions(doc_id, text) t"
    )


@register(
    "grouped_pandas_robust_outliers",
    oracle="""
        WITH ranked AS MATERIALIZED (
            SELECT user_id, event_id, value,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY value, event_id
                   ) AS rn,
                   count(*) OVER (PARTITION BY user_id) AS n
            FROM events
            WHERE value IS NOT NULL
        ), med AS (
            -- lo + (hi - lo) * 0.5, the exact formula the pandas-side
            -- kernel uses, so even-count medians are bit-identical
            SELECT a.user_id,
                   a.value + (b.value - a.value) * 0.5 AS median_value,
                   a.n
            FROM ranked a
            JOIN ranked b
              ON b.user_id = a.user_id AND b.rn = a.n - (a.n - 1) // 2
            WHERE a.rn = (a.n + 1) // 2
        ), dev AS MATERIALIZED (
            SELECT r.user_id, m.median_value, m.n,
                   abs(r.value - m.median_value) AS adev,
                   row_number() OVER (
                       PARTITION BY r.user_id
                       ORDER BY abs(r.value - m.median_value), r.event_id
                   ) AS rn
            FROM ranked r JOIN med m USING (user_id)
        ), mad AS (
            SELECT a.user_id, a.median_value, a.n,
                   a.adev + (b.adev - a.adev) * 0.5 AS mad
            FROM dev a
            JOIN dev b
              ON b.user_id = a.user_id AND b.rn = a.n - (a.n - 1) // 2
            WHERE a.rn = (a.n + 1) // 2
        )
        SELECT r.user_id,
               any_value(m.median_value) AS median_value,
               any_value(m.mad) AS mad,
               count(*) FILTER (
                   WHERE abs(r.value - m.median_value) > 3 * m.mad
               ) AS n_outliers,
               any_value(m.n) AS n_values
        FROM ranked r JOIN mad m USING (user_id)
        GROUP BY r.user_id
        ORDER BY r.user_id
    """,
    tags=("udaf", "extension", "grouped-map", "llm"),
    doc="Partition-grouped Pandas compute: per-user robust outlier "
    "stats — median, MAD, |v - med| > 3*MAD counts. One shuffle "
    "hash-partitions complete user groups, then mapInPandas runs ONE "
    "Python/Arrow round-trip per PARTITION with an in-process numpy "
    "groupby — measured 6x faster than the grouped-map applyInPandas "
    "form (12.7 s -> ~2 s at sf0.1: per-group Arrow transfer overhead "
    "dominates when groups are small; the same finding that pushes "
    "high-cardinality grouped UDFs to partition granularity at 100 TB). "
    "Median/MAD use lo + (hi-lo)*0.5 explicitly so the DuckDB oracle's "
    "self-join median is bit-identical (numpy's (a+b)/2 rounds "
    "differently in the last ulp).",
)
def grouped_pandas_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("user_id", "event_id", "value")
    )

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        # numpy end-to-end: pandas frame ops per tiny group cost ~8 ms
        # each and dominated the runtime (12.7 s for 1.5k groups)
        import numpy as np

        v = pdf["value"].to_numpy()
        eid = pdf["event_id"].to_numpy()
        n = len(v)

        def interp_median(sorted_vals):
            lo = sorted_vals[(n + 1) // 2 - 1]
            hi = sorted_vals[n - (n - 1) // 2 - 1]
            return lo + (hi - lo) * 0.5

        order = np.lexsort((eid, v))
        med = interp_median(v[order])
        adev = np.abs(v - med)
        mad = interp_median(adev[np.lexsort((eid, adev))])
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "median_value": [med],
                "mad": [mad],
                "n_outliers": [int((adev > 3 * mad).sum())],
                "n_values": [n],
            }
        )

    def stats_partition(batches):
        # one call per shuffle partition; chunks of the partition are
        # concatenated FIRST (a group may span Arrow chunks — the same
        # trap the delivery state machine fixed in round 2)
        whole = pd.concat(list(batches), ignore_index=True)
        if len(whole):
            yield pd.concat(
                [stats(g) for _, g in whole.groupby("user_id", sort=False)],
                ignore_index=True,
            )

    return (
        ev.repartition("user_id")
        .mapInPandas(
            stats_partition,
            "user_id long, median_value double, mad double, "
            "n_outliers long, n_values long",
        )
        .orderBy("user_id")
    )
