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
        chunks = list(batches)
        if not chunks:
            return  # empty partition: pd.concat([]) would raise
        whole = pd.concat(chunks, ignore_index=True)
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


# --- banded dynamic-time-warping similarity --------------------------------

_DTW_N = 16  # weeks per series (zero-filled from the global min week)
_DTW_BAND = 4  # Sakoe-Chiba band: |i-j| <= 4
_DTW_BIG = 1 << 42


def _dtw_oracle_sql() -> str:
    n, band, big = _DTW_N, _DTW_BAND, _DTW_BIG
    ctes = [f"""ev AS (
        SELECT event_type,
               datediff('day', DATE '2024-01-01',
                        CAST(date_trunc('day', ts) AS DATE)) // 7 AS w,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ), w0 AS (SELECT min(w) AS w0 FROM ev),
    weekly AS (
        SELECT event_type, w - (SELECT w0 FROM w0) AS i0,
               CAST(sum(cents) AS BIGINT) AS c
        FROM ev GROUP BY 1, 2
    ), types AS (SELECT DISTINCT event_type FROM ev),
    spine AS (
        SELECT t.event_type, r.range AS i0
        FROM types t CROSS JOIN range({n}) r
    ), series AS (
        SELECT s.event_type, s.i0 + 1 AS idx, COALESCE(wk.c, 0) AS c
        FROM spine s LEFT JOIN weekly wk
          ON wk.event_type = s.event_type AND wk.i0 = s.i0
    ), pairs AS (
        SELECT a.event_type AS ta, b.event_type AS tb
        FROM types a JOIN types b ON a.event_type < b.event_type
    ), cells AS MATERIALIZED (
        SELECT p.ta, p.tb, ia.idx AS i, jb.idx AS j,
               CAST(abs(ia.c - jb.c) AS BIGINT) AS delta
        FROM pairs p
        JOIN series ia ON ia.event_type = p.ta
        JOIN series jb ON jb.event_type = p.tb
        WHERE abs(ia.idx - jb.idx) <= {band}
    ), dp2 AS MATERIALIZED (
        SELECT ta, tb, i, j, delta AS cost
        FROM cells WHERE i = 1 AND j = 1
    )"""]
    for d in range(3, 2 * n + 1):
        p3 = (
            f"""LEFT JOIN dp{d - 2} p3 ON p3.ta = c.ta AND p3.tb = c.tb
                AND p3.i = c.i - 1 AND p3.j = c.j - 1"""
            if d > 3
            else ""
        )
        p3cost = f"COALESCE(p3.cost, {big})" if d > 3 else f"{big}"
        ctes.append(f"""dp{d} AS MATERIALIZED (
            SELECT c.ta, c.tb, c.i, c.j,
                   c.delta + least(COALESCE(p1.cost, {big}),
                                   COALESCE(p2.cost, {big}),
                                   {p3cost}) AS cost
            FROM cells c
            LEFT JOIN dp{d - 1} p1 ON p1.ta = c.ta AND p1.tb = c.tb
                AND p1.i = c.i - 1 AND p1.j = c.j
            LEFT JOIN dp{d - 1} p2 ON p2.ta = c.ta AND p2.tb = c.tb
                AND p2.i = c.i AND p2.j = c.j - 1
            {p3}
            WHERE c.i + c.j = {d}
        )""")
    return f"""
        WITH {', '.join(ctes)}, final AS (
            SELECT ta, tb, CAST(cost AS BIGINT) AS cost
            FROM dp{2 * n} WHERE i = {n} AND j = {n}
        ), ranked AS (
            SELECT *, row_number() OVER (ORDER BY cost ASC, ta, tb) AS rank
            FROM final
        )
        SELECT CAST(rank AS INTEGER) AS rank, ta AS type_a, tb AS type_b,
               CAST({n} AS BIGINT) AS n_weeks, cost AS dtw_cost_cents,
               cost // {2 * n - 1} AS per_cell_cents
        FROM ranked ORDER BY rank
    """


@register(
    "timeseries_dtw_weekly_similarity",
    oracle=_dtw_oracle_sql(),
    tags=("timeseries", "similarity", "mapInPandas"),
    doc="Dynamic time warping between every pair of event types' "
    "16-week revenue curves (Sakoe-Chiba band 4): the elastic "
    "distance that matches curves with shifted/stretched timing, "
    "which no lag-aligned metric in the registry (correlation, "
    "Theil-Sen, KS) can express — the similarity search primitive "
    "for 'which series behave alike' retrieval over time-series "
    "corpora. The DP is sequential by nature, so the Spark side "
    "runs it as an Arrow-batched mapInPandas kernel over the "
    "10-row pair relation (each pair's 16x16 banded grid is "
    "microseconds of numpy; series assembly IS distributed — "
    "weekly rollup + spine zero-fill + one collect_list per type), "
    "and the DuckDB oracle computes the IDENTICAL recurrence as 30 "
    "unrolled anti-diagonal CTEs with COALESCE-BIG boundary "
    "handling, so every cell of the warping matrix is "
    "cross-engine-exact in BIGINT cents (each diagonal CTE is "
    "MATERIALIZED — without it DuckDB inlines dp(d-1) twice per "
    "level and the plan expands exponentially, found the hard "
    "way). At corpus scale the same "
    "kernel runs per pair-partition: state is O(band * n) per "
    "pair, pairs parallelize embarrassingly.",
)
def timeseries_dtw_weekly_similarity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    n, band, big = _DTW_N, _DTW_BAND, _DTW_BIG
    events = load_table(spark, sf_dir, "events")
    ev = events.select(
        "event_type",
        F.expr(
            "datediff(date_trunc('day', ts), date'2024-01-01') div 7"
        ).alias("w"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w0 = F.broadcast(ev.agg(F.min("w").alias("w0")))
    weekly = (
        ev.crossJoin(w0)
        .select(
            "event_type", (F.col("w") - F.col("w0")).alias("i0"), "cents"
        )
        .groupBy("event_type", "i0")
        .agg(F.sum("cents").cast("long").alias("c"))
    )
    types = ev.select("event_type").distinct()
    spine = types.select(
        "event_type",
        F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("i0"),
    )
    series = (
        spine.join(weekly, ["event_type", "i0"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0).cast("long")))
        .groupBy("event_type")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(i0, c))),"
                " s -> s.c)"
            ).alias("arr")
        )
    )
    pairs = (
        series.select(
            F.col("event_type").alias("ta"), F.col("arr").alias("arr_a")
        )
        .join(
            series.select(
                F.col("event_type").alias("tb"), F.col("arr").alias("arr_b")
            ),
            F.col("ta") < F.col("tb"),
        )
    )

    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"type_a": [], "type_b": [], "dtw_cost_cents": []}
            for ta, tb, aa, bb in zip(
                pdf["ta"], pdf["tb"], pdf["arr_a"], pdf["arr_b"]
            ):
                a = np.asarray(list(aa), dtype=np.int64)
                b = np.asarray(list(bb), dtype=np.int64)
                m = len(a)
                dp = np.full((m + 1, m + 1), big, dtype=np.int64)
                dp[0, 0] = 0
                for i in range(1, m + 1):
                    for j in range(max(1, i - band), min(m, i + band) + 1):
                        d = abs(int(a[i - 1]) - int(b[j - 1]))
                        dp[i, j] = d + min(
                            dp[i - 1, j], dp[i, j - 1], dp[i - 1, j - 1]
                        )
                out["type_a"].append(ta)
                out["type_b"].append(tb)
                out["dtw_cost_cents"].append(int(dp[m, m]))
            yield pd.DataFrame(out)

    scored = pairs.mapInPandas(
        run, "type_a string, type_b string, dtw_cost_cents long"
    )
    top = scored.orderBy(
        F.col("dtw_cost_cents").asc(), "type_a", "type_b"
    ).limit(100)
    from pyspark.sql import Window

    wrank = Window.orderBy(
        F.col("dtw_cost_cents").asc(), "type_a", "type_b"
    )
    return (
        top.withColumn("rank", F.row_number().over(wrank))
        .select(
            "rank",
            "type_a",
            "type_b",
            F.lit(n).cast("long").alias("n_weeks"),
            "dtw_cost_cents",
            F.expr(f"dtw_cost_cents div {2 * n - 1}").alias(
                "per_cell_cents"
            ),
        )
        .orderBy("rank")
    )
