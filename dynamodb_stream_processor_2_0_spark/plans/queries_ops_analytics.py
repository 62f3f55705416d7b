"""Mergeable sketches, embedding compression, and operational
analytics: KMV distinct/intersection/difference, Count-Min join-size
and histogram-quantile sketches, PQ-ADC and Matryoshka embedding
top-k, SimHash threshold sweep, media digest/pHash dedup, CCNet
bucket mix, interval joins (overlap + Allen algebra), RFM migration,
Little's law, backlog, bin packing, ABC/XYZ, Lindley queue delay,
drawdown, SCD2 as-of enrichment, and FK cascade impact.

Split out of the round-5/6 analytics extension module (one theme per
module, registration order preserved by DRIVER_SAMPLE_PRIORITY).
Sketches are mergeable by construction (per-partition bottom-k /
counter grids unioned without re-scanning raw data) — the property
that makes them 100 TB-viable.

House arithmetic rules apply: exact BIGINT / DECIMAL grids, truncating
division only on non-negative operands, sign extracted before any
floored ratio, md5-derived hashes shared bit-for-bit with DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from dynamodb_stream_processor_2_0_spark.plans.registry import register
from dynamodb_stream_processor_2_0_spark.sources.catalog import load_table


# --- KMV distinct sketch ---------------------------------------------------

_KMV_K = 64
# 52-bit hash space: 13 hex chars of md5. (k-1) * 2^52 fits BIGINT
# (63 * 4.5e15 ~ 2.8e17 << 9.2e18), so the estimator stays in exact
# truncating BIGINT division on both engines.
_KMV_HASH_HEX = 13
_KMV_SPACE = 1 << (4 * _KMV_HASH_HEX)

_KMV_ORACLE = f"""
    WITH hashed AS (
        SELECT DISTINCT event_type AS scope,
               CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                   1, {_KMV_HASH_HEX}) AS BIGINT) AS h
        FROM events
        UNION
        SELECT DISTINCT '__all__' AS scope,
               CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                   1, {_KMV_HASH_HEX}) AS BIGINT) AS h
        FROM events
    ), ranked AS (
        SELECT scope, h,
               row_number() OVER (PARTITION BY scope ORDER BY h ASC) AS rn,
               count(*) OVER (PARTITION BY scope) AS n_exact
        FROM hashed
    ), sk AS (
        SELECT scope, max(n_exact) AS exact_distinct,
               count(*) AS k_used, max(h) AS hk
        FROM ranked WHERE rn <= {_KMV_K}
        GROUP BY scope
    ), est AS (
        SELECT scope, exact_distinct, k_used,
               CASE WHEN k_used < {_KMV_K} THEN k_used
                    ELSE ({_KMV_K - 1} * {_KMV_SPACE}) // hk
               END AS kmv_est
        FROM sk
    )
    SELECT scope, exact_distinct, k_used, kmv_est,
           CASE WHEN kmv_est >= exact_distinct THEN 1 ELSE -1 END
               * ((abs(kmv_est - exact_distinct) * 1000) // exact_distinct)
               AS err_permille
    FROM est
    ORDER BY scope
"""


@register(
    "sketch_kmv_distinct",
    oracle=_KMV_ORACLE,
    tags=("sketch", "agg", "A1", "scale"),
    doc="KMV (k-minimum-values, k=64) distinct-user sketch per "
    "event_type plus the MERGED '__all__' union — the mergeable "
    "cardinality sketch (Bar-Yossef et al.) that lets 100 TB of "
    "per-partition bottom-k states combine without re-scanning raw "
    "data: union-of-sketches = bottom-k of concatenated hash sets, "
    "exactly what the '__all__' arm computes. Hashes are md5-derived "
    "52-bit BIGINTs shared with the oracle; estimator (k-1)*2^52/h_k "
    "in truncating BIGINT division; small scopes (|D|<k) fall back to "
    "exact. The realized error lands in err_permille with the sign "
    "extracted before the floored ratio.",
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-scope bottom-k is ONE window over the distinct hash set
    (shuffle on scope); at scale the same sketch is map-side partial:
    per-partition bottom-k then re-rank — the registered shape keeps
    the merge law visible via the '__all__' arm."""
    events = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, _KMV_HASH_HEX),
        16,
        10,
    ).cast("long")
    per_type = events.select(
        F.col("event_type").alias("scope"), h.alias("h")
    ).distinct()
    overall = events.select(
        F.lit("__all__").alias("scope"), h.alias("h")
    ).distinct()
    hashed = per_type.unionByName(overall)
    wrank = Window.partitionBy("scope").orderBy(F.col("h").asc())
    wall = Window.partitionBy("scope")
    ranked = hashed.select(
        "scope",
        "h",
        F.row_number().over(wrank).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n_exact"),
    )
    sk = (
        ranked.filter(F.col("rn") <= _KMV_K)
        .groupBy("scope")
        .agg(
            F.max("n_exact").alias("exact_distinct"),
            F.count(F.lit(1)).alias("k_used"),
            F.max("h").alias("hk"),
        )
    )
    est = sk.select(
        "scope",
        "exact_distinct",
        "k_used",
        F.when(F.col("k_used") < _KMV_K, F.col("k_used"))
        .otherwise(F.expr(f"{_KMV_K - 1}L * {_KMV_SPACE}L div hk"))
        .alias("kmv_est"),
    )
    return est.select(
        "scope",
        "exact_distinct",
        "k_used",
        "kmv_est",
        (
            F.when(F.col("kmv_est") >= F.col("exact_distinct"), 1).otherwise(
                -1
            )
            * F.expr(
                "abs(kmv_est - exact_distinct) * 1000 div exact_distinct"
            )
        ).alias("err_permille"),
    ).orderBy("scope")

# --- banded interval-overlap join -----------------------------------------

_OVERLAP_ORACLE = """
    WITH iv AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               min(hour(ts) * 3600 + minute(ts) * 60 + second(ts)) AS s,
               max(hour(ts) * 3600 + minute(ts) * 60 + second(ts)) AS e
        FROM events
        GROUP BY 1, 2
    )
    SELECT CAST(a.day AS VARCHAR) AS day,
           count(*) AS n_pairs,
           CAST(sum(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT)
               AS sum_overlap_sec
    FROM iv a JOIN iv b
      ON a.day = b.day AND a.user_id < b.user_id
     AND a.s <= b.e AND b.s <= a.e
    GROUP BY 1
    ORDER BY 1
"""


@register(
    "interval_overlap_join",
    oracle=_OVERLAP_ORACLE,
    tags=("window", "timeseries", "scale"),
    doc="Interval-overlap census: per (user, day) activity intervals "
    "[first event, last event] (seconds-of-day, extracted from "
    "wall-clock fields — time-zone-free on TIMESTAMP_NTZ), reporting "
    "concurrently-active user-pair counts and total pairwise overlap "
    "seconds per day. Scale shape: NO pair is materialized — both "
    "outputs are aggregates, so the plan is a sorted-ENDPOINT sweep, "
    "all Catalyst: n_pairs = C(n,2) minus disjoint pairs (each "
    "counted once at its later-starting member via a running "
    "ends-before-start count), and sum_overlap_sec = the integral of "
    "C(k(t),2) over time (k = active-interval count; every pair of "
    "the k concurrently-active intervals overlaps during a "
    "constant-k segment, so segment-length x C(k,2) summed over "
    "segments equals the pairwise overlap sum exactly). O(n log n) "
    "per day instead of the former banded pair join's O(pairs) = "
    "O(n^2/day) — the git-history banded form remains the right "
    "shape only when the pairs THEMSELVES are the output. The oracle "
    "is the declarative theta-join, proving both sweep identities "
    "exact.",
)
def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Endpoint-sweep rewrite (r12) of the r5 banded pair join. Per
    day, endpoints (s, +1) / (e, -1) are grouped per distinct value v
    — [s, e) coverage semantics: an interval is active on [s, e), so
    a pair touching at e_a = s_b overlaps 0 seconds yet still counts
    in n_pairs (the oracle's closed-interval join predicate) — then
    one window pass per day computes (a) ends_before: ends strictly
    below v, charged to the starts at v (-> disjoint-pair count) and
    (b) k: the running active count, charged C(k,2) * (next_v - v)
    for the constant-k segment. n per day is the sum of starts, so
    no second aggregation over iv is needed. Three tiny shuffles
    past the events aggregate (distinct endpoint values per day, not
    pairs); at sf1.0 the former pair join materialized 1.708B pairs
    (51 s) — this form never leaves O(distinct endpoints).
    Measured 5.76 s -> ~1.5 s at sf0.1."""
    events = load_table(spark, sf_dir, "events")
    sec = (
        F.hour("ts") * 3600 + F.minute("ts") * 60 + F.second("ts")
    ).cast("long")
    iv = events.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.min(sec).alias("s"), F.max(sec).alias("e")
    )
    pts = (
        iv.select(
            "day",
            F.explode(
                F.array(
                    F.struct(
                        F.col("s").alias("v"),
                        F.lit(1).alias("st"),
                        F.lit(0).alias("en"),
                    ),
                    F.struct(
                        F.col("e").alias("v"),
                        F.lit(0).alias("st"),
                        F.lit(1).alias("en"),
                    ),
                )
            ).alias("p"),
        )
        .select("day", "p.v", "p.st", "p.en")
        .groupBy("day", "v")
        .agg(
            F.sum("st").cast("long").alias("st"),
            F.sum("en").cast("long").alias("en"),
        )
    )
    w = Window.partitionBy("day").orderBy("v")
    swept = pts.select(
        "day",
        "v",
        "st",
        F.coalesce(
            F.sum("en").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("long"),
        ).alias("ends_before"),
        F.sum(F.col("st") - F.col("en"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("k"),
        F.lead("v").over(w).alias("next_v"),
    )
    return (
        swept.groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum("st").alias("n"),
            F.sum(F.col("st") * F.col("ends_before")).alias("disjoint"),
            F.sum(
                F.expr("k * (k - 1) div 2")
                * F.coalesce(F.col("next_v") - F.col("v"), F.lit(0))
            )
            .cast("long")
            .alias("sum_overlap_sec"),
        )
        .select(
            "day",
            (F.expr("n * (n - 1) div 2") - F.col("disjoint")).alias(
                "n_pairs"
            ),
            "sum_overlap_sec",
        )
        .filter(F.col("n_pairs") > 0)
        .orderBy("day")
    )

# --- product-quantization ANN ---------------------------------------------

_PQ_M = 4  # sub-blocks
_PQ_SUB = 16  # dims per block (64-dim embeddings)
_PQ_K = 8  # codes per block
_PQ_TRAIN_LO, _PQ_TRAIN_HI = 8, 16  # training vec_ids -> codes 0..7
_PQ_GRID = 1000  # fixed-point grid; floor() (never round) — no half-ties
_PQ_TOPK = 10

_PQ_ORACLE = f"""
    WITH comp AS (
        SELECT vec_id, p - 1 AS pos,
               (p - 1) // {_PQ_SUB} AS block,
               CAST(floor(CAST(embedding[p] AS DOUBLE) * {_PQ_GRID})
                    AS BIGINT) AS vi
        FROM embeddings, range(1, {_PQ_SUB * _PQ_M} + 1) t(p)
    ), codebook AS (
        SELECT vec_id - {_PQ_TRAIN_LO} AS code, block, pos, vi AS ci
        FROM comp
        WHERE vec_id >= {_PQ_TRAIN_LO} AND vec_id < {_PQ_TRAIN_HI}
    ), assign_d AS (
        SELECT c.vec_id, c.block, cb.code,
               sum((c.vi - cb.ci) * (c.vi - cb.ci)) AS d2
        FROM comp c
        JOIN codebook cb ON cb.block = c.block AND cb.pos = c.pos
        WHERE c.vec_id >= {_PQ_TRAIN_LO}
        GROUP BY 1, 2, 3
    ), codes AS (
        SELECT vec_id, block, code FROM (
            SELECT vec_id, block, code,
                   row_number() OVER (
                       PARTITION BY vec_id, block
                       ORDER BY d2 ASC, code ASC
                   ) AS rn
            FROM assign_d
        ) WHERE rn = 1
    ), qdist AS (
        SELECT c.vec_id AS query_id, c.block, cb.code,
               sum((c.vi - cb.ci) * (c.vi - cb.ci)) AS qd2
        FROM comp c
        JOIN codebook cb ON cb.block = c.block AND cb.pos = c.pos
        WHERE c.vec_id < 8
        GROUP BY 1, 2, 3
    ), adc AS (
        SELECT q.query_id, k.vec_id AS cand_id,
               CAST(sum(q.qd2) AS BIGINT) AS adc_dist
        FROM codes k
        JOIN qdist q ON q.block = k.block AND q.code = k.code
        GROUP BY 1, 2
    )
    SELECT query_id, rank, cand_id, adc_dist FROM (
        SELECT query_id, cand_id, adc_dist,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY adc_dist ASC, cand_id ASC
               ) AS rank
        FROM adc
    ) WHERE rank <= {_PQ_TOPK}
    ORDER BY query_id, rank
"""


@register(
    "embedding_pq_adc_topk",
    oracle=_PQ_ORACLE,
    tags=("similarity", "llm", "ann", "scale"),
    doc="Product-quantization ANN (the FAISS-style fourth member of "
    "the ANN family next to sign-LSH / IVF / int8): vectors split "
    "into 4x16-dim blocks, each block assigned to the nearest of 8 "
    "codebook entries (codebook = pinned training vectors — "
    "deterministic, no k-means float drift), queries scored against "
    "candidates via asymmetric-distance lookup (ADC): distance = sum "
    "of per-block query-to-centroid distances, a 256-entry table "
    "join instead of any vector math per candidate. All arithmetic "
    "is exact BIGINT on a floor()-quantized fixed-point grid — "
    "floor, never round, so no cross-engine half-tie on dyadic "
    "floats. At 100 TB the codebook + per-query ADC tables broadcast "
    "(KBs) and the candidate side carries only (vec_id, block, code) "
    "ints — 8 bytes/block instead of 256 floats.",
)
def embedding_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assignment joins the exploded components against a broadcast
    codebook and argmins per (vec, block) — one shuffle on vec_id;
    the ADC phase never touches raw vectors again."""
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "vec_id",
        F.posexplode("embedding").alias("pos", "v"),
    ).select(
        "vec_id",
        "pos",
        F.expr(f"pos div {_PQ_SUB}").alias("block"),
        F.floor(F.col("v").cast("double") * _PQ_GRID)
        .cast("long")
        .alias("vi"),
    )
    codebook = (
        comp.filter(
            (F.col("vec_id") >= _PQ_TRAIN_LO)
            & (F.col("vec_id") < _PQ_TRAIN_HI)
        )
        .select(
            (F.col("vec_id") - _PQ_TRAIN_LO).alias("code"),
            "block",
            "pos",
            F.col("vi").alias("ci"),
        )
    )
    d2 = (F.col("vi") - F.col("ci")) * (F.col("vi") - F.col("ci"))
    assign_d = (
        comp.filter(F.col("vec_id") >= _PQ_TRAIN_LO)
        .join(F.broadcast(codebook), ["block", "pos"])
        .groupBy("vec_id", "block", "code")
        .agg(F.sum(d2).alias("d2"))
    )
    wmin = Window.partitionBy("vec_id", "block").orderBy(
        F.col("d2").asc(), F.col("code").asc()
    )
    codes = (
        assign_d.withColumn("rn", F.row_number().over(wmin))
        .filter(F.col("rn") == 1)
        .select("vec_id", "block", "code")
    )
    qdist = (
        comp.filter(F.col("vec_id") < 8)
        .join(F.broadcast(codebook), ["block", "pos"])
        .groupBy(
            F.col("vec_id").alias("query_id"), F.col("block"), F.col("code")
        )
        .agg(F.sum(d2).alias("qd2"))
    )
    adc = (
        codes.join(F.broadcast(qdist), ["block", "code"])
        .groupBy("query_id", F.col("vec_id").alias("cand_id"))
        .agg(F.sum("qd2").cast("long").alias("adc_dist"))
    )
    wtop = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("cand_id").asc()
    )
    return (
        adc.withColumn("rank", F.row_number().over(wtop))
        .filter(F.col("rank") <= _PQ_TOPK)
        .select("query_id", "rank", "cand_id", "adc_dist")
        .orderBy("query_id", "rank")
    )

# --- RFM segment migration matrix ------------------------------------------

_RFM_MIGRATION_ORACLE = """
    WITH bounds AS (
        SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
        FROM events
    ), mid AS (
        SELECT d0 + CAST((datediff('day', d0, d1) // 2) AS INTEGER) AS m
        FROM bounds
    ), spend AS (
        SELECT user_id,
               CASE WHEN CAST(ts AS DATE) < (SELECT m FROM mid)
                    THEN 'a' ELSE 'b' END AS period,
               sum(CAST(round(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY 1, 2
    ), tiers AS (
        SELECT user_id, period,
               ntile(4) OVER (PARTITION BY period
                              ORDER BY cents DESC, user_id ASC) AS tier
        FROM spend
    ), a AS (SELECT user_id, tier FROM tiers WHERE period = 'a'),
       b AS (SELECT user_id, tier FROM tiers WHERE period = 'b')
    SELECT COALESCE(a.tier, 0) AS tier_first_half,
           COALESCE(b.tier, 0) AS tier_second_half,
           count(*) AS n_users
    FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


@register(
    "rfm_migration_matrix",
    oracle=_RFM_MIGRATION_ORACLE,
    tags=("analytics", "window", "A1"),
    doc="Customer segment-migration matrix: users tiered into spend "
    "quartiles (ntile over a TOTAL order — cents desc, user asc — so "
    "tie assignment is deterministic cross-engine) independently in "
    "the first and second half of the timeline, then full-outer "
    "joined into a 5x5 transition matrix (tier 0 = absent: acquired "
    "/ churned users). The upgrade of the static rfm_customer_"
    "segments snapshot into segment DYNAMICS — the retention view "
    "marketing actually acts on. Shuffles: one (user, period) "
    "rollup, one per-period window over |users| rows, one join on "
    "user_id.",
)
def rfm_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The timeline split derives from a 1-row bounds aggregate
    (broadcast into the scan predicate), so the raw table is read
    once; all downstream relations are per-user aggregates."""
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    ).select(
        F.expr("date_add(d0, cast(datediff(d1, d0) div 2 AS int))").alias("m")
    )
    spend = (
        events.crossJoin(F.broadcast(bounds))
        .groupBy(
            "user_id",
            F.when(F.to_date("ts") < F.col("m"), "a")
            .otherwise("b")
            .alias("period"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
        )
    )
    wt = Window.partitionBy("period").orderBy(
        F.col("cents").desc(), F.col("user_id").asc()
    )
    tiers = spend.select(
        "user_id", "period", F.ntile(4).over(wt).alias("tier")
    )
    a = tiers.filter(F.col("period") == "a").select(
        "user_id", F.col("tier").alias("tier_a")
    )
    b = tiers.filter(F.col("period") == "b").select(
        "user_id", F.col("tier").alias("tier_b")
    )
    return (
        a.join(b, "user_id", "full_outer")
        .groupBy(
            F.coalesce("tier_a", F.lit(0)).alias("tier_first_half"),
            F.coalesce("tier_b", F.lit(0)).alias("tier_second_half"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("tier_first_half", "tier_second_half")
    )

# --- SimHash threshold-precision sweep -------------------------------------


def _simhash_sweep_oracle_sql() -> str:
    from dynamodb_stream_processor_2_0_spark.operators import dedup as D

    return f"""
        WITH fp AS (
            {D.simhash_oracle_sql(bits=32)}
        ), banded AS (
            SELECT doc_id, b.band,
                   (simhash // CAST(2 ** (8 * b.band) AS BIGINT)) % 256
                       AS byte_sig,
                   simhash
            FROM fp, (VALUES (0), (1), (2), (3)) AS b(band)
        ), cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)
                       AS hamming
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.byte_sig = b.byte_sig
             AND a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        ), tk AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ), sh AS (
            SELECT doc_id, unnest({D._shingles_sql(3)}) AS shingle FROM tk
        ), sizes AS (
            SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
        ), inter AS (
            SELECT c.doc_a, c.doc_b, c.hamming, count(*) AS i
            FROM cand c
            JOIN sh sa ON sa.doc_id = c.doc_a
            JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
            GROUP BY 1, 2, 3
        ), verified AS (
            SELECT c.doc_a, c.doc_b, c.hamming,
                   COALESCE(i.i, 0) AS i,
                   na.n + nb.n - COALESCE(i.i, 0) AS u
            FROM cand c
            JOIN sizes na ON na.doc_id = c.doc_a
            JOIN sizes nb ON nb.doc_id = c.doc_b
            LEFT JOIN inter i
              ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
        )
        SELECT t.t AS hamming_threshold,
               count(*) AS n_candidate_pairs,
               CAST(sum(CASE WHEN v.i * 2 >= v.u THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_true_dups,
               CAST(sum(CASE WHEN v.i * 2 >= v.u THEN 1 ELSE 0 END) * 1000
                    // count(*) AS BIGINT) AS precision_permille
        FROM verified v, (VALUES (0), (1), (2), (3)) t(t)
        WHERE v.hamming <= t.t
        GROUP BY t.t
        ORDER BY t.t
    """


@register(
    "dedup_simhash_threshold_sweep",
    oracle=_simhash_sweep_oracle_sql(),
    tags=("dedup", "llm", "simhash", "eval"),
    doc="Operating-point sweep for the SimHash dedup family: for each "
    "Hamming threshold t in 0..3 (the range where 4-byte banding "
    "guarantees complete recall by pigeonhole), candidate-pair count, "
    "exactly-verified true-dup count (trigram Jaccard >= 0.5, checked "
    "as i*2 >= u — no division), and precision in permille. This is "
    "the tuning harness that picks the production threshold from "
    "data instead of folklore — the same eval-first pattern as "
    "dedup_minhash_calibration but for the Hamming axis. Exact "
    "verification joins shingles ONLY for surviving candidates "
    "(bounded by the banded pair count, never all pairs).",
)
def dedup_simhash_threshold_sweep(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from dynamodb_stream_processor_2_0_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    fp = D.simhash(docs, bits=32)
    banded = fp.select(
        "doc_id",
        "simhash",
        F.explode(F.array(*[F.lit(x) for x in range(4)])).alias("band"),
    ).withColumn(
        "byte_sig", F.expr("(simhash div shiftleft(1L, 8 * band)) % 256")
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"), "band", "byte_sig",
        F.col("simhash").alias("sh_a"),
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), "band", "byte_sig",
        F.col("simhash").alias("sh_b"),
    )
    cand = (
        a.join(b, ["band", "byte_sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.expr("sh_a ^ sh_b")).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .distinct()
    )
    # Verification via per-doc sorted shingle ARRAYS instead of the
    # exploded intersection join (the dedup_prefix_filter_jaccard
    # pattern, measured 4.9 -> 2.5 s there): the old form pushed
    # |cand| x |shingles/doc| narrow rows through a join + groupBy AND
    # consumed `cand` twice (inter + verified), so the banded
    # simhash self-join — the expensive subtree — was computed twice
    # per action (plan had 16 parquet scans, 0 ReusedExchange). One
    # array per doc, one consumer of `cand`, intersection in
    # whole-stage codegen per candidate row. shingles_col already
    # emits DISTINCT shingles per doc, so set semantics are identical
    # (i = distinct-common count either way); docs with zero shingles
    # are dropped by the inner join in BOTH forms (the oracle's inner
    # JOIN sizes does the same).
    arr = (
        docs.withColumn("toks", D.tokens_col("text"))
        .select("doc_id", F.explode(D.shingles_col(k=3)).alias("shingle"))
        .groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list("shingle")).alias("vs"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    verified = (
        cand.join(
            arr.select(
                F.col("doc_id").alias("doc_a"),
                F.col("vs").alias("va"),
                F.col("n").alias("na"),
            ),
            "doc_a",
        )
        .join(
            arr.select(
                F.col("doc_id").alias("doc_b"),
                F.col("vs").alias("vb"),
                F.col("n").alias("nb"),
            ),
            "doc_b",
        )
        .select(
            "hamming",
            F.size(F.array_intersect("va", "vb")).cast("long").alias("i"),
            "na",
            "nb",
        )
        .select(
            "hamming",
            "i",
            (F.col("na") + F.col("nb") - F.col("i")).alias("u"),
        )
    )
    thresholds = spark.createDataFrame(
        [(t,) for t in range(4)], "t int"
    )
    return (
        verified.crossJoin(F.broadcast(thresholds))
        .filter(F.col("hamming") <= F.col("t"))
        .groupBy(F.col("t").alias("hamming_threshold"))
        .agg(
            F.count(F.lit(1)).alias("n_candidate_pairs"),
            F.sum(
                F.when(F.col("i") * 2 >= F.col("u"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_true_dups"),
            F.expr(
                "cast(sum(CASE WHEN i * 2 >= u THEN 1 ELSE 0 END) * 1000"
                " div count(1) AS bigint)"
            ).alias("precision_permille"),
        )
        .orderBy("hamming_threshold")
    )

# --- Matryoshka truncation recall ------------------------------------------

_MRL_DIMS = (8, 16, 32, 64)
_MRL_K = 5

_MRL_ORACLE = f"""
    WITH comp AS (
        SELECT vec_id, p - 1 AS pos,
               CAST(floor(CAST(embedding[p] AS DOUBLE) * 1000) AS BIGINT)
                   AS vi
        FROM embeddings, range(1, 65) t(p)
    ), prods AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id, q.pos,
               q.vi * c.vi AS pr
        FROM comp q JOIN comp c ON c.pos = q.pos
        WHERE q.vec_id < 8 AND c.vec_id >= 8
    ), scores AS (
        SELECT query_id, cand_id,
               {", ".join(f"CAST(sum(pr) FILTER (WHERE pos < {d}) AS BIGINT) AS ip{d}" for d in _MRL_DIMS)}
        FROM prods GROUP BY 1, 2
    ), ranked AS (
        SELECT query_id, cand_id,
               {", ".join(f"row_number() OVER (PARTITION BY query_id ORDER BY ip{d} DESC, cand_id ASC) AS rk{d}" for d in _MRL_DIMS)}
        FROM scores
    ), nq AS (SELECT count(DISTINCT query_id) AS n FROM ranked)
    {" UNION ALL ".join(f'''
    SELECT {d} AS dims,
           CAST(count(*) FILTER (WHERE rk{d} <= {_MRL_K}
                                 AND rk{_MRL_DIMS[-1]} <= {_MRL_K})
                AS BIGINT) AS n_hits,
           CAST(count(*) FILTER (WHERE rk{d} <= {_MRL_K}
                                 AND rk{_MRL_DIMS[-1]} <= {_MRL_K}) * 1000
                // ({_MRL_K} * (SELECT n FROM nq)) AS BIGINT)
               AS recall_permille
    FROM ranked''' for d in _MRL_DIMS)}
    ORDER BY dims
"""


@register(
    "embedding_matryoshka_recall",
    oracle=_MRL_ORACLE,
    tags=("similarity", "llm", "ann", "eval"),
    doc="Matryoshka truncation evaluation: inner-product top-5 "
    "retrieval run at prefix dimensions 8/16/32/64 of the same "
    "embeddings, reporting recall@5 of each truncation against the "
    "full-width ranking — the measurement that decides how many "
    "dimensions a 100 TB vector store actually needs to keep hot "
    "(MRL-style dim-elastic serving). ONE product join computes all "
    "four widths: per-(query,cand) prefix scores are conditional "
    "aggregates (FILTER pos < d) over a single exploded-product "
    "relation, so adding truncation levels costs aggregate columns, "
    "not extra scans. Scores are exact BIGINT on the floor-quantized "
    "grid; rankings are totally ordered (score desc, cand asc).",
)
def embedding_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The eval is brute-force BY DESIGN (8 probe queries, the exact
    arm of the ANN family); the one big relation is the 8 x |cands| x
    64 product stream, which partial-aggregates map-side."""
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "vec_id",
        "pos",
        F.floor(F.col("v").cast("double") * 1000).cast("long").alias("vi"),
    )
    q = comp.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "pos", F.col("vi").alias("qi")
    )
    c = comp.filter(F.col("vec_id") >= 8).select(
        F.col("vec_id").alias("cand_id"), "pos", F.col("vi").alias("ci")
    )
    scores = (
        c.join(F.broadcast(q), "pos")
        .groupBy("query_id", "cand_id")
        .agg(
            *[
                F.sum(
                    F.when(F.col("pos") < d, F.col("qi") * F.col("ci"))
                )
                .cast("long")
                .alias(f"ip{d}")
                for d in _MRL_DIMS
            ]
        )
    )
    ranked = scores.select(
        "query_id",
        "cand_id",
        *[
            F.row_number()
            .over(
                Window.partitionBy("query_id").orderBy(
                    F.col(f"ip{d}").desc(), F.col("cand_id").asc()
                )
            )
            .alias(f"rk{d}")
            for d in _MRL_DIMS
        ],
    )
    nq = ranked.agg(
        F.countDistinct("query_id").alias("n")
    )
    full = _MRL_DIMS[-1]
    arms = []
    for d in _MRL_DIMS:
        arms.append(
            ranked.crossJoin(F.broadcast(nq)).agg(
                F.lit(d).alias("dims"),
                F.sum(
                    F.when(
                        (F.col(f"rk{d}") <= _MRL_K)
                        & (F.col(f"rk{full}") <= _MRL_K),
                        1,
                    ).otherwise(0)
                )
                .cast("long")
                .alias("n_hits"),
                F.expr(
                    f"cast(sum(CASE WHEN rk{d} <= {_MRL_K} AND"
                    f" rk{full} <= {_MRL_K} THEN 1 ELSE 0 END) * 1000"
                    f" div ({_MRL_K} * first(n)) AS bigint)"
                ).alias("recall_permille"),
            )
        )
    u = arms[0]
    for arm in arms[1:]:
        u = u.unionByName(arm)
    return u.orderBy("dims")

# --- binary payload dedup by digest ----------------------------------------


@register(
    "multimodal_dedup_by_digest",
    oracle="""
        WITH bin AS (
            SELECT doc_id, md5(text) AS digest,
                   octet_length(encode(text)) AS n_bytes
            FROM documents
        ), grp AS (
            SELECT digest,
                   count(*) AS n_copies,
                   min(doc_id) AS canonical_id,
                   max(n_bytes) AS payload_bytes
            FROM bin GROUP BY digest
            HAVING count(*) > 1
        )
        SELECT digest, n_copies, canonical_id,
               CAST(payload_bytes AS BIGINT) AS payload_bytes,
               CAST((n_copies - 1) * payload_bytes AS BIGINT)
                   AS bytes_saved
        FROM grp
        ORDER BY digest
    """,
    tags=("multimodal", "dedup", "llm", "D5"),
    doc="Exact media dedup by content digest: binary payloads grouped "
    "on md5(payload), duplicate groups reported with the canonical "
    "(min-id) survivor and bytes reclaimed — the first pass every "
    "media corpus runs (identical files re-crawled under different "
    "ids dominate raw crawl bytes). The shuffle carries (digest, "
    "doc_id, n_bytes) — 32-byte keys — never payload bytes; at "
    "100 TB the payload column is scanned once, projected to its "
    "digest, and dropped before the exchange (the same "
    "never-shuffle-content rule as every dedup op here).",
)
def multimodal_dedup_by_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dynamodb_stream_processor_2_0_spark.operators import multimodal as MM

    bin_df = MM.documents_as_binary(load_table(spark, sf_dir, "documents"))
    return (
        bin_df.select(
            "doc_id",
            F.md5("payload").alias("digest"),
            F.octet_length("payload").alias("n_bytes"),
        )
        .groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_id"),
            F.max("n_bytes").alias("payload_bytes"),
        )
        .filter(F.col("n_copies") > 1)
        .select(
            "digest",
            "n_copies",
            "canonical_id",
            F.col("payload_bytes").cast("long"),
            ((F.col("n_copies") - 1) * F.col("payload_bytes"))
            .cast("long")
            .alias("bytes_saved"),
        )
        .orderBy("digest")
    )

# --- CCNet-style quality bucket mix ----------------------------------------


def _ccnet_oracle_sql() -> str:
    from dynamodb_stream_processor_2_0_spark.plans.registry import REGISTRY

    lm = REGISTRY["text_lm_surprisal_score"].oracle
    return f"""
        WITH lm AS (
            SELECT doc_id, sum_bits, n_bigrams FROM ({lm}) s
        ), docs AS (
            SELECT d.doc_id, d.source,
                   (l.sum_bits * 1000000) // l.n_bigrams AS milli_bits
            FROM documents d JOIN lm l USING (doc_id)
        ), tiered AS (
            SELECT source,
                   CASE ntile(3) OVER (ORDER BY milli_bits ASC, doc_id ASC)
                        WHEN 1 THEN 'head'
                        WHEN 2 THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM docs
        ), mix AS (
            SELECT source, bucket, count(*) AS n_docs
            FROM tiered GROUP BY 1, 2
        ), tot AS (
            SELECT source, sum(n_docs) AS n FROM mix GROUP BY source
        )
        SELECT m.source, m.bucket, m.n_docs,
               CAST(m.n_docs * 1000 // t.n AS BIGINT) AS share_permille
        FROM mix m JOIN tot t USING (source)
        ORDER BY m.source, m.bucket
    """


@register(
    "text_ccnet_bucket_mix",
    oracle=_ccnet_oracle_sql(),
    tags=("text", "llm", "quality", "pipeline"),
    doc="CCNet-style quality bucketing: documents ranked by bigram-LM "
    "surprisal (the registered text_lm_surprisal_score, reused as-is) "
    "and cut into head/middle/tail terciles, reported as the per-"
    "source mix — the composition dashboard CCNet publishes per "
    "snapshot and the knob (keep head+middle, resample tail) that "
    "follows. Ranking uses milli-bits = sum_bits*1e6 div n_bigrams "
    "with doc_id tie-break — an exact-integer TOTAL order, because "
    "ntile over a float average would let last-ulp libm noise move a "
    "boundary doc across engines. The global tercile is one ntile "
    "window over |docs| post-agg rows (range-partitionable at scale "
    "via the ranking helper, as rfm_customer_segments does).",
)
def text_ccnet_bucket_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dynamodb_stream_processor_2_0_spark.plans.registry import REGISTRY

    lm = REGISTRY["text_lm_surprisal_score"].fn(spark, sf_dir).select(
        "doc_id", "sum_bits", "n_bigrams"
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    scored = docs.join(lm, "doc_id").select(
        "doc_id",
        "source",
        F.expr("sum_bits * 1000000 div n_bigrams").alias("milli_bits"),
    )
    # Global tercile WITHOUT a single-partition window: global_rank
    # range-partitions the total order, and for K=3 SPECIFICALLY,
    # ntile(3) of rank r among n is exactly floor((r-1)*3/n)+1 for
    # every n (the identity is NOT general — ntile packs extras into
    # the first buckets, the floor formula spreads them; they coincide
    # for k=3, pinned by tests/test_properties.py::
    # test_tercile_identity_matches_sql_ntile).
    from dynamodb_stream_processor_2_0_spark.operators.ranking import (
        global_rank,
    )

    ranked = global_rank(scored, ["milli_bits", "doc_id"], "gr")
    n_total = ranked.agg(F.count(F.lit(1)).alias("n"))
    tiered = ranked.crossJoin(F.broadcast(n_total)).select(
        "source",
        F.when(F.expr("(gr - 1) * 3 div n") == 0, "head")
        .when(F.expr("(gr - 1) * 3 div n") == 1, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )
    mix = tiered.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    tot = mix.groupBy("source").agg(F.sum("n_docs").alias("n"))
    return (
        mix.join(tot, "source")
        .select(
            "source",
            "bucket",
            "n_docs",
            F.expr("cast(n_docs * 1000 div n AS bigint)").alias(
                "share_permille"
            ),
        )
        .orderBy("source", "bucket")
    )

# --- perceptual-hash media near-dup ----------------------------------------

_PHASH_BYTES = 7  # 56-bit hash stays inside positive BIGINT
_PHASH_MAX_HAMMING = 6  # <= 6 bit flips over 7 byte-bands: pigeonhole-complete


def _phash_oracle_sql() -> str:
    from dynamodb_stream_processor_2_0_spark.plans.queries_multimodal import (
        _md5_byte_sql,
    )

    phash = " + ".join(
        f"CAST({_md5_byte_sql(2 + i)} AS BIGINT) * {1 << (8 * i)}"
        for i in range(_PHASH_BYTES)
    )
    bands = ", ".join(f"({i})" for i in range(_PHASH_BYTES))
    return f"""
        WITH fp AS (
            SELECT doc_id, {phash} AS phash FROM documents
        ), banded AS (
            SELECT doc_id, phash, b.band,
                   (phash // CAST(2 ** (8 * b.band) AS BIGINT)) % 256
                       AS byte_sig
            FROM fp, (VALUES {bands}) b(band)
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.byte_sig = b.byte_sig
         AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.phash, b.phash)) <= {_PHASH_MAX_HAMMING}
        ORDER BY doc_a, doc_b
    """


@register(
    "multimodal_phash_near_dup",
    oracle=_phash_oracle_sql(),
    tags=("multimodal", "dedup", "llm", "mapInPandas"),
    doc="Near-duplicate MEDIA detection by perceptual hash: the decoded "
    "feature bytes (Arrow-batched mapInPandas decode — the same "
    "injectable-codec path as multimodal_image_decode; production "
    "swaps in a real pHash/DCT) pack into a 56-bit fingerprint, "
    "candidates block on its 7 bytes (Hamming <= 6 cannot differ in "
    "all 7 — pigeonhole-complete, the Manku crawl-dedup scheme), and "
    "survivors verify with exact XOR popcount. Completes the media "
    "dedup pair with multimodal_dedup_by_digest (exact): digest "
    "catches re-crawled identical files, pHash catches re-encoded / "
    "resized ones. Payloads never shuffle — the pair pipeline runs "
    "on 8-byte fingerprints; the oracle recomputes the identical "
    "fingerprint from the payload bytes in SQL.",
)
def multimodal_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dynamodb_stream_processor_2_0_spark.operators import multimodal as MM

    bin_df = MM.documents_as_binary(load_table(spark, sf_dir, "documents"))
    decoded = MM.decode_image_batch(bin_df)
    phash = None
    for i in range(_PHASH_BYTES):
        term = F.expr(
            f"cast(round(feature[{i}] * 255) AS bigint) * {1 << (8 * i)}L"
        )
        phash = term if phash is None else phash + term
    fp = decoded.select("doc_id", phash.alias("phash"))
    banded = fp.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(*[F.lit(b) for b in range(_PHASH_BYTES)])
        ).alias("band"),
    ).withColumn(
        "byte_sig", F.expr("(phash div shiftleft(1L, 8 * band)) % 256")
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"), "band", "byte_sig",
        F.col("phash").alias("ph_a"),
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), "band", "byte_sig",
        F.col("phash").alias("ph_b"),
    )
    return (
        a.join(b, ["band", "byte_sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.expr("ph_a ^ ph_b")).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= _PHASH_MAX_HAMMING)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )

# --- KMV sketch set intersection (round 6) ---------------------------------

_KMV_INTER_ORACLE = f"""
    WITH hashed AS (
        SELECT DISTINCT event_type AS scope, user_id,
               CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                   1, {_KMV_HASH_HEX}) AS BIGINT) AS h
        FROM events
    ), sk AS (
        SELECT scope, h FROM (
            SELECT scope, h, row_number() OVER (
                PARTITION BY scope ORDER BY h ASC) AS rn
            FROM hashed
        ) WHERE rn <= {_KMV_K}
    ), scopes AS (SELECT DISTINCT scope FROM hashed),
    pairs AS (
        SELECT a.scope AS scope_a, b.scope AS scope_b
        FROM scopes a JOIN scopes b ON a.scope < b.scope
    ), merged AS (
        SELECT p.scope_a, p.scope_b, s.h,
               row_number() OVER (PARTITION BY p.scope_a, p.scope_b
                                  ORDER BY s.h ASC) AS rn
        FROM pairs p
        JOIN (SELECT DISTINCT scope, h FROM sk) s
          ON s.scope IN (p.scope_a, p.scope_b)
        GROUP BY p.scope_a, p.scope_b, s.h
    ), usk AS (
        SELECT scope_a, scope_b, h, rn,
               count(*) OVER (PARTITION BY scope_a, scope_b) AS m
        FROM merged WHERE rn <= {_KMV_K}
    ), union_est AS (
        SELECT scope_a, scope_b,
               CASE WHEN max(m) < {_KMV_K} THEN max(m)
                    ELSE ({_KMV_K - 1} * {_KMV_SPACE})
                         // max(CASE WHEN rn = {_KMV_K} THEN h END)
               END AS u_est,
               CAST(sum(CASE WHEN EXISTS (
                        SELECT 1 FROM sk x
                        WHERE x.scope = usk.scope_a AND x.h = usk.h)
                    AND EXISTS (
                        SELECT 1 FROM sk y
                        WHERE y.scope = usk.scope_b AND y.h = usk.h)
                   THEN 1 ELSE 0 END) AS BIGINT) AS rho,
               max(m) AS k_used
        FROM usk GROUP BY scope_a, scope_b
    ), exact AS (
        SELECT a.scope AS scope_a, b.scope AS scope_b,
               CAST(count(*) AS BIGINT) AS exact_inter
        FROM hashed a JOIN hashed b
          ON a.user_id = b.user_id AND a.scope < b.scope
        GROUP BY 1, 2
    )
    SELECT u.scope_a, u.scope_b,
           COALESCE(e.exact_inter, 0) AS exact_intersection,
           CAST(u.rho * u.u_est // u.k_used AS BIGINT)
               AS est_intersection
    FROM union_est u LEFT JOIN exact e
      ON e.scope_a = u.scope_a AND e.scope_b = u.scope_b
    ORDER BY u.scope_a, u.scope_b
"""


@register(
    "sketch_kmv_intersection",
    oracle=_KMV_INTER_ORACLE,
    tags=("sketch", "agg", "A1", "scale"),
    doc="KMV sketch SET INTERSECTION (Beyer et al.): for every "
    "event-type pair, |A intersect B| is estimated from the two "
    "bottom-64 sketches alone — merge to the union's bottom-k, count "
    "the survivors present in BOTH input sketches (rho), estimate = "
    "rho * |union|_est div k — never re-scanning raw data. With "
    "sketch_kmv_distinct's union arm this completes the sketch set "
    "algebra (union + intersection => Jaccard, difference), the "
    "pre-aggregated answer to audience-overlap questions over 100 TB "
    "where the exact pairwise join is the thing you're avoiding. The "
    "exact arm rides along for realized-error inspection; all "
    "arithmetic is the shared md5-derived 52-bit integer grid with "
    "truncating division on non-negatives.",
)
def sketch_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketches are k rows per scope; the pair stage manipulates only
    |scopes|^2/2 * 2k sketch rows — sketch algebra never touches the
    event table after the one distinct+bottom-k pass."""
    events = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, _KMV_HASH_HEX),
        16,
        10,
    ).cast("long")
    hashed = (
        events.select(
            F.col("event_type").alias("scope"), "user_id", h.alias("h")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    wrank = Window.partitionBy("scope").orderBy(F.col("h").asc())
    sk = (
        hashed.select("scope", "h")
        .withColumn("rn", F.row_number().over(wrank))
        .filter(F.col("rn") <= _KMV_K)
        .select("scope", "h")
    )
    scopes = hashed.select("scope").distinct()
    pairs = (
        scopes.alias("a")
        .join(
            scopes.alias("b"),
            F.col("a.scope") < F.col("b.scope"),
        )
        .select(
            F.col("a.scope").alias("scope_a"), F.col("b.scope").alias("scope_b")
        )
    )
    ska = sk.select(
        F.col("scope").alias("scope_a"), F.col("h").alias("h")
    ).withColumn("in_a", F.lit(1))
    skb = sk.select(
        F.col("scope").alias("scope_b"), F.col("h").alias("h")
    ).withColumn("in_b", F.lit(1))
    merged = (
        pairs.join(ska, "scope_a")
        .select("scope_a", "scope_b", "h", "in_a", F.lit(None).cast("int").alias("in_b"))
        .unionByName(
            pairs.join(skb, "scope_b").select(
                "scope_a", "scope_b", "h",
                F.lit(None).cast("int").alias("in_a"), "in_b",
            )
        )
        .groupBy("scope_a", "scope_b", "h")
        .agg(
            F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")
        )
    )
    wm = Window.partitionBy("scope_a", "scope_b").orderBy(F.col("h").asc())
    wall = Window.partitionBy("scope_a", "scope_b")
    usk = (
        merged.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") <= _KMV_K)
        .withColumn("m", F.count(F.lit(1)).over(wall))
    )
    union_est = usk.groupBy("scope_a", "scope_b").agg(
        F.expr(
            f"CASE WHEN max(m) < {_KMV_K} THEN max(m)"
            f" ELSE ({_KMV_K - 1} * {_KMV_SPACE}L)"
            f" div max(CASE WHEN rn = {_KMV_K} THEN h END) END"
        ).alias("u_est"),
        F.sum(
            (
                F.col("in_a").isNotNull() & F.col("in_b").isNotNull()
            ).cast("long")
        ).alias("rho"),
        F.max("m").alias("k_used"),
    )
    exact = (
        hashed.alias("a")
        .join(
            hashed.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.scope") < F.col("b.scope")),
        )
        .groupBy(
            F.col("a.scope").alias("scope_a"), F.col("b.scope").alias("scope_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("exact_inter"))
    )
    return (
        union_est.join(exact, ["scope_a", "scope_b"], "left")
        .select(
            "scope_a",
            "scope_b",
            F.coalesce("exact_inter", F.lit(0))
            .cast("long")
            .alias("exact_intersection"),
            F.expr("cast(rho * u_est div k_used as bigint)").alias(
                "est_intersection"
            ),
        )
        .orderBy("scope_a", "scope_b")
    )

_KMV_DIFF_ORACLE = f"""
    WITH hashed AS (
        SELECT DISTINCT strftime(CAST(o_orderdate AS DATE), '%Y-%m')
                   AS scope,
               year(CAST(o_orderdate AS DATE)) * 12
                   + month(CAST(o_orderdate AS DATE)) AS scope_idx,
               o_custkey AS user_id,
               CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
                                   1, {_KMV_HASH_HEX}) AS BIGINT) AS h
        FROM orders
    ), sk AS (
        SELECT scope, h FROM (
            SELECT scope, h, row_number() OVER (
                PARTITION BY scope ORDER BY h ASC) AS rn
            FROM hashed
        ) WHERE rn <= {_KMV_K}
    ), scopes AS (SELECT DISTINCT scope, scope_idx FROM hashed),
    pairs AS (
        SELECT a.scope AS scope_a, b.scope AS scope_b
        FROM scopes a JOIN scopes b
          ON abs(a.scope_idx - b.scope_idx) = 1
    ), merged AS (
        SELECT p.scope_a, p.scope_b, s.h,
               row_number() OVER (PARTITION BY p.scope_a, p.scope_b
                                  ORDER BY s.h ASC) AS rn
        FROM pairs p
        JOIN (SELECT DISTINCT scope, h FROM sk) s
          ON s.scope IN (p.scope_a, p.scope_b)
        GROUP BY p.scope_a, p.scope_b, s.h
    ), usk AS (
        SELECT scope_a, scope_b, h, rn,
               count(*) OVER (PARTITION BY scope_a, scope_b) AS m
        FROM merged WHERE rn <= {_KMV_K}
    ), est AS (
        SELECT scope_a, scope_b,
               CASE WHEN max(m) < {_KMV_K} THEN max(m)
                    ELSE ({_KMV_K - 1} * {_KMV_SPACE})
                         // max(CASE WHEN rn = {_KMV_K} THEN h END)
               END AS u_est,
               CAST(sum(CASE WHEN EXISTS (
                        SELECT 1 FROM sk x
                        WHERE x.scope = usk.scope_a AND x.h = usk.h)
                    AND NOT EXISTS (
                        SELECT 1 FROM sk y
                        WHERE y.scope = usk.scope_b AND y.h = usk.h)
                   THEN 1 ELSE 0 END) AS BIGINT) AS rho_diff,
               max(m) AS k_used
        FROM usk GROUP BY scope_a, scope_b
    ), counts AS (
        SELECT scope, CAST(count(*) AS BIGINT) AS n FROM hashed GROUP BY 1
    ), inter AS (
        SELECT a.scope AS scope_a, b.scope AS scope_b,
               CAST(count(*) AS BIGINT) AS ninter
        FROM hashed a JOIN hashed b
          ON a.user_id = b.user_id AND a.scope <> b.scope
        GROUP BY 1, 2
    )
    SELECT e.scope_a, e.scope_b,
           ca.n - COALESCE(i.ninter, 0) AS exact_difference,
           CAST(e.rho_diff * e.u_est // e.k_used AS BIGINT)
               AS est_difference
    FROM est e
    JOIN counts ca ON ca.scope = e.scope_a
    LEFT JOIN inter i
      ON i.scope_a = e.scope_a AND i.scope_b = e.scope_b
    ORDER BY e.scope_a, e.scope_b
"""


@register(
    "sketch_kmv_difference",
    oracle=_KMV_DIFF_ORACLE,
    tags=("sketch", "agg", "scale"),
    doc="KMV sketch SET DIFFERENCE — the third leg completing the "
    "sketch set algebra (union in sketch_kmv_distinct, intersection "
    "in sketch_kmv_intersection): |A minus B| estimated from the two "
    "bottom-64 sketches alone as rho_diff * |union|_est div k, where "
    "rho_diff counts union-bottom-k survivors present in A's sketch "
    "but absent from B's. Scopes are the MONTHLY active-customer "
    "sets of the orders table and pairs are consecutive months in "
    "both directions, so the report reads directly as churned "
    "(m -> m+1) and newly-acquired (m+1 -> m) audience per month — "
    "the month-over-month retention question answered from 2 KB of "
    "pre-aggregated sketch per month instead of re-scanning raw "
    "orders (event-type scopes were rejected: the fixture's users "
    "touch every type, making every difference trivially zero). "
    "Exact arm = |A| - |A intersect B| from the same per-scope "
    "rollups. Same 52-bit md5 grid and truncating "
    "division as the siblings; sketch algebra touches only "
    "|scopes|^2 x 2k sketch rows.",
)
def sketch_kmv_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(
            F.md5(F.col("o_custkey").cast("string")), 1, _KMV_HASH_HEX
        ),
        16,
        10,
    ).cast("long")
    d = F.col("o_orderdate").cast("date")
    hashed = (
        orders.select(
            F.date_format(d, "yyyy-MM").alias("scope"),
            (F.year(d) * 12 + F.month(d)).alias("scope_idx"),
            F.col("o_custkey").alias("user_id"),
            h.alias("h"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    wrank = Window.partitionBy("scope").orderBy(F.col("h").asc())
    sk = (
        hashed.select("scope", "h")
        .withColumn("rn", F.row_number().over(wrank))
        .filter(F.col("rn") <= _KMV_K)
        .select("scope", "h")
    )
    scopes = hashed.select("scope", "scope_idx").distinct()
    pairs = (
        scopes.alias("a")
        .join(
            scopes.alias("b"),
            F.abs(F.col("a.scope_idx") - F.col("b.scope_idx")) == 1,
        )
        .select(
            F.col("a.scope").alias("scope_a"),
            F.col("b.scope").alias("scope_b"),
        )
    )
    ska = sk.select(
        F.col("scope").alias("scope_a"), "h"
    ).withColumn("in_a", F.lit(1))
    skb = sk.select(
        F.col("scope").alias("scope_b"), "h"
    ).withColumn("in_b", F.lit(1))
    merged = (
        pairs.join(ska, "scope_a")
        .select(
            "scope_a", "scope_b", "h", "in_a",
            F.lit(None).cast("int").alias("in_b"),
        )
        .unionByName(
            pairs.join(skb, "scope_b").select(
                "scope_a", "scope_b", "h",
                F.lit(None).cast("int").alias("in_a"), "in_b",
            )
        )
        .groupBy("scope_a", "scope_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wm = Window.partitionBy("scope_a", "scope_b").orderBy(F.col("h").asc())
    wall = Window.partitionBy("scope_a", "scope_b")
    usk = (
        merged.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") <= _KMV_K)
        .withColumn("m", F.count(F.lit(1)).over(wall))
    )
    est = usk.groupBy("scope_a", "scope_b").agg(
        F.expr(
            f"CASE WHEN max(m) < {_KMV_K} THEN max(m)"
            f" ELSE ({_KMV_K - 1} * {_KMV_SPACE}L)"
            f" div max(CASE WHEN rn = {_KMV_K} THEN h END) END"
        ).alias("u_est"),
        F.sum(
            (
                F.col("in_a").isNotNull() & F.col("in_b").isNull()
            ).cast("long")
        ).alias("rho_diff"),
        F.max("m").alias("k_used"),
    )
    counts = hashed.groupBy(F.col("scope").alias("scope_a")).agg(
        F.count(F.lit(1)).cast("long").alias("n_a")
    )
    inter = (
        hashed.alias("a")
        .join(
            hashed.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.scope") != F.col("b.scope")),
        )
        .groupBy(
            F.col("a.scope").alias("scope_a"),
            F.col("b.scope").alias("scope_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("ninter"))
    )
    return (
        est.join(F.broadcast(counts), "scope_a")
        .join(F.broadcast(inter), ["scope_a", "scope_b"], "left")
        .select(
            "scope_a",
            "scope_b",
            (
                F.col("n_a") - F.coalesce("ninter", F.lit(0).cast("long"))
            ).alias("exact_difference"),
            F.expr("cast(rho_diff * u_est div k_used as bigint)").alias(
                "est_difference"
            ),
        )
        .orderBy("scope_a", "scope_b")
    )

_LITTLE_ORACLE = """
    WITH cyc AS (
        SELECT o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS d0,
               max(CAST(l.l_shipdate AS DATE)) AS d1
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderdate
    ), direct AS (
        SELECT CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(datediff('day', d0, d1) + 1) AS BIGINT)
                   AS open_days_direct,
               CAST(min(d0) AS DATE) AS h0, CAST(max(d1) AS DATE) AS h1
        FROM cyc
    ), deltas AS (
        SELECT d0 AS day, 1 AS delta FROM cyc
        UNION ALL
        SELECT CAST(d1 + INTERVAL 1 DAY AS DATE), -1 FROM cyc
    ), sweep AS (
        SELECT CAST(sum(delta * datediff('day', day,
                   (SELECT CAST(h1 + INTERVAL 1 DAY AS DATE) FROM direct)))
                   AS BIGINT) AS open_days_sweep
        FROM deltas
    )
    SELECT d.n_orders,
           CAST(datediff('day', d.h0, d.h1) + 1 AS BIGINT)
               AS horizon_days,
           d.open_days_direct,
           s.open_days_sweep,
           d.open_days_direct = s.open_days_sweep AS identity_exact,
           d.open_days_direct * 1000 // d.n_orders AS w_cycle_days_milli,
           d.n_orders * 1000 // (datediff('day', d.h0, d.h1) + 1)
               AS lambda_per_day_milli,
           d.open_days_direct * 1000
               // (datediff('day', d.h0, d.h1) + 1) AS l_avg_open_milli
    FROM direct d, sweep s
"""


@register(
    "orders_littles_law_identity",
    oracle=_LITTLE_ORACLE,
    tags=("timeseries", "stats", "scale"),
    doc="Little's law (L = lambda * W) verified as an EXACT integer "
    "identity between two independent distributed computations: the "
    "direct arm sums each order's inclusive open-day span "
    "(orderdate .. last lineitem ship date), the sweep-line arm "
    "integrates the +1/-1 boundary-event backlog curve BY PARTS — "
    "integral of the prefix sum = sum of delta * (horizon_end - "
    "event_day), collapsing the whole time integral into one "
    "aggregate over O(orders) boundary events with NO window at all "
    "— and total open-order-days must agree to the LAST UNIT, "
    "asserted as a boolean in the gate: a cross-implementation "
    "consistency proof of the boundary-event algebra as well as the "
    "queueing identity. The L, lambda, W milli readings are what an "
    "ops dashboard shows (avg WIP = arrival rate x cycle time). "
    "Plan: one orders||lineitem rollup for cycle spans, one "
    "map-side-combinable aggregate over the events, a broadcast "
    "1-row horizon — linear, shuffle-light at any scale.",
)
def orders_littles_law_identity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cyc = (
        orders.join(
            lineitem, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("d0"))
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("d1"))
        .localCheckpoint(eager=False)
    )
    direct = cyc.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.datediff("d1", "d0") + 1).cast("long").alias(
            "open_days_direct"
        ),
        F.min("d0").alias("h0"),
        F.max("d1").alias("h1"),
    )
    deltas = cyc.select(
        F.col("d0").alias("day"), F.lit(1).alias("delta")
    ).unionByName(
        cyc.select(
            F.date_add("d1", 1).alias("day"), F.lit(-1).alias("delta")
        )
    )
    # Integration by parts: sum over days of the prefix-sum backlog
    # equals sum over boundary events of delta * (horizon_end - day) —
    # the whole time integral is ONE map-side-combinable aggregate.
    hend = F.broadcast(
        direct.select(F.date_add("h1", 1).alias("hend"))
    )
    sweep = (
        deltas.crossJoin(hend)
        .agg(
            F.sum(F.col("delta") * F.datediff("hend", "day"))
            .cast("long")
            .alias("open_days_sweep")
        )
    )
    return direct.crossJoin(sweep).select(
        "n_orders",
        (F.datediff("h1", "h0") + 1).cast("long").alias("horizon_days"),
        "open_days_direct",
        "open_days_sweep",
        (F.col("open_days_direct") == F.col("open_days_sweep")).alias(
            "identity_exact"
        ),
        F.expr("open_days_direct * 1000 div n_orders").alias(
            "w_cycle_days_milli"
        ),
        F.expr(
            "n_orders * 1000 div (datediff(h1, h0) + 1)"
        ).alias("lambda_per_day_milli"),
        F.expr(
            "open_days_direct * 1000 div (datediff(h1, h0) + 1)"
        ).alias("l_avg_open_milli"),
    )

# --- SCD2 point-in-time (as-of) enrichment (round 6) -----------------------

_SCD2_ASOF_ORACLE = """
    WITH probed AS (
        SELECT p.event_id,
               CAST(round(p.value * 100) AS BIGINT) AS cents,
               (SELECT e.event_type FROM events e
                WHERE e.user_id = p.user_id
                  AND e.event_type <> 'purchase'
                  AND (e.ts < p.ts OR (e.ts = p.ts
                       AND e.event_id < p.event_id))
                ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS state
        FROM events p WHERE p.event_type = 'purchase'
    )
    SELECT COALESCE(state, '__none__') AS state_at_purchase,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM probed
    GROUP BY 1
    ORDER BY 1
"""


@register(
    "scd2_asof_enrich",
    oracle=_SCD2_ASOF_ORACLE,
    tags=("timeseries", "scd2", "join", "asof", "scale"),
    doc="Point-in-time state enrichment: every purchase is joined to "
    "the user's SCD2 state (scd2_user_state_build's intervals over "
    "the non-purchase events) valid AT purchase time — the "
    "temporal-join read path that makes type-2 history useful "
    "(which state converts), and the batch form of a stream-static "
    "join against a versioned dimension. The Spark plan is the "
    "MERGE form of an as-of join: state changes and probes union "
    "into one stream, one window per user carries the last-known "
    "state forward (last_value ignore-nulls ordered by (ts, "
    "event_id) — a purchase sees strictly-earlier changes plus "
    "same-instant changes with a smaller id), then the rollup by "
    "state — one shuffle on user, NO interval theta-join, no "
    "per-probe subquery. The oracle is the declarative correlated "
    "point-in-time lookup, proving the merge rewrite exact. "
    "Purchases before any state event fall into '__none__'.",
)
def scd2_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merge-sort form is what survives 100x: both sides shuffle
    once on the join key and the window is a single ordered pass,
    independent of how many versions or probes a user has. Changes
    and probes interleave on the shared (ts, event_id) total order,
    so the lag/last semantics match the correlated oracle exactly."""
    events = load_table(spark, sf_dir, "events")
    changes = events.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("u"),
        F.col("ts").alias("t"),
        F.col("event_id").alias("seq"),
        F.col("event_type").alias("state"),
        F.lit(None).cast("long").alias("cents"),
        F.lit(0).alias("tag"),
    )
    probes = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u"),
        F.col("ts").alias("t"),
        F.col("event_id").alias("seq"),
        F.lit(None).cast("string").alias("state"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.lit(1).alias("tag"),
    )
    w = (
        Window.partitionBy("u")
        .orderBy("t", "seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        changes.unionByName(probes)
        .withColumn("state_asof", F.last("state", ignorenulls=True).over(w))
        .filter(F.col("tag") == 1)
    )
    return (
        filled.groupBy(
            F.coalesce("state_asof", F.lit("__none__")).alias(
                "state_at_purchase"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
        .orderBy("state_at_purchase")
    )

# --- open-order backlog curve via sweep-line (round 6) ---------------------

_BACKLOG_ORACLE = """
    WITH iv AS (
        SELECT o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS d_open,
               max(CAST(l.l_shipdate AS DATE)) AS d_close
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ), deltas AS (
        SELECT d_open AS day, 1 AS delta FROM iv
        UNION ALL
        SELECT d_close + 1 AS day, -1 AS delta FROM iv
    ), by_day AS (
        SELECT day, CAST(sum(delta) AS BIGINT) AS delta
        FROM deltas GROUP BY day
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(sum(delta) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS n_open
    FROM by_day
    ORDER BY day
"""


@register(
    "orders_open_backlog_daily",
    oracle=_BACKLOG_ORACLE,
    tags=("timeseries", "analytics", "scale", "A1"),
    doc="Open-order backlog curve: how many orders are open (placed "
    "but not yet fully shipped) on each day the count changes — the "
    "operational WIP series. The SWEEP-LINE form: each order's "
    "[orderdate, last shipdate] interval becomes +1/-1 boundary "
    "deltas, one rollup nets them per day, and the running total is "
    "the DISTRIBUTED prefix-sum primitive (ranking.global_running_"
    "sum: range exchange + per-partition scan + broadcast offsets — "
    "never a single-task global window). That turns interval "
    "stabbing from |days| x |orders| containment work into "
    "O(|orders|) boundary events; the oracle computes the same "
    "prefix sum with a plain single-threaded running-sum window, "
    "proving the distributed scan exact.",
)
def orders_open_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dynamodb_stream_processor_2_0_spark.operators import ranking

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    iv = (
        orders.join(
            lineitem, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("d_open"))
        .agg(F.max(F.to_date("l_shipdate")).alias("d_close"))
    )
    deltas = (
        iv.select(F.col("d_open").alias("day"), F.lit(1).alias("delta"))
        .unionByName(
            iv.select(
                F.date_add("d_close", 1).alias("day"),
                F.lit(-1).alias("delta"),
            )
        )
        .groupBy("day")
        .agg(F.sum("delta").cast("long").alias("delta"))
    )
    return (
        ranking.global_running_sum(
            deltas, order_cols=["day"], value_col="delta", out_col="n_open"
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n_open").cast("long").alias("n_open"),
        )
        .orderBy("day")
    )

# --- mergeable histogram-quantile sketch (round 6) -------------------------

# Bucket rule: binary magnitude (bitlen) sub-split by the 2 bits below
# the leading bit => relative bucket width 1/4 (max relative quantile
# error ~25%, reported exactly in the gate). value 0 gets bucket 0.
_HISTQ_ORACLE = """
    WITH vals AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ), bucketed AS (
        SELECT event_type,
               CASE WHEN cents <= 0 THEN 0
                    ELSE length(bin(cents)) * 4
                         + (CASE WHEN length(bin(cents)) >= 3
                                 THEN (cents >> (length(bin(cents)) - 3)) & 3
                                 ELSE cents & 3 END)
               END AS bucket,
               cents
        FROM vals
    ), hist AS (
        SELECT event_type, bucket,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(min(cents) AS BIGINT) AS lo
        FROM bucketed GROUP BY 1, 2
    ), cum AS (
        SELECT event_type, bucket, cnt, lo,
               sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
               sum(cnt) OVER (PARTITION BY event_type) AS n
        FROM hist
    ), est AS (
        SELECT event_type, max(n) AS n,
               min(CASE WHEN cum * 2 >= n THEN lo END) AS p50_est,
               min(CASE WHEN cum * 100 >= 99 * n THEN lo END) AS p99_est
        FROM cum GROUP BY event_type
    ), exact AS (
        SELECT event_type,
               CAST(min(CASE WHEN rn * 2 >= n THEN cents END) AS BIGINT)
                   AS p50_exact,
               CAST(min(CASE WHEN rn * 100 >= 99 * n THEN cents END)
                   AS BIGINT) AS p99_exact
        FROM (
            SELECT event_type, cents,
                   row_number() OVER (PARTITION BY event_type
                       ORDER BY cents ASC) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM vals
        ) GROUP BY event_type
    )
    SELECT e.event_type, CAST(e.n AS BIGINT) AS n_values,
           CAST(e.p50_est AS BIGINT) AS p50_est,
           x.p50_exact,
           CAST(e.p99_est AS BIGINT) AS p99_est,
           x.p99_exact,
           (CASE WHEN e.p50_est >= x.p50_exact THEN 1 ELSE -1 END)
               * (abs(e.p50_est - x.p50_exact) * 1000 // x.p50_exact)
               AS p50_err_permille
    FROM est e JOIN exact x USING (event_type)
    ORDER BY e.event_type
"""


@register(
    "sketch_histogram_quantiles",
    oracle=_HISTQ_ORACLE,
    tags=("sketch", "agg", "A1", "scale"),
    doc="Mergeable quantile sketch: a log-scale histogram whose bucket "
    "rule is pure bit arithmetic — bitlen(cents) sub-split by the two "
    "bits under the leading bit, i.e. ~1/4 relative bucket width — "
    "so per-partition histograms ADD (counts sum, lower bounds min), "
    "the merge law every 100 TB percentile dashboard needs: "
    "re-aggregate tiny (scope, bucket, cnt) rows across any rollup "
    "instead of re-scanning values (the quantile sibling of the "
    "HLL/KMV/count-min family). p50/p99 are read off the cumulative "
    "histogram as the first bucket's lower bound past the rank "
    "threshold (rank logic cross-multiplied, no division), and the "
    "exact arm plus a sign-extracted permille error sit inside the "
    "gate so the ~25% worst-case bucket error is measured, not "
    "assumed. Plan: one bucket rollup (map-side combinable), windows "
    "over |scopes x ~60 buckets| rows; the exact arm is the eval "
    "harness, not the scale path.",
)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    vals = events.filter(F.col("value").isNotNull()).select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    bucket = F.expr(
        "CASE WHEN cents <= 0 THEN 0"
        " ELSE length(bin(cents)) * 4"
        " + (CASE WHEN length(bin(cents)) >= 3"
        "    THEN (cents >> (length(bin(cents)) - 3)) & 3"
        "    ELSE cents & 3 END) END"
    )
    hist = (
        vals.withColumn("bucket", bucket)
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.min("cents").cast("long").alias("lo"),
        )
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = hist.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "n", F.sum("cnt").over(wall)
    )
    est = cum.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("cum") * 2 >= F.col("n"), F.col("lo"))).alias(
            "p50_est"
        ),
        F.min(
            F.when(F.col("cum") * 100 >= F.col("n") * 99, F.col("lo"))
        ).alias("p99_est"),
    )
    wrank = Window.partitionBy("event_type").orderBy(F.col("cents").asc())
    exact = (
        vals.withColumn("rn", F.row_number().over(wrank))
        .withColumn("n", F.count(F.lit(1)).over(wall))
        .groupBy("event_type")
        .agg(
            F.min(F.when(F.col("rn") * 2 >= F.col("n"), F.col("cents")))
            .cast("long")
            .alias("p50_exact"),
            F.min(
                F.when(F.col("rn") * 100 >= F.col("n") * 99, F.col("cents"))
            )
            .cast("long")
            .alias("p99_exact"),
        )
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n_values"),
            F.col("p50_est").cast("long").alias("p50_est"),
            "p50_exact",
            F.col("p99_est").cast("long").alias("p99_est"),
            "p99_exact",
            F.expr(
                "CASE WHEN p50_exact = 0 THEN NULL ELSE"
                " (CASE WHEN p50_est >= p50_exact THEN 1 ELSE -1 END)"
                " * (abs(p50_est - p50_exact) * 1000 div p50_exact) END"
            )
            .cast("long")
            .alias("p50_err_permille"),
        )
        .orderBy("event_type")
    )

# --- FK cascade delete-impact analysis (round 6) ---------------------------

_CASCADE_ORACLE = """
    WITH doomed_nations AS (
        SELECT n_nationkey FROM nation WHERE n_name LIKE 'A%'
    ), doomed_cust AS (
        SELECT c_custkey FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM doomed_nations)
    ), doomed_orders AS (
        SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM doomed_cust)
    )
    SELECT 'nation' AS entity,
           CAST((SELECT count(*) FROM doomed_nations) AS BIGINT)
               AS n_cascaded,
           CAST((SELECT count(*) FROM nation) AS BIGINT) AS n_total
    UNION ALL
    SELECT 'customer',
           (SELECT count(*) FROM doomed_cust),
           (SELECT count(*) FROM customer)
    UNION ALL
    SELECT 'orders',
           (SELECT count(*) FROM doomed_orders),
           (SELECT count(*) FROM orders)
    UNION ALL
    SELECT 'lineitem',
           (SELECT count(*) FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM doomed_orders)),
           (SELECT count(*) FROM lineitem)
    ORDER BY entity
"""


@register(
    "fk_cascade_impact_analysis",
    oracle=_CASCADE_ORACLE,
    tags=("data-ops", "integrity", "join", "E2"),
    doc="Cascade delete-impact analysis: BEFORE deleting a set of root "
    "rows (nations named A*), walk the FK graph nation -> customer -> "
    "orders -> lineitem and report how many rows each level would "
    "cascade-delete, against its table cardinality — the blast-radius "
    "preflight for GDPR erasure / tenant offboarding, and the "
    "write-side twin of fk_integrity_audit (which checks the same "
    "edges for orphans). Plan: each hop is a semi-join with the "
    "doomed key set; key sets broadcast while small (nation, "
    "customer) and shuffle-join when they outgrow the broadcast "
    "threshold (orders at 100 TB) — Catalyst's choice, and counting "
    "needs only the keys, so column pruning keeps every scan "
    "key-only.",
)
def fk_cascade_impact_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    doomed_n = nation.filter(F.col("n_name").like("A%")).select("n_nationkey")
    doomed_c = customer.join(
        doomed_n, customer.c_nationkey == doomed_n.n_nationkey, "left_semi"
    ).select("c_custkey")
    doomed_o = orders.join(
        doomed_c, orders.o_custkey == doomed_c.c_custkey, "left_semi"
    ).select("o_orderkey")
    doomed_l = lineitem.join(
        doomed_o, lineitem.l_orderkey == doomed_o.o_orderkey, "left_semi"
    )

    def row(entity: str, cascaded, total):
        return cascaded.agg(
            F.lit(entity).alias("entity"),
            F.count(F.lit(1)).cast("long").alias("n_cascaded"),
        ).crossJoin(
            total.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
        )

    return (
        row("nation", doomed_n, nation)
        .unionByName(row("customer", doomed_c, customer))
        .unionByName(row("orders", doomed_o, orders))
        .unionByName(row("lineitem", doomed_l, lineitem))
        .orderBy("entity")
    )

# --- ABC/XYZ inventory classification (round 6) ----------------------------

# ABC: cumulative revenue share cuts at 80% / 95% (cross-multiplied).
# XYZ: monthly-demand variability, VMR cuts at 0.5 / 1.0 on the exact
# integer grid (nm*sxx - q^2 vs thresh * q*(nm-1), cross-multiplied).
_ABC_ORACLE = """
    WITH monthly AS (
        SELECT l_partkey, date_trunc('month', CAST(l_shipdate AS DATE))
                   AS mon,
               CAST(sum(l_quantity) AS BIGINT) AS qty,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                   AS BIGINT) AS cents
        FROM lineitem GROUP BY 1, 2
    ), n_months AS (
        SELECT CAST(count(DISTINCT mon) AS BIGINT) AS nm FROM monthly
    ), per_part AS (
        SELECT l_partkey,
               CAST(sum(cents) AS BIGINT) AS rev,
               CAST(sum(qty) AS BIGINT) AS q,
               CAST(sum(qty * qty) AS BIGINT) AS sxx
        FROM monthly GROUP BY l_partkey
    ), tot AS (
        SELECT CAST(sum(rev) AS BIGINT) AS total_rev FROM per_part
    ), cum AS (
        SELECT p.l_partkey, p.rev, p.q, p.sxx, t.total_rev, n.nm,
               sum(p.rev) OVER (ORDER BY p.rev DESC, p.l_partkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_rev
        FROM per_part p CROSS JOIN tot t CROSS JOIN n_months n
    ), classed AS (
        SELECT l_partkey,
               CASE WHEN cum_rev * 100 <= 80 * total_rev THEN 'A'
                    WHEN cum_rev * 100 <= 95 * total_rev THEN 'B'
                    ELSE 'C' END AS abc,
               CASE WHEN 2 * (nm * sxx - q * q) <= q * (nm - 1) THEN 'X'
                    WHEN (nm * sxx - q * q) <= q * (nm - 1) THEN 'Y'
                    ELSE 'Z' END AS xyz,
               rev
        FROM cum
    )
    SELECT abc, xyz,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(rev) AS BIGINT) AS revenue_cents
    FROM classed
    GROUP BY abc, xyz
    ORDER BY abc, xyz
"""


@register(
    "lineitem_abc_xyz_classification",
    oracle=_ABC_ORACLE,
    tags=("analytics", "A1", "scale"),
    doc="ABC/XYZ inventory classification — the two-axis segmentation "
    "ops teams run on every SKU: ABC from descending cumulative "
    "revenue share (A <= 80%, B <= 95%, cross-multiplied so no "
    "percentage division), XYZ from monthly-demand variability "
    "(variance-to-mean ratio on the exact integer grid, cuts at 0.5 "
    "and 1.0 — zero-demand months included by algebra, nm*sxx - q^2 "
    "over the full month count, no per-month zero rows needed). The "
    "cumulative share rides the DISTRIBUTED prefix-sum primitive "
    "(range exchange + per-partition scan + broadcast offsets — "
    "never a single-task window), the same scan supplier_pareto_"
    "analysis uses; output is the 9-cell class matrix with part "
    "counts and revenue. Fixture note: the synthetic corpus's "
    "uniform(1..50) order quantities put every part at VMR 4-36, so "
    "the XYZ axis is honestly all-Z at the INDUSTRY-STANDARD 0.5/1.0 "
    "cuts (kept rather than gamed to fit the fixture); the ABC axis "
    "discriminates (A/B/C = 1468/375/157 at sf0.01) and the oracle "
    "proves the full classification arithmetic either way.",
)
def lineitem_abc_xyz_classification(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from dynamodb_stream_processor_2_0_spark.operators import ranking

    lineitem = load_table(spark, sf_dir, "lineitem")
    monthly = (
        lineitem.groupBy(
            "l_partkey",
            F.date_trunc("month", F.to_date("l_shipdate")).alias("mon"),
        )
        .agg(
            F.sum("l_quantity").cast("long").alias("qty"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        # Consumed by BOTH n_months and per_part: without a pin the
        # full lineitem scan + monthly rollup ran twice per action.
        # Lazy checkpoint — computed once, no build-time jobs.
        .localCheckpoint(eager=False)
    )
    n_months = monthly.agg(
        F.countDistinct("mon").cast("long").alias("nm")
    )
    per_part = monthly.groupBy("l_partkey").agg(
        F.sum("cents").cast("long").alias("rev"),
        F.sum("qty").cast("long").alias("q"),
        F.sum(F.col("qty") * F.col("qty")).cast("long").alias("sxx"),
    )
    tot = per_part.agg(F.sum("rev").cast("long").alias("total_rev"))
    cum = ranking.global_running_sum(
        per_part.withColumn("neg_rev", -F.col("rev")),
        order_cols=["neg_rev", "l_partkey"],
        value_col="rev",
        out_col="cum_rev",
    )
    classed = (
        cum.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n_months))
        .select(
            F.when(
                F.col("cum_rev") * 100 <= 80 * F.col("total_rev"), "A"
            )
            .when(F.col("cum_rev") * 100 <= 95 * F.col("total_rev"), "B")
            .otherwise("C")
            .alias("abc"),
            F.when(
                2 * (F.col("nm") * F.col("sxx") - F.col("q") * F.col("q"))
                <= F.col("q") * (F.col("nm") - 1),
                "X",
            )
            .when(
                (F.col("nm") * F.col("sxx") - F.col("q") * F.col("q"))
                <= F.col("q") * (F.col("nm") - 1),
                "Y",
            )
            .otherwise("Z")
            .alias("xyz"),
            "rev",
        )
    )
    return (
        classed.groupBy("abc", "xyz")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("rev").cast("long").alias("revenue_cents"),
        )
        .orderBy("abc", "xyz")
    )

# --- count-min join-size estimation ----------------------------------------

_CMJ_W = 1024  # sketch width (buckets per depth row)
_CMJ_D = 3  # depth (independent hash rows; estimate = min over rows)

_CMJ_ORACLE = f"""
    WITH ko AS (
        SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS c
        FROM orders GROUP BY 1
    ), kl AS (
        SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS c
        FROM lineitem GROUP BY 1
    ), exact AS (
        SELECT CAST(sum(ko.c * kl.c) AS BIGINT) AS exact_size
        FROM ko JOIN kl ON ko.k = kl.k
    ), depths AS (
        SELECT unnest([0, 1, 2]) AS d
    ), cmo AS (
        SELECT d.d,
               CAST('0x' || substr(md5(CAST(d.d AS VARCHAR) || '|' || CAST(ko.k AS VARCHAR)), 1, 8) AS BIGINT)
                   % {_CMJ_W} AS b,
               CAST(sum(ko.c) AS BIGINT) AS c
        FROM ko CROSS JOIN depths d GROUP BY 1, 2
    ), cml AS (
        SELECT d.d,
               CAST('0x' || substr(md5(CAST(d.d AS VARCHAR) || '|' || CAST(kl.k AS VARCHAR)), 1, 8) AS BIGINT)
                   % {_CMJ_W} AS b,
               CAST(sum(kl.c) AS BIGINT) AS c
        FROM kl CROSS JOIN depths d GROUP BY 1, 2
    ), per_depth AS (
        SELECT o.d, CAST(sum(o.c * l.c) AS BIGINT) AS est
        FROM cmo o JOIN cml l ON l.d = o.d AND l.b = o.b
        GROUP BY o.d
    )
    SELECT (SELECT exact_size FROM exact) AS exact_size,
           CAST(min(est) AS BIGINT) AS cm_estimate,
           CAST(min(est) * 1000 // (SELECT exact_size FROM exact) AS BIGINT)
               AS ratio_permille,
           min(est) >= (SELECT exact_size FROM exact) AS never_underestimates
    FROM per_depth
"""


@register(
    "sketch_cm_join_size_estimate",
    oracle=_CMJ_ORACLE,
    tags=("sketch", "scale", "stats"),
    doc="Join-size estimation by count-min inner product (the AMS-"
    "lineage estimator query optimizers use to cost a join BEFORE "
    "running it): |orders JOIN lineitem ON orderkey| = sum_k "
    "cO(k)*cL(k), estimated as min over 3 independent hash rows of "
    "the bucketwise product sum of two 1024-bucket count sketches — "
    "each table is summarized INDEPENDENTLY (the sketches are "
    "mergeable, so 100 TB fact tables reduce to 3x1024 counters via "
    "map-side partial aggs and never meet until the tiny sketch "
    "join), and CM inner product never underestimates, which the "
    "gate asserts alongside the realized permille ratio against the "
    "exact size computed from the same per-key rollups (never the "
    "materialized join). Completes the sketch family's query-"
    "planning arm next to count-min point counts, KMV set algebra, "
    "HLL distincts, and the histogram quantile sketch.",
)
def sketch_cm_join_size_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hash = house md5-to-BIGINT rule, salted by depth; every count "
    "is exact BIGINT so the estimator is bit-identical cross-engine."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    ko = orders.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    kl = lineitem.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    exact = F.broadcast(
        ko.join(kl.withColumnRenamed("c", "cl"), "k").agg(
            F.sum(F.col("c") * F.col("cl")).cast("long").alias("exact_size")
        )
    )

    def _sketch(df: DataFrame) -> DataFrame:
        return (
            df.select(
                "k",
                "c",
                F.explode(
                    F.sequence(F.lit(0), F.lit(_CMJ_D - 1))
                ).alias("d"),
            )
            .select(
                "d",
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat_ws(
                                    "|",
                                    F.col("d").cast("string"),
                                    F.col("k").cast("string"),
                                )
                            ),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % _CMJ_W
                ).alias("b"),
                "c",
            )
            .groupBy("d", "b")
            .agg(F.sum("c").cast("long").alias("c"))
        )

    cmo = _sketch(ko)
    cml = _sketch(kl).withColumnRenamed("c", "cl")
    per_depth = (
        cmo.join(cml, ["d", "b"])
        .groupBy("d")
        .agg(F.sum(F.col("c") * F.col("cl")).cast("long").alias("est"))
    )
    return per_depth.crossJoin(exact).agg(
        F.max("exact_size").alias("exact_size"),
        F.min("est").cast("long").alias("cm_estimate"),
        F.expr("cast(min(est) * 1000 div max(exact_size) as bigint)").alias(
            "ratio_permille"
        ),
        (F.min("est") >= F.max("exact_size")).alias("never_underestimates"),
    )

# --- compaction bin-packing planner ----------------------------------------

_COMPACT_TARGET = 4096  # records per output file

_COMPACTION_ORACLE = f"""
    WITH files AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS records
        FROM orders GROUP BY 1
    ), planned AS (
        SELECT day, records,
               (CAST(sum(records) OVER (ORDER BY day
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) - records)
                   // {_COMPACT_TARGET} AS bin
        FROM files
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n_input_files,
           CAST(sum(records) AS BIGINT) AS records,
           CAST(min(day) AS VARCHAR) AS first_day,
           CAST(max(day) AS VARCHAR) AS last_day,
           CAST(sum(records) AS BIGINT) * 1000 // {_COMPACT_TARGET}
               AS fill_permille
    FROM planned GROUP BY bin ORDER BY bin
"""


@register(
    "storage_compaction_bin_packing",
    oracle=_COMPACTION_ORACLE,
    tags=("scale", "layout"),
    doc="Small-file compaction planner (the Iceberg/Delta OPTIMIZE "
    "preflight): treat each day's rows as one input file and assign "
    "files to output bins of ~4096 records by EXCLUSIVE prefix sum "
    "div target — contiguous-in-sort-order packing that preserves "
    "day clustering (so min/max zone maps stay tight after "
    "compaction, unlike size-sorted first-fit which shreds "
    "locality). The plan report shows per-bin file counts, record "
    "totals, day span, and fill ratio; the one overfull/underfull "
    "bin at each boundary is the known cost of the streaming-safe "
    "one-pass assignment (first-fit-decreasing would need a global "
    "sort by size AND loses clustering). Plan: one rollup + the "
    "prefix sum + one bin rollup. The in-query prefix sum runs in a "
    "per-'table' window here (one partition per table being "
    "compacted is the real deployment grain); for a single 100 TB "
    "table the distributed global_running_sum primitive swaps in "
    "with the same semantics (the backlog/shard-manifest ops "
    "already run that shape).",
)
def storage_compaction_bin_packing(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from dynamodb_stream_processor_2_0_spark.operators.ranking import (
        global_running_sum,
    )

    orders = load_table(spark, sf_dir, "orders")
    files = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("records"))
    planned = global_running_sum(files, ["day"], "records", "cum").select(
        "day",
        "records",
        F.expr(f"(cum - records) div {_COMPACT_TARGET}").alias("bin"),
    )
    return (
        planned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_input_files"),
            F.sum("records").cast("long").alias("records"),
            F.min("day").cast("string").alias("first_day"),
            F.max("day").cast("string").alias("last_day"),
            F.expr(f"sum(records) * 1000 div {_COMPACT_TARGET}").alias(
                "fill_permille"
            ),
        )
        .orderBy("bin")
    )

# --- Allen interval algebra census -----------------------------------------

# Canonical orientation: the pair's lexicographically-smaller interval
# (s, e, user_id) is side 1, so each unordered pair classifies into ONE
# of Allen's relations with inverses folded (contains->during,
# started-by->starts, ...). The CASE is total and deterministic even
# for degenerate point intervals (single-event days, s = e).
_ALLEN_CASE = """
    CASE WHEN s1 = s2 AND e1 = e2 THEN 'equals'
         WHEN s1 = s2 THEN 'starts'
         WHEN e1 = e2 THEN 'finishes'
         WHEN e1 = s2 THEN 'meets'
         WHEN e1 > e2 THEN 'during'
         ELSE 'overlaps' END
"""

_ALLEN_ORACLE = f"""
    WITH iv AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               min(hour(ts) * 3600 + minute(ts) * 60 + second(ts)) AS s,
               max(hour(ts) * 3600 + minute(ts) * 60 + second(ts)) AS e
        FROM events
        GROUP BY 1, 2
    ), pairs AS (
        SELECT a.day,
               CASE WHEN (a.s, a.e, a.user_id) <= (b.s, b.e, b.user_id)
                    THEN a.s ELSE b.s END AS s1,
               CASE WHEN (a.s, a.e, a.user_id) <= (b.s, b.e, b.user_id)
                    THEN a.e ELSE b.e END AS e1,
               CASE WHEN (a.s, a.e, a.user_id) <= (b.s, b.e, b.user_id)
                    THEN b.s ELSE a.s END AS s2,
               CASE WHEN (a.s, a.e, a.user_id) <= (b.s, b.e, b.user_id)
                    THEN b.e ELSE a.e END AS e2
        FROM iv a JOIN iv b
          ON a.day = b.day AND a.user_id < b.user_id
         AND a.s <= b.e AND b.s <= a.e
    ), rc AS (
        SELECT day, {_ALLEN_CASE} AS relation,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM pairs GROUP BY 1, 2
    ), tot AS (
        SELECT day, CAST(count(*) AS BIGINT) AS n FROM iv GROUP BY 1
    ), ovl AS (
        SELECT day, CAST(sum(n_pairs) AS BIGINT) AS o FROM rc GROUP BY 1
    )
    SELECT CAST(day AS VARCHAR) AS day, relation, n_pairs FROM rc
    UNION ALL
    SELECT CAST(t.day AS VARCHAR), 'precedes',
           n * (n - 1) // 2 - COALESCE(o, 0)
    FROM tot t LEFT JOIN ovl o ON o.day = t.day
    WHERE n * (n - 1) // 2 - COALESCE(o, 0) > 0
    ORDER BY day, relation
"""


@register(
    "interval_allen_algebra_census",
    oracle=_ALLEN_ORACLE,
    tags=("join", "timeseries", "scale"),
    doc="Allen interval-algebra census over the per-(user, day) "
    "activity intervals: every unordered pair of same-day intervals "
    "classified into Allen's relations with inverses folded to the "
    "canonical orientation (equals / starts / finishes / meets / "
    "during / overlaps), plus 'precedes' for the disjoint remainder — "
    "the temporal-relationship profile a scheduler or concurrency "
    "auditor reads. Scale shape: NO pair is ever materialized — the "
    "output is counts only, so every relation tally reduces to "
    "order-statistics algebra over the per-(user, day) interval set "
    "(group-size combinatorics, endpoint value-matching, a sorted-"
    "endpoint rank sum, and one O(n log n) dominance/inversion count), "
    "changing the complexity class from O(pairs) = O(n^2/day) to "
    "O(n log n / day). The oracle is the declarative theta-join "
    "classification, proving every counting identity exact.",
)
def interval_allen_algebra_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Counts-only Allen census WITHOUT pair enumeration. Per day, over
    intervals (s, e) with n = |intervals|, m_* = group sizes, and
    C2(m) = m*(m-1)/2:

      equals   = sum_(s,e) C2(m_se)
      starts   = sum_s C2(m_s) - equals          (same s, e differs)
      finishes = sum_e C2(m_e) - equals          (same e, s differs)
      meets    = sum_v #{e=v, s<v} * #{s=v, e>v}: the classifier's
                 meets branch is reached exactly for pairs where one
                 NON-POINT interval's end touches the other NON-POINT
                 interval's start (point intervals at v fall into
                 starts/finishes first — the s<v / e>v masks encode
                 that precedence)
      precedes = sum_j #{i : e_i < s_j}  (each disjoint unordered pair
                 counted once, by its later-starting member)
      during   = strict-dominance count #{(i,j) : s_i<s_j AND e_i>e_j}
                 = strict-descent inversions of e in (s asc, e asc)
                 order (equal-s runs sort e ascending, so same-s pairs
                 can never count; equal-e pairs are non-strict)
      overlaps = [C(n,2) - precedes] - all of the above (the CASE's
                 ELSE branch: total intersecting minus named branches)

    The heavy JVM stage is unchanged (events -> per-(user, day)
    min/max aggregate, map-side combinable); the counting kernel runs
    over the REDUCED interval set (one row per user-day, 3 ints) as a
    partition-grouped Arrow kernel (repartition(day) + mapInPandas
    with an in-process groupby — the small-group pattern measured 6x
    faster than grouped-map applyInPandas in queries_udf.py). At
    100 TB the former banded pair join (17M pairs at sf0.1, 1.7B at
    sf1.0, ~n^2/day growth) is the bottleneck this rewrite deletes;
    the kernel is O(n log n) time and O(n) memory per day-group and
    only breaks down if a single day's active users outgrow executor
    memory (~10^8 rows) — the banded-join form survives as the
    pairs-OUTPUT exemplar in interval_overlap_join, which is the
    fallback shape if the pairs themselves are ever the deliverable.
    Replaces the r11 banded form: 7.15 s -> ~1.5 s at sf0.1."""
    import pandas as pd

    events = load_table(spark, sf_dir, "events")
    sec = (
        F.hour("ts") * 3600 + F.minute("ts") * 60 + F.second("ts")
    ).cast("long")
    iv = (
        events.groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.min(sec).alias("s"), F.max(sec).alias("e"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"), "s", "e"
        )
    )

    def census_partition(batches):
        # one call per shuffle partition; a day-group may span Arrow
        # chunks, so concatenate FIRST (the delivery-state-machine trap)
        import numpy as np

        chunks = list(batches)
        if not chunks:
            return
        whole = pd.concat(chunks, ignore_index=True)
        if not len(whole):
            return

        def inversions(a):
            # pairs i<j with a[i] > a[j] (STRICT), merge-count:
            # O(n log^2 n) vectorized, recursion depth log2(n)
            if a.size < 2:
                return a, 0
            left, cl = inversions(a[: a.size // 2])
            right, cr = inversions(a[a.size // 2 :])
            cross = int(
                (
                    left.size
                    - np.searchsorted(left, right, side="right")
                ).sum()
            )
            return (
                np.sort(np.concatenate((left, right)), kind="stable"),
                cl + cr + cross,
            )

        def c2(m):
            return (m * (m - 1)) // 2

        out_day, out_rel, out_n = [], [], []
        for day, g in whole.groupby("day", sort=False):
            s = g["s"].to_numpy(np.int64)
            e = g["e"].to_numpy(np.int64)
            n = s.size
            # seconds-of-day < 86400, so s*86401+e is collision-free
            _, cnt_se = np.unique(s * 86401 + e, return_counts=True)
            equals = int(c2(cnt_se).sum())
            _, cnt_s = np.unique(s, return_counts=True)
            starts = int(c2(cnt_s).sum()) - equals
            _, cnt_e = np.unique(e, return_counts=True)
            finishes = int(c2(cnt_e).sum()) - equals
            span = s < e  # non-point intervals only (see docstring)
            ve, ce = np.unique(e[span], return_counts=True)
            vs, cs = np.unique(s[span], return_counts=True)
            _, ia, ib = np.intersect1d(
                ve, vs, assume_unique=True, return_indices=True
            )
            meets = int((ce[ia] * cs[ib]).sum())
            precedes = int(
                np.searchsorted(np.sort(e), s, side="left").sum()
            )
            intersecting = n * (n - 1) // 2 - precedes
            during = inversions(e[np.lexsort((e, s))])[1]
            overlaps = (
                intersecting
                - equals
                - starts
                - finishes
                - meets
                - during
            )
            for rel, cnt in (
                ("during", during),
                ("equals", equals),
                ("finishes", finishes),
                ("meets", meets),
                ("overlaps", overlaps),
                ("precedes", precedes),
                ("starts", starts),
            ):
                if cnt > 0:
                    out_day.append(day)
                    out_rel.append(rel)
                    out_n.append(cnt)
        yield pd.DataFrame(
            {
                "day": pd.Series(out_day, dtype=object),
                "relation": pd.Series(out_rel, dtype=object),
                "n_pairs": pd.Series(out_n, dtype="int64"),
            }
        )

    return (
        iv.repartition("day")
        .mapInPandas(
            census_partition, "day string, relation string, n_pairs long"
        )
        .orderBy("day", "relation")
    )

# --- Lindley queue delay (recurrence -> window prefix algebra) -------------
#
# Single-server FIFO queue per supplier: jobs are lineitems in shipdate
# order, service time a deterministic function of quantity. The waiting
# time follows the Lindley recurrence W_{n+1} = max(0, W_n + S_n - A_n)
# — superficially sequential, but the closed form
#     C_n = S_n + max_{j<=n} (a_j - S_{j-1}),   W_n = C_n - s_n - a_n
# (S = running service-time sum, a = arrival day) turns it into TWO
# per-key window scans: a running sum and a running max. That is the
# distributed-recurrence pattern this engine uses everywhere (cf. the
# KM fold): what looks like an order-N dependency chain is a prefix
# scan in disguise. Partitions key on l_suppkey, whose cardinality
# grows linearly with the corpus while jobs-per-supplier stays ~flat
# (TPC-H keeps lineitems/supplier constant across SF), so no partition
# outgrows an executor at 100 TB.

_LINDLEY_ORACLE = """
    WITH jobs AS (
        SELECT CAST(l_suppkey AS BIGINT) AS suppkey,
               CAST(datediff('day', DATE '1990-01-01',
                             CAST(l_shipdate AS DATE)) AS BIGINT) AS a,
               CAST(l_quantity AS BIGINT) // 8 + 1 AS s,
               l_orderkey, l_linenumber
        FROM lineitem
    ), scanned AS (
        SELECT suppkey, a, s, l_orderkey, l_linenumber,
               CAST(sum(s) OVER w - s AS BIGINT) AS s_excl
        FROM jobs
        WINDOW w AS (PARTITION BY suppkey
                     ORDER BY a, l_orderkey, l_linenumber
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), waited AS (
        SELECT suppkey, a, s, s_excl,
               s_excl + max(a - s_excl) OVER w - a AS wait_days
        FROM scanned
        WINDOW w AS (PARTITION BY suppkey
                     ORDER BY a, l_orderkey, l_linenumber
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT suppkey,
           CAST(count(*) AS BIGINT) AS n_jobs,
           CAST(sum(wait_days) AS BIGINT) AS total_wait_days,
           CAST(max(wait_days) AS BIGINT) AS max_wait_days,
           CAST(sum(s) * 1000
                // (max(a + wait_days + s) - min(a)) AS BIGINT)
               AS util_permille
    FROM waited
    GROUP BY suppkey
    ORDER BY total_wait_days DESC, suppkey
    LIMIT 15
"""


@register(
    "supplier_queue_delay_lindley",
    oracle=_LINDLEY_ORACLE,
    tags=("timeseries", "window", "queueing"),
    doc="Per-supplier single-server FIFO queue simulation via the "
    "Lindley recurrence W_{n+1} = max(0, W_n + S_n - A_n): lineitems "
    "are jobs arriving on their shipdate, service days = quantity "
    "div 8 + 1, and the per-job waiting time — a sequential "
    "recurrence on its face — is computed distributed through the "
    "closed form C_n = S_n + max_{j<=n}(a_j - S_{j-1}), i.e. ONE "
    "running sum plus ONE running max per supplier partition (the "
    "same recurrence->prefix-scan move as the KM fold). All-integer "
    "day arithmetic, utilization on the permille grid with a "
    "truncating division over positive operands only. Supplier "
    "cardinality scales linearly with the corpus while jobs/supplier "
    "stays flat, so the windows never concentrate; the top-15 tail "
    "is TakeOrderedAndProject. The queueing lens (per-job transient "
    "waits under load) complements orders_littles_law_identity's "
    "steady-state identity with the transient per-job answer.",
)
def supplier_queue_delay_lindley(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    jobs = li.select(
        F.col("l_suppkey").cast("long").alias("suppkey"),
        F.datediff(F.to_date("l_shipdate"), F.lit("1990-01-01"))
        .cast("long")
        .alias("a"),
        F.expr("CAST(l_quantity AS BIGINT) div 8 + 1").alias("s"),
        "l_orderkey",
        "l_linenumber",
    )
    w = (
        Window.partitionBy("suppkey")
        .orderBy("a", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scanned = jobs.withColumn(
        "s_excl", (F.sum("s").over(w) - F.col("s")).cast("long")
    )
    waited = scanned.withColumn(
        "wait_days",
        F.col("s_excl")
        + F.max(F.col("a") - F.col("s_excl")).over(w)
        - F.col("a"),
    )
    return (
        waited.groupBy("suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_jobs"),
            F.sum("wait_days").cast("long").alias("total_wait_days"),
            F.max("wait_days").cast("long").alias("max_wait_days"),
            F.expr(
                "CAST(sum(s) * 1000"
                " div (max(a + wait_days + s) - min(a)) AS BIGINT)"
            ).alias("util_permille"),
        )
        .orderBy(F.col("total_wait_days").desc(), "suppkey")
        .limit(15)
    )

# --- Running-balance maximum drawdown --------------------------------------
#
# The financial-risk scan: per user, a signed ledger (purchases credit,
# errors debit), its running balance, the running peak, and the MAXIMUM
# DRAWDOWN = max over time of (peak - balance) — the largest
# peak-to-trough loss a monitor watching the balance would have seen.
# Two per-user window scans (running sum, running max), the same
# prefix-algebra shape as the Lindley queue; user cardinality scales
# with the corpus, rows-per-user stays bounded.

_DRAWDOWN_ORACLE = """
    WITH ledger AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(round(value * 100) AS BIGINT)
                    ELSE -CAST(round(value * 100) AS BIGINT) END AS delta
        FROM events
        WHERE event_type IN ('purchase', 'error')
    ), bal AS (
        SELECT user_id, ts, event_id, delta,
               CAST(sum(delta) OVER w AS BIGINT) AS balance
        FROM ledger
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), dd AS (
        SELECT user_id, delta, balance,
               max(balance) OVER w - balance AS drawdown
        FROM bal
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_moves,
           CAST(max(drawdown) AS BIGINT) AS max_drawdown_cents,
           CAST(max(balance) AS BIGINT) AS peak_cents,
           CAST(sum(delta) AS BIGINT) AS final_cents
    FROM dd
    GROUP BY user_id
    ORDER BY max_drawdown_cents DESC, user_id
    LIMIT 20
"""


@register(
    "events_value_drawdown",
    oracle=_DRAWDOWN_ORACLE,
    tags=("timeseries", "window", "finance"),
    doc="Maximum drawdown of each user's running value balance "
    "(purchases credit, errors debit): running sum -> running max -> "
    "peak-minus-balance, all exact cents BIGINT, windows partitioned "
    "by user_id ordered by (ts, event_id) — a total order, so the "
    "scan is deterministic. The risk-monitoring twin of the Lindley "
    "queue scan: both turn an apparently sequential state recurrence "
    "into composable per-key prefix windows. Wait-free at scale: "
    "user count grows with the corpus, per-user history is bounded, "
    "and the top-20 tail is TakeOrderedAndProject; the type filter "
    "is pushed to the parquet scan.",
)
def events_value_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ledger = ev.filter(
        F.col("event_type").isin("purchase", "error")
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("event_type") == "purchase",
            F.expr("CAST(round(value * 100) AS BIGINT)"),
        )
        .otherwise(F.expr("-CAST(round(value * 100) AS BIGINT)"))
        .alias("delta"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bal = ledger.withColumn(
        "balance", F.sum("delta").over(w).cast("long")
    )
    dd = bal.withColumn(
        "drawdown", F.max("balance").over(w) - F.col("balance")
    )
    return (
        dd.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_moves"),
            F.max("drawdown").cast("long").alias("max_drawdown_cents"),
            F.max("balance").cast("long").alias("peak_cents"),
            F.sum("delta").cast("long").alias("final_cents"),
        )
        .orderBy(F.col("max_drawdown_cents").desc(), "user_id")
        .limit(20)
    )
