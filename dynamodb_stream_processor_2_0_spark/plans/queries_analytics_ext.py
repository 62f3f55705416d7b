"""Round-5 analytics extensions: graph traversal (multi-source BFS,
mode-vote label propagation), mergeable distinct sketches (KMV), and
time-series diagnostics.

These widen the engine past the reference's surface (SURVEY.md §2.7
verified the reference has no graph/sketch/timeseries operators; its
only aggregate is the per-batch counter ledger, index.js:560-600) with
the iterative-graph and cardinality-sketch primitives a 100 TB corpus
pipeline needs: BFS distance from seed domains (crawl-frontier depth
caps), community detection over the interaction graph (spam-cluster
triage), and mergeable distinct-user sketches (per-partition KMV
bottom-k unioned without re-scanning raw data).

Every operator follows the house arithmetic rules: exact BIGINT /
DECIMAL grids, truncating division only on non-negative operands, the
sign extracted before any floored ratio (Spark ``div`` truncates toward
zero while DuckDB ``//`` floors — they agree only on non-negatives),
and md5-derived hashes shared bit-for-bit with the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from dynamodb_stream_processor_2_0_spark.plans.registry import register
from dynamodb_stream_processor_2_0_spark.sources.catalog import load_table

# ---------------------------------------------------------------------------
# Shared graph: the undirected customer<->supplier purchase graph, the
# same node-id encoding as graph_pagerank_fixpoint (customer = 2k,
# supplier = 2k+1) so the graph family is mutually comparable.
# ---------------------------------------------------------------------------

_EDGES_SQL = """
    eo AS (
        SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
                        CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    edges AS (
        SELECT src, dst FROM eo
        UNION
        SELECT dst AS src, src AS dst FROM eo
    )
"""


def _undirected_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst) BIGINT pairs, both directions, distinct."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    directed = (
        orders.join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (F.col("o_custkey") * 2).cast("long").alias("src"),
            (F.col("l_suppkey") * 2 + 1).cast("long").alias("dst"),
        )
        .distinct()
    )
    return (
        directed.union(
            directed.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
        .localCheckpoint(eager=False)
    )


# --- multi-source BFS ------------------------------------------------------

_BFS_DEPTH = 4
# Seed nodes: suppliers #1 and #2 (node ids 3 and 5) — present at every
# SF (supplier count scales as 10000*sf >= 10 at sf0.001).
_BFS_SOURCES = (3, 5)


def _bfs_oracle_sql(depth: int = _BFS_DEPTH) -> str:
    seeds = ", ".join(f"({s})" for s in _BFS_SOURCES)
    ctes = [
        _EDGES_SQL.strip(),
        "nodes AS (SELECT DISTINCT src AS node FROM edges)",
        f"f0 AS (SELECT CAST(node AS BIGINT) AS node FROM (VALUES {seeds}) t(node))",
        "v0 AS (SELECT node, 0 AS depth FROM f0)",
    ]
    for i in range(1, depth + 1):
        p = i - 1
        ctes.append(f"""f{i} AS (
            SELECT DISTINCT e.dst AS node
            FROM edges e JOIN f{p} ON f{p}.node = e.src
            WHERE e.dst NOT IN (SELECT node FROM v{p})
        ), v{i} AS (
            SELECT * FROM v{p} UNION ALL SELECT node, {i} FROM f{i}
        )""")
    return f"""
        WITH {', '.join(ctes)}
        SELECT depth, n_nodes, sum_node_key FROM (
            SELECT depth, count(*) AS n_nodes,
                   CAST(sum(node // 2) AS BIGINT) AS sum_node_key
            FROM v{depth} GROUP BY depth
            UNION ALL
            SELECT -1 AS depth, count(*) AS n_nodes,
                   CAST(sum(node // 2) AS BIGINT) AS sum_node_key
            FROM nodes WHERE node NOT IN (SELECT node FROM v{depth})
        ) WHERE n_nodes > 0
        ORDER BY depth
    """


@register(
    "graph_shortest_path_bfs",
    oracle=_bfs_oracle_sql(),
    tags=("graph", "iterative", "llm", "scale"),
    doc="Multi-source BFS distance over the undirected customer<->"
    "supplier purchase graph: frontier expansion from 2 seed suppliers "
    "to depth 4, reporting nodes first reached per depth plus the "
    "unreached remainder (depth -1) — the crawl-frontier / "
    "blast-radius primitive (how far from seed domains is this page?). "
    "Per round: ONE edges||frontier join + an anti-join against the "
    "visited set (both shuffle on node id — co-partitionable at scale "
    "by bucketing edges on src); localCheckpoint keeps lineage flat so "
    "round i never replays rounds 1..i-1. The frontier is the ONLY "
    "growing state and it is a set of node ids, not paths — no "
    "path-explosion, unlike a naive recursive-CTE walk.",
)
def graph_shortest_path_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier BFS: visited accumulates (node, depth); each round joins
    edges to the *frontier only* (not all visited) and anti-joins the
    visited set, so per-round work is proportional to the frontier's
    edge cut — the textbook distributed-BFS shape."""
    edges = _undirected_edges(spark, sf_dir)
    nodes = edges.select(F.col("src").alias("node")).distinct()
    sources = spark.createDataFrame(
        [(int(s),) for s in _BFS_SOURCES], "node long"
    )
    visited = sources.withColumn("depth", F.lit(0))
    frontier = sources
    for d in range(1, _BFS_DEPTH + 1):
        nxt = (
            edges.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        frontier = nxt.join(visited, "node", "left_anti").localCheckpoint(
            eager=False
        )
        visited = visited.union(
            frontier.withColumn("depth", F.lit(d))
        ).localCheckpoint(eager=False)
    reached = visited.groupBy("depth").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("node div 2")).alias("sum_node_key"),
    )
    unreached = (
        nodes.join(visited, "node", "left_anti")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum(F.expr("node div 2")).alias("sum_node_key"),
        )
        .select(F.lit(-1).alias("depth"), "n_nodes", "sum_node_key")
    )
    return (
        reached.unionByName(unreached)
        .filter(F.col("n_nodes") > 0)
        .orderBy("depth")
    )


# --- mode-vote label propagation ------------------------------------------

_LPA_ITERS = 3


def _lpa_oracle_sql(iters: int = _LPA_ITERS) -> str:
    ctes = [
        _EDGES_SQL.strip(),
        "l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        ctes.append(f"""c{i} AS (
            SELECT e.dst AS node, l.label, count(*) AS cnt
            FROM edges e JOIN l{p} l ON l.node = e.src
            GROUP BY 1, 2
        ), l{i} AS (
            SELECT node, label FROM (
                SELECT node, label,
                       row_number() OVER (
                           PARTITION BY node
                           ORDER BY cnt DESC, label ASC
                       ) AS rn
                FROM c{i}
            ) WHERE rn = 1
        )""")
    return f"""
        WITH {', '.join(ctes)}
        SELECT CAST(label AS BIGINT) AS community,
               count(*) AS n_members,
               CAST(sum(node // 2) AS BIGINT) AS sum_member_key
        FROM l{iters}
        GROUP BY label
        ORDER BY n_members DESC, community ASC
    """


@register(
    "graph_label_propagation",
    oracle=_lpa_oracle_sql(),
    tags=("graph", "iterative", "llm", "scale"),
    doc="Synchronous mode-vote label propagation (3 rounds) over the "
    "purchase graph: each node adopts its neighbors' most frequent "
    "label, ties broken by smallest label — fully deterministic, "
    "unlike classic randomized LPA. Distinct from connected components "
    "(dedup_cluster_assign's min-label flood): mode-voting finds DENSE "
    "communities inside one giant component — the spam-cluster / "
    "topic-cluster triage step. Per round: one edges||labels join + "
    "one (node,label) count + one per-node argmax window — 3 shuffles "
    "on node id, co-partitionable by bucketing edges on src at 100 TB.",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax-by-(count desc, label asc) via row_number keeps every
    round bit-deterministic; labels stay node ids (BIGINT) so the
    community id is itself stable cross-engine."""
    edges = _undirected_edges(spark, sf_dir)
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    w = Window.partitionBy("node").orderBy(
        F.col("cnt").desc(), F.col("label").asc()
    )
    for it in range(_LPA_ITERS):
        if it:
            labels = labels.localCheckpoint(eager=False)
        votes = (
            edges.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.expr("node div 2")).alias("sum_member_key"),
        )
        .orderBy(F.col("n_members").desc(), F.col("community").asc())
    )


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
