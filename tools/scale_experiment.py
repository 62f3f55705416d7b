"""Reproduce SCALE.md's "Measured scaling (10x union experiment)".

Unions N id-shifted copies of the sf tables (same key-cardinality
ratios, N x rows) and times heavy operators warm at 1x vs Nx on fixed
cores. The property being demonstrated: every operator's cost grows at
most linearly in rows / candidate pairs — no quadratic edge — which is
what makes the fixed-core growth factor the right proxy for the
1000-executor extrapolation.

Usage: python tools/scale_experiment.py [N]   (default N=10, sf0.1)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sf = "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from dynamodb_stream_processor_2_0_spark.operators import dedup
    from dynamodb_stream_processor_2_0_spark.operators import disposition as D
    from dynamodb_stream_processor_2_0_spark.operators.ranking import global_rank
    from dynamodb_stream_processor_2_0_spark.session import get_spark
    from dynamodb_stream_processor_2_0_spark.sources.catalog import load_table

    spark = get_spark("scale-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    def scaled(df, id_cols: dict[str, int], n: int, parts: int):
        out = df
        for i in range(1, n):
            shifted = df
            for col, stride in id_cols.items():
                shifted = shifted.withColumn(col, F.col(col) + F.lit(i * stride))
            out = out.union(shifted)
        return out.repartition(parts).localCheckpoint(eager=True)

    li1 = scaled(load_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey"),
                 {"l_orderkey": 10**9}, 1, 8)
    li_n = scaled(load_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey"),
                  {"l_orderkey": 10**9}, n_copies, 32)
    cust1 = scaled(load_table(spark, sf, "customer").select("c_custkey", "c_mktsegment", "c_acctbal"),
                   {"c_custkey": 10**8}, 1, 8)
    cust_n = scaled(load_table(spark, sf, "customer").select("c_custkey", "c_mktsegment", "c_acctbal"),
                    {"c_custkey": 10**8}, n_copies, 32)
    ord1 = scaled(load_table(spark, sf, "orders").select("o_custkey", "o_orderpriority"),
                  {"o_custkey": 10**8}, 1, 8)
    ord_n = scaled(load_table(spark, sf, "orders").select("o_custkey", "o_orderpriority"),
                   {"o_custkey": 10**8}, n_copies, 32)
    docs1 = scaled(load_table(spark, sf, "documents"), {"doc_id": 10**7}, 1, 8)
    docs_n = scaled(load_table(spark, sf, "documents"), {"doc_id": 10**7}, n_copies, 32)
    ev1 = scaled(load_table(spark, sf, "events"), {"user_id": 10**7, "event_id": 10**8}, 1, 8)
    ev_n = scaled(load_table(spark, sf, "events"), {"user_id": 10**7, "event_id": 10**8}, n_copies, 32)

    def disposition(ev):
        return D.disposition_summary(ev, D.DEFAULT_CONFIG)

    def minhash_pairs(docs):
        return dedup.minhash_lsh_candidate_pairs(docs)

    def simhash_fp(docs):
        return dedup.simhash(docs)

    def contamination(docs):
        d = docs.withColumn("toks", dedup.tokens_col("text"))
        sh = d.select(
            "doc_id", "source", F.explode(dedup.shingles_col("toks", 3)).alias("shingle")
        )
        bench = (
            sh.filter(F.col("source").isin("src0", "src1"))
            .select("shingle")
            .distinct()
            .withColumn("hit", F.lit(1))
        )
        cand = sh.filter(~F.col("source").isin("src0", "src1"))
        return (
            cand.join(F.broadcast(bench), "shingle", "left")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"), F.count("hit").alias("h"))
        )

    def grank(docs):
        return global_rank(docs.select("doc_id", "source"), ["source", "doc_id"], out_col="pos")

    def cohort(ev):
        firsts = ev.groupBy("user_id").agg(F.min(F.date_trunc("week", "ts")).alias("cw"))
        act = ev.select("user_id", F.date_trunc("week", "ts").alias("aw")).distinct()
        return firsts.join(act, "user_id").groupBy("cw", "aw").agg(F.count(F.lit(1)).alias("n"))

    def paragraph_dedup(docs):
        sents = docs.select("doc_id", F.explode(F.split("text", r"\. ")).alias("sent"))
        counted = sents.groupBy("sent").agg(F.count(F.lit(1)).alias("n_global"))
        return (
            sents.join(counted, "sent")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.count_if(F.col("n_global") > 1).alias("d"))
        )

    def gopher_rules(docs):
        toks = docs.select("doc_id", F.split("text", " ").alias("toks"))
        grams = toks.select(
            "doc_id", F.size("toks").alias("n_tokens"),
            F.explode(F.expr(
                "CASE WHEN size(toks) < 2 THEN array() "
                "ELSE transform(sequence(2, size(toks)), "
                "i -> concat(toks[i-2], ' ', toks[i-1])) END")).alias("bigram"))
        return (
            grams.groupBy("doc_id", "n_tokens", "bigram")
            .agg(F.count(F.lit(1)).alias("n"))
            .groupBy("doc_id", "n_tokens")
            .agg((F.max("n").cast("double") / F.sum("n")).alias("top_frac"))
        )

    def basket_pairs(li):
        baskets = li.groupBy("l_orderkey").agg(
            F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        pairs = baskets.select(F.explode(F.expr(
            "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps)), "
            "y -> struct(x AS a, y AS b))))")).alias("pr"))
        return (pairs.select("pr.a", "pr.b").groupBy("a", "b")
                .agg(F.count(F.lit(1)).alias("s")).filter(F.col("s") >= 3))

    def bitmap_semi(data):
        cust, orders = data
        dim_bits = (
            orders.filter(F.col("o_orderpriority") == "1-URGENT")
            .select(F.shiftright("o_custkey", 6).alias("bucket"),
                    F.expr("shiftleft(1L, int(o_custkey % 64))").alias("bit"))
            .groupBy("bucket").agg(F.bit_or("bit").alias("mask")))
        return (
            cust.join(F.broadcast(dim_bits),
                      F.shiftright(F.col("c_custkey"), 6) == F.col("bucket"))
            .filter(F.col("mask").bitwiseAND(
                F.expr("shiftleft(1L, int(c_custkey % 64))")) != 0)
            .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n")))

    def run(df_builder, data):
        df_builder(data).write.mode("overwrite").format("noop").save()  # warm
        t = time.perf_counter()
        df_builder(data).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t

    def tfidf_topk(docs):
        from pyspark.sql import Window as W
        term_rows = docs.select(
            "doc_id",
            F.explode(F.filter(F.split(F.lower("text"), "[^a-z0-9]+"),
                               lambda t: F.length(t) >= 4)).alias("term"))
        tf = term_rows.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
        dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
        w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
        return (tf.join(dfq, "term").crossJoin(F.broadcast(n))
                .withColumn("score", (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df"))
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= 5))

    def shingle_containment(docs_dir):
        # the REGISTERED operator (exact-copy collapse + expand): the
        # 10x corpus is 10 byte-identical copies of every doc, exactly
        # the duplication workload the collapse neutralizes.
        from dynamodb_stream_processor_2_0_spark.plans import registry as R
        return R.get("dedup_shingle_containment").fn(spark, docs_dir)

    def token_chunking(docs):
        toks = F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda t: t != F.lit(""))
        base = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") > 0)
        return (base.select("doc_id", "toks",
                            F.explode(F.sequence(F.lit(0), F.size("toks") - 1, F.lit(24))).alias("s"))
                .select("doc_id",
                        F.expr("md5(array_join(slice(toks, s + 1, 32), ' '))").alias("chunk_md5")))

    def transition_matrix(ev):
        from pyspark.sql import Window as W
        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        return (ev.select(F.col("event_type").alias("f"),
                          F.lead("event_type").over(w).alias("t"))
                .filter(F.col("t").isNotNull())
                .groupBy("f", "t").agg(F.count(F.lit(1)).alias("n")))


    def first_touch(ev):
        from pyspark.sql import Window as W
        part = W.partitionBy("user_id", "event_type")
        return (ev.select("user_id", "event_type", "event_id", "ts",
                          F.row_number().over(part.orderBy("ts", "event_id")).alias("rn"),
                          F.count(F.lit(1)).over(part).alias("n_touches"))
                .filter(F.col("rn") == 1))

    def priority_sample(docs):
        from pyspark.sql import Window as W
        u32 = F.conv(F.substring(F.md5(F.concat(F.lit("prio:"), F.col("doc_id"))), 1, 8), 16, 10).cast("long")
        pr = F.col("n_chars").cast("double") * F.lit(4294967296.0) / (F.lit(1.0) + u32.cast("double"))
        w = W.partitionBy("source").orderBy(F.desc("priority"), F.asc("doc_id"))
        return (docs.select("doc_id", "source", pr.alias("priority"))
                .withColumn("pick_order", F.row_number().over(w))
                .filter(F.col("pick_order") <= 25))

    def chain_walk_bucketed(orders_dir):
        # registered query against a staged dir; cap forced to 0 so the
        # measurement exercises the >2M-row bucketed large path at BOTH
        # scales (the path a 100 TB run would take).
        from dynamodb_stream_processor_2_0_spark.plans import registry as R
        prior = spark.conf.get("spark_graft.chainwalk.broadcast_row_cap", None)
        spark.conf.set("spark_graft.chainwalk.broadcast_row_cap", "0")
        try:
            return R.get("recursive_order_chain_walk").fn(spark, orders_dir)
        finally:
            if prior is None:
                spark.conf.unset("spark_graft.chainwalk.broadcast_row_cap")
            else:
                spark.conf.set("spark_graft.chainwalk.broadcast_row_cap", prior)

    import tempfile as _tf

    def _stage_orders(df):
        d = _tf.mkdtemp(prefix="scale_orders_")
        df.write.mode("overwrite").parquet(f"{d}/orders.parquet")
        return d

    ordfull1 = _stage_orders(scaled(
        load_table(spark, sf, "orders").select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "o_orderpriority"),
        {"o_custkey": 10**8, "o_orderkey": 10**9}, 1, 8))
    ordfull_n = _stage_orders(scaled(
        load_table(spark, sf, "orders").select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "o_orderpriority"),
        {"o_custkey": 10**8, "o_orderkey": 10**9}, n_copies, 32))

    def _stage_docs(df):
        d = _tf.mkdtemp(prefix="scale_docs_")
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        return d

    docsdir1 = _stage_docs(docs1)
    docsdir_n = _stage_docs(docs_n)

    emb1 = scaled(load_table(spark, sf, "embeddings"), {"vec_id": 10**7}, 1, 8)
    emb_n = scaled(
        load_table(spark, sf, "embeddings"), {"vec_id": 10**7}, n_copies, 32
    )

    def _stage_graph(ords, lis):
        d = _tf.mkdtemp(prefix="scale_graph_")
        ords.write.mode("overwrite").parquet(f"{d}/orders.parquet")
        lis.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
        return d

    graphdir1 = _stage_graph(
        scaled(
            load_table(spark, sf, "orders").select("o_orderkey", "o_custkey"),
            {"o_orderkey": 10**9, "o_custkey": 10**8}, 1, 8),
        scaled(
            load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey"),
            {"l_orderkey": 10**9, "l_suppkey": 10**6}, 1, 8))
    graphdir_n = _stage_graph(
        scaled(
            load_table(spark, sf, "orders").select("o_orderkey", "o_custkey"),
            {"o_orderkey": 10**9, "o_custkey": 10**8}, n_copies, 32),
        scaled(
            load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey"),
            {"l_orderkey": 10**9, "l_suppkey": 10**6}, n_copies, 32))

    def _stage_events(df):
        d = _tf.mkdtemp(prefix="scale_events_")
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        return d

    evdir1 = _stage_events(ev1)
    evdir_n = _stage_events(ev_n)

    def _stage_one(df, table):
        d = _tf.mkdtemp(prefix=f"scale_{table}_")
        df.write.mode("overwrite").parquet(f"{d}/{table}.parquet")
        return d

    lidir1 = _stage_one(scaled(load_table(spark, sf, "lineitem"),
                               {"l_orderkey": 10**9}, 1, 8), "lineitem")
    lidir_n = _stage_one(scaled(load_table(spark, sf, "lineitem"),
                                {"l_orderkey": 10**9}, n_copies, 32),
                         "lineitem")
    partdir1 = _stage_one(scaled(load_table(spark, sf, "part"),
                                 {"p_partkey": 10**7}, 1, 8), "part")
    partdir_n = _stage_one(scaled(load_table(spark, sf, "part"),
                                  {"p_partkey": 10**7}, n_copies, 32), "part")
    custdir1 = _stage_one(scaled(load_table(spark, sf, "customer"),
                                 {"c_custkey": 10**8}, 1, 8), "customer")
    custdir_n = _stage_one(scaled(load_table(spark, sf, "customer"),
                                  {"c_custkey": 10**8}, n_copies, 32),
                           "customer")
    embdir1 = _stage_one(emb1, "embeddings")
    embdir_n = _stage_one(emb_n, "embeddings")

    def _stage_cust_supp(cust):
        d = _tf.mkdtemp(prefix="scale_custsupp_")
        cust.write.mode("overwrite").parquet(f"{d}/customer.parquet")
        load_table(spark, sf, "supplier").write.mode("overwrite").parquet(
            f"{d}/supplier.parquet")
        return d

    custsuppdir1 = _stage_cust_supp(
        scaled(load_table(spark, sf, "customer"), {"c_custkey": 10**8}, 1, 8))
    custsuppdir_n = _stage_cust_supp(
        scaled(load_table(spark, sf, "customer"), {"c_custkey": 10**8},
               n_copies, 32))

    def _stage_docs_emb(docs, emb):
        d = _tf.mkdtemp(prefix="scale_docemb_")
        docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        emb.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
        return d

    alidir1 = _stage_docs_emb(docs1, emb1)
    alidir_n = _stage_docs_emb(docs_n, emb_n)

    # Lindley's scale model: supplier count grows with the corpus while
    # jobs/supplier stays flat — shift l_suppkey alongside l_orderkey.
    lisuppdir1 = _stage_one(
        scaled(load_table(spark, sf, "lineitem"),
               {"l_orderkey": 10**9, "l_suppkey": 10**6}, 1, 8),
        "lineitem")
    lisuppdir_n = _stage_one(
        scaled(load_table(spark, sf, "lineitem"),
               {"l_orderkey": 10**9, "l_suppkey": 10**6}, n_copies, 32),
        "lineitem")

    def _stage_world(n, parts):
        """Full ten-table world: facts scaled Nx with id shifts, dims
        (region/nation/part/supplier) constant — the realistic scale-up
        shape for the schema-discovery / FK-impact ops that walk every
        table."""
        d = _tf.mkdtemp(prefix="scale_world_")
        facts = {
            "customer": {"c_custkey": 10**8},
            "orders": {"o_orderkey": 10**9, "o_custkey": 10**8},
            "lineitem": {"l_orderkey": 10**9},
            "events": {"user_id": 10**7, "event_id": 10**8},
            "documents": {"doc_id": 10**7},
            "embeddings": {"vec_id": 10**7},
        }
        for t in ("region", "nation", "part", "supplier"):
            load_table(spark, sf, t).write.mode("overwrite").parquet(
                f"{d}/{t}.parquet"
            )
        for t, strides in facts.items():
            scaled(load_table(spark, sf, t), strides, n, parts).write.mode(
                "overwrite"
            ).parquet(f"{d}/{t}.parquet")
        return d

    worlddir1 = _stage_world(1, 8)
    worlddir_n = _stage_world(n_copies, 32)

    def _stage_ord_li(ords, lis):
        d = _tf.mkdtemp(prefix="scale_ordli_")
        ords.write.mode("overwrite").parquet(f"{d}/orders.parquet")
        lis.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
        return d

    ordlidir1 = _stage_ord_li(
        scaled(load_table(spark, sf, "orders"),
               {"o_orderkey": 10**9, "o_custkey": 10**8}, 1, 8),
        scaled(load_table(spark, sf, "lineitem"),
               {"l_orderkey": 10**9}, 1, 8))
    ordlidir_n = _stage_ord_li(
        scaled(load_table(spark, sf, "orders"),
               {"o_orderkey": 10**9, "o_custkey": 10**8}, n_copies, 32),
        scaled(load_table(spark, sf, "lineitem"),
               {"l_orderkey": 10**9}, n_copies, 32))

    def semantic_dedup_op(emb):
        from dynamodb_stream_processor_2_0_spark.operators import clustering as C
        return C.semantic_dedup(emb)

    def _registered(name):
        from dynamodb_stream_processor_2_0_spark.plans import registry as R
        return lambda dirpath: R.get(name).fn(spark, dirpath)

    cases = [
        ("disposition_summary", disposition, ev1, ev_n),
        ("minhash_lsh_pairs", minhash_pairs, docs1, docs_n),
        ("simhash_fingerprints", simhash_fp, docs1, docs_n),
        ("contamination_probe", contamination, docs1, docs_n),
        ("global_rank", grank, docs1, docs_n),
        ("retention_cohort", cohort, ev1, ev_n),
        ("paragraph_dedup", paragraph_dedup, docs1, docs_n),
        ("gopher_repetition", gopher_rules, docs1, docs_n),
        ("basket_pair_mining", basket_pairs, li1, li_n),
        ("bitmap_semi_join", bitmap_semi, (cust1, ord1), (cust_n, ord_n)),
        ("tfidf_topk", tfidf_topk, docs1, docs_n),
        ("shingle_containment", shingle_containment, docsdir1, docsdir_n),
        ("token_chunking", token_chunking, docs1, docs_n),
        ("transition_matrix", transition_matrix, ev1, ev_n),
        ("first_touch_attribution", first_touch, ev1, ev_n),
        ("priority_weighted_sample", priority_sample, docs1, docs_n),
        ("chain_walk_bucketed_path", chain_walk_bucketed, ordfull1, ordfull_n),
        ("semantic_dedup_kmeans", semantic_dedup_op, emb1, emb_n),
        ("token_window_exact_dedup", _registered("dedup_token_window_exact"),
         docsdir1, docsdir_n),
        ("quality_classifier", _registered("quality_classifier_score"),
         docsdir1, docsdir_n),
        ("pagerank_fixpoint", _registered("graph_pagerank_fixpoint"),
         graphdir1, graphdir_n),
        ("zorder_layout", _registered("zorder_layout_stats"),
         ordfull1, ordfull_n),
        ("shard_manifest_prefix_sum", _registered("corpus_shard_manifest"),
         docsdir1, docsdir_n),
        ("sessionized_funnel", _registered("events_sessionized_funnel"),
         evdir1, evdir_n),
        ("twap_per_user", _registered("timeseries_twap_per_user"),
         evdir1, evdir_n),
        ("cohort_ltv", _registered("events_cohort_ltv"), evdir1, evdir_n),
        ("pcm_window_energy", _registered("multimodal_pcm_window_energy"),
         docsdir1, docsdir_n),
        ("graph_bfs", _registered("graph_shortest_path_bfs"),
         graphdir1, graphdir_n),
        ("graph_lpa", _registered("graph_label_propagation"),
         graphdir1, graphdir_n),
        ("graph_walks", _registered("graph_deterministic_walks"),
         graphdir1, graphdir_n),
        ("graph_node_jaccard", _registered("graph_node_jaccard_similarity"),
         graphdir1, graphdir_n),
        ("graph_hits", _registered("graph_hits_hubs_authorities"),
         graphdir1, graphdir_n),
        ("graph_modularity", _registered("graph_modularity_score"),
         graphdir1, graphdir_n),
        ("winnowing_fps", _registered("text_winnowing_fingerprints"),
         docsdir1, docsdir_n),
        ("cdc_chunks", _registered("dedup_cdc_chunks"),
         docsdir1, docsdir_n),
        # round-6 second continuation (ml / eval / privacy / patterns)
        ("ols_sufficient_stats", _registered("ml_ols_regression_closed_form"),
         lidir1, lidir_n),
        ("hashed_linear_scorer", _registered("ml_hashed_linear_scorer"),
         docsdir1, docsdir_n),
        ("calibration_ece", _registered("eval_calibration_curve_ece"),
         docsdir1, docsdir_n),
        ("bcubed_dedup_eval", _registered("eval_dedup_bcubed"),
         docsdir1, docsdir_n),
        ("cc_star_contraction", _registered("dedup_cluster_assign_star"),
         docsdir1, docsdir_n),
        ("shapley_attribution", _registered("attribution_shapley_exact"),
         evdir1, evdir_n),
        ("mann_kendall", _registered("events_mann_kendall_test"),
         evdir1, evdir_n),
        ("sequential_patterns", _registered("events_sequential_patterns"),
         evdir1, evdir_n),
        ("fellegi_sunter", _registered("dedup_fellegi_sunter_linkage"),
         partdir1, partdir_n),
        ("t_closeness", _registered("privacy_t_closeness_audit"),
         custdir1, custdir_n),
        ("ndcg_ranking", _registered("eval_ndcg_ranking"),
         embdir1, embdir_n),
        ("calinski_harabasz", _registered(
            "eval_clustering_calinski_harabasz"), embdir1, embdir_n),
        ("kaplan_meier", _registered("customer_kaplan_meier_survival"),
         ordfull1, ordfull_n),
        ("text_embedding_alignment", _registered(
            "quality_text_embedding_alignment"), alidir1, alidir_n),
        # round-6 third continuation (inference / causal / queueing)
        ("lindley_queue_delay", _registered("supplier_queue_delay_lindley"),
         lisuppdir1, lisuppdir_n),
        ("value_drawdown", _registered("events_value_drawdown"),
         evdir1, evdir_n),
        ("poisson_bootstrap_ci", _registered("events_poisson_bootstrap_ci"),
         evdir1, evdir_n),
        ("diff_in_diff", _registered("events_diff_in_diff"),
         evdir1, evdir_n),
        ("signflip_fdr", _registered("events_signflip_fdr"),
         evdir1, evdir_n),
        ("conformal_coverage", _registered("ml_conformal_interval_coverage"),
         ordlidir1, ordlidir_n),
        # round-6 fourth/fifth continuations
        ("sorted_neighborhood", _registered("dedup_sorted_neighborhood"),
         docsdir1, docsdir_n),
        ("cuped_variance", _registered("events_cuped_variance_reduction"),
         evdir1, evdir_n),
        ("xcorr_leadlag", _registered("events_cross_correlation_leadlag"),
         evdir1, evdir_n),
        ("markov_eval", _registered("events_markov_next_event_eval"),
         evdir1, evdir_n),
        ("chao1_richness", _registered("text_chao1_vocab_richness"),
         docsdir1, docsdir_n),
        ("brier_murphy", _registered("eval_brier_murphy_decomposition"),
         docsdir1, docsdir_n),
        ("clustering_coeff", _registered("graph_clustering_coefficient"),
         docsdir1, docsdir_n),
        ("jsd_sources", _registered("text_js_divergence_sources"),
         docsdir1, docsdir_n),
        ("isotropy_audit", _registered("embedding_isotropy_audit"),
         embdir1, embdir_n),
        ("gini_stump", _registered("ml_gini_decision_stump"),
         lidir1, lidir_n),
        ("dp_sensitivity", _registered("privacy_dp_sensitivity_report"),
         evdir1, evdir_n),
        ("kcenter_coreset", _registered("embedding_kcenter_coreset"),
         embdir1, embdir_n),
        ("naive_bayes_langid", _registered("ml_naive_bayes_langid"),
         docsdir1, docsdir_n),
        ("kneser_ney_lm", _registered("text_kneser_ney_bigram_lm"),
         docsdir1, docsdir_n),
        ("audio_landmarks", _registered("multimodal_audio_landmark_match"),
         docsdir1, docsdir_n),
        ("rouge_pairs", _registered("eval_rouge_near_dup_pairs"),
         docsdir1, docsdir_n),
        ("markov_removal", _registered("attribution_markov_removal"),
         evdir1, evdir_n),
        ("knn_label_eval", _registered("ml_knn_label_eval"),
         embdir1, embdir_n),
        ("periodogram", _registered("events_periodogram_fixed"),
         evdir1, evdir_n),
        ("neyman_allocation", _registered("sample_neyman_allocation"),
         docsdir1, docsdir_n),
        ("method_agreement", _registered("eval_dedup_method_agreement"),
         docsdir1, docsdir_n),
        ("feature_mi", _registered("ml_feature_mutual_information"),
         lidir1, lidir_n),
        ("shot_keyframes", _registered("multimodal_shot_keyframes"),
         docsdir1, docsdir_n),
        ("ktruss", _registered("graph_ktruss_edges"),
         docsdir1, docsdir_n),
        ("ood_knn", _registered("embedding_ood_knn_distance"),
         embdir1, embdir_n),
        ("synth_fidelity", _registered("privacy_synthetic_fidelity_audit"),
         custdir1, custdir_n),
        ("residual_anomaly", _registered("events_seasonal_residual_anomaly"),
         evdir1, evdir_n),
        ("slo_burn", _registered("events_slo_burn_rate"),
         evdir1, evdir_n),
        ("price_volume_mix", _registered("orders_price_volume_mix"),
         ordfull1, ordfull_n),
        ("adamic_adar", _registered("graph_adamic_adar_linkpred"),
         custsuppdir1, custsuppdir_n),
        # round-8: retrieval family post-TakeOrderedAndProject fix
        # (commit 1a84d74) + the interval family's quadratic output
        # curve — the r7 verdict's item 7.
        ("bm25_topk", _registered("text_bm25_topk"), docsdir1, docsdir_n),
        ("rrf_hybrid", _registered("search_rrf_hybrid"), embdir1, embdir_n),
        ("rake_keywords", _registered("text_rake_keywords"),
         docsdir1, docsdir_n),
        ("pmi_collocations", _registered("text_pmi_collocations"),
         docsdir1, docsdir_n),
        ("zipf_fit", _registered("text_zipf_fit"), docsdir1, docsdir_n),
        ("interval_overlap_join", _registered("interval_overlap_join"),
         evdir1, evdir_n),
        ("interval_allen_census",
         _registered("interval_allen_algebra_census"), evdir1, evdir_n),
        # round-8 second batch: the advanced/relational analytics that
        # gained planted behavior tests this round — confirming the
        # rollup/window/prefix-sum shapes grow sublinearly on fixed
        # cores at 10x rows.
        ("pareto_skyline", _registered("orders_pareto_skyline"),
         ordfull1, ordfull_n),
        ("fifo_allocation", _registered("lineitem_fifo_allocation"),
         lidir1, lidir_n),
        ("revenue_gini", _registered("customer_revenue_gini"),
         ordfull1, ordfull_n),
        ("supplier_pareto", _registered("supplier_pareto_analysis"),
         lidir1, lidir_n),
        ("sourcing_hhi", _registered("part_sourcing_hhi"),
         lidir1, lidir_n),
        ("ks_shift", _registered("events_ks_distribution_shift"),
         evdir1, evdir_n),
        ("cusum_shift", _registered("events_cusum_shift_detect"),
         evdir1, evdir_n),
        ("benford_audit", _registered("orders_benford_digit_audit"),
         ordfull1, ordfull_n),
        # round-9: the causal/eval family remainder (r8 verdict item 7) —
        # completing measured 10x coverage of queries_causal_eval; the
        # already-covered members are shapley_attribution, diff_in_diff,
        # cuped_variance, xcorr_leadlag, markov_eval, markov_removal,
        # poisson_bootstrap_ci, signflip_fdr, kaplan_meier,
        # sequential_patterns above.
        ("gap_survival_curve", _registered("customer_gap_survival_curve"),
         ordfull1, ordfull_n),
        ("time_decay_attribution", _registered("attribution_time_decay"),
         evdir1, evdir_n),
        ("ab_proportion_test", _registered("events_ab_proportion_test"),
         evdir1, evdir_n),
        ("auc_mann_whitney", _registered("eval_auc_mann_whitney"),
         docsdir1, docsdir_n),
        ("vshape_pattern_match", _registered("events_pattern_vshape_match"),
         evdir1, evdir_n),
        # round-10: the graph-family remainder (r9 verdict item 8) — the
        # most expensive family without measured growth rows: seeded
        # Brandes betweenness, k-core peeling, triangle enumeration, and
        # personalized PageRank, all frontier-join/rollup shapes over
        # the purchase graph. Already-covered members: pagerank_fixpoint,
        # graph_bfs, graph_lpa, graph_walks, graph_node_jaccard,
        # graph_hits, graph_modularity, clustering_coeff, ktruss,
        # adamic_adar above.
        ("graph_betweenness", _registered("graph_betweenness_seeded"),
         graphdir1, graphdir_n),
        ("graph_kcore", _registered("graph_kcore_membership"),
         graphdir1, graphdir_n),
        # triangle enumeration runs over the MinHash-LSH candidate-pair
        # graph on documents (queries_dedup.py), not the purchase graph
        ("graph_triangles", _registered("graph_triangle_enumerate"),
         docsdir1, docsdir_n),
        ("graph_ppr", _registered("graph_personalized_pagerank"),
         graphdir1, graphdir_n),
        # round-10 second batch: (a) the Pandas-UDF lane — the engine's
        # four deliberate Arrow-batched Python operators, measured so
        # the "UDFs are the slow path" posture carries growth numbers,
        # not just a rule; (b) the event-time window / session / as-of
        # family from queries_streaming_batch + timeseries_ext.
        ("udaf_weighted", _registered("udaf_weighted_value"),
         evdir1, evdir_n),
        ("udtf_tokens", _registered("udtf_token_positions"),
         docsdir1, docsdir_n),
        ("dtw_weekly", _registered("timeseries_dtw_weekly_similarity"),
         evdir1, evdir_n),
        ("pandas_outliers", _registered("grouped_pandas_robust_outliers"),
         evdir1, evdir_n),
        ("range_join_neighbors", _registered("range_join_event_neighbors"),
         evdir1, evdir_n),
        ("hypertable_rollup", _registered("hypertable_rollup"),
         evdir1, evdir_n),
        ("events_funnel", _registered("events_funnel"),
         evdir1, evdir_n),
        ("window_sliding_2d1d", _registered("window_sliding_2d_1d"),
         evdir1, evdir_n),
        ("session_dynamic_gap", _registered("session_window_dynamic_gap"),
         evdir1, evdir_n),
        ("rolling_median_7d", _registered("timeseries_rolling_median_7d"),
         evdir1, evdir_n),
        ("seasonal_decompose", _registered("timeseries_seasonal_decompose"),
         evdir1, evdir_n),
        ("anomaly_mad", _registered("events_anomaly_mad"),
         evdir1, evdir_n),
        ("scd2_asof_enrich", _registered("scd2_asof_enrich"),
         evdir1, evdir_n),
        # round-10 third batch: schema discovery (candidate-lattice
        # walks over all ten tables), sketch set algebra, prefix-sum
        # analytics, FK impact, distinct-count windows, text plumbing —
        # the last families without measured rows.
        ("schema_fd", _registered("schema_fd_discovery"),
         worlddir1, worlddir_n),
        ("schema_ind", _registered("schema_ind_discovery"),
         worlddir1, worlddir_n),
        ("schema_key", _registered("schema_key_discovery"),
         worlddir1, worlddir_n),
        ("fk_cascade", _registered("fk_cascade_impact_analysis"),
         worlddir1, worlddir_n),
        ("k_anonymity", _registered("privacy_k_anonymity_audit"),
         custdir1, custdir_n),
        ("kmv_intersection", _registered("sketch_kmv_intersection"),
         evdir1, evdir_n),
        ("histogram_quantiles", _registered("sketch_histogram_quantiles"),
         evdir1, evdir_n),
        ("littles_law", _registered("orders_littles_law_identity"),
         ordlidir1, ordlidir_n),
        ("open_backlog", _registered("orders_open_backlog_daily"),
         ordlidir1, ordlidir_n),
        ("rolling_7d_active", _registered("rolling_7d_active_users"),
         evdir1, evdir_n),
        ("dau_wau", _registered("events_dau_wau_stickiness"),
         evdir1, evdir_n),
        ("error_spike", _registered("events_error_spike_detection"),
         evdir1, evdir_n),
        ("drift_chisquare", _registered("drift_chisquare_by_type"),
         evdir1, evdir_n),
        ("line_dedup_clean", _registered("text_line_dedup_clean"),
         docsdir1, docsdir_n),
        ("token_packing", _registered("text_token_packing"),
         docsdir1, docsdir_n),
    ]
    for label, fn, d1, dn in cases:
        if only and not any(s in label for s in only):
            continue
        a, b = run(fn, d1), run(fn, dn)
        print(f"{label}: 1x={a:.2f}s {n_copies}x={b:.2f}s growth={b / a:.1f}x")


if __name__ == "__main__":
    main()
