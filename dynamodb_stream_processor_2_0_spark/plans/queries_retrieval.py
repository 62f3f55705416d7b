"""Round-6 retrieval extensions: BM25 ranked text retrieval and
reciprocal-rank-fusion hybrid search.

These complete the search read path the LLM-data-pipeline families
already feed: the dedup/quality ops curate the corpus, the ANN family
indexes the embeddings — this module adds the lexical ranker (BM25
over an inverted index) and the fusion step (RRF) that production
retrieval stacks put in front of both.

Reference analog: the reference's only "query" surface is key lookup +
filter expressions (index.js:113-114, 332); ranked retrieval is part of
the engine-surface extension mandated by the driver north star, like
the ANN family (SURVEY.md §2.7).

Arithmetic discipline (house rules): idf and score live on an exact
integer grid — idf is the bitlen-log2 trick (length(bin(N div df))-1 =
floor(log2(N/df))), the BM25 normalization is cleared of fractions by
cross-multiplying with 20*L (k1=6/5, b=3/4 exactly), and the single
division per (query,term,doc) is truncating on non-negatives, so both
engines produce bit-identical scores and the ranking is totally
ordered with no float ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from dynamodb_stream_processor_2_0_spark.operators import similarity as S
from dynamodb_stream_processor_2_0_spark.plans.registry import register
from dynamodb_stream_processor_2_0_spark.sources.catalog import load_table

# --- BM25 ranked retrieval -------------------------------------------------

# k1 = 6/5, b = 3/4 (the classic 1.2 / 0.75 as exact rationals).
# Clearing denominators in
#   score = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
# with avgdl = L/N (L = corpus token count, N = docs) gives
#   score = idf * 44*tf*L / (20*tf*L + 6*L + 18*dl*N)
# — one exact BIGINT ratio per (query, term, doc), scaled to milli.
# At very large L*N the 1000-milli grid would need DECIMAL(38,0) or a
# coarser grid; the rescale is a constant-change, the plan is unchanged.
_BM25_TOPK = 5
# Query workload: terms ranked by (df DESC, term ASC); ranks 9..16 form
# four 2-term queries (rank r pairs with r+4). Mid-band df terms so the
# idf grid is non-trivial (the very top terms have idf 0 — stopwords),
# derived from the corpus itself so the workload exists at every SF.
_BM25_QUERY_RANK_LO = 9
_BM25_QUERY_RANK_HI = 16

_BM25_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ), tf AS (
        SELECT doc_id, tok, count(*) AS tf
        FROM toks WHERE tok <> '' GROUP BY 1, 2
    ), dl AS (
        SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id
    ), corpus AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(dl) AS BIGINT) AS l
        FROM dl
    ), df AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok
    ), qterms AS (
        SELECT tok, CAST((rnk - {_BM25_QUERY_RANK_LO}) % 4 AS BIGINT)
                   AS query_id
        FROM (
            SELECT tok, row_number() OVER (ORDER BY df DESC, tok ASC) AS rnk
            FROM df
        ) WHERE rnk BETWEEN {_BM25_QUERY_RANK_LO} AND {_BM25_QUERY_RANK_HI}
    ), contrib AS (
        SELECT q.query_id, t.doc_id,
               (length(bin(c.n // f.df)) - 1)
                   * 44 * t.tf * c.l * 1000
                   // (20 * t.tf * c.l + 6 * c.l + 18 * d.dl * c.n)
                   AS c_milli
        FROM qterms q
        JOIN tf t ON t.tok = q.tok
        JOIN df f ON f.tok = q.tok
        JOIN dl d ON d.doc_id = t.doc_id
        CROSS JOIN corpus c
    ), scored AS (
        SELECT query_id, doc_id,
               CAST(sum(c_milli) AS BIGINT) AS score_milli,
               CAST(count(*) AS BIGINT) AS n_terms_matched
        FROM contrib GROUP BY 1, 2
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY score_milli DESC, doc_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, CAST(rank AS INTEGER) AS rank, doc_id,
           score_milli, n_terms_matched
    FROM ranked WHERE rank <= {_BM25_TOPK}
    ORDER BY query_id, rank
"""


@register(
    "text_bm25_topk",
    oracle=_BM25_ORACLE,
    tags=("text", "retrieval", "llm", "scale"),
    doc="BM25 ranked retrieval over the documents corpus: four 2-term "
    "queries (derived from mid-band document-frequency terms, so the "
    "workload exists at every SF) scored against the inverted index "
    "with k1=1.2, b=0.75 held as exact rationals — score = "
    "idf*44*tf*L div (20*tf*L + 6*L + 18*dl*N) on the milli grid, idf "
    "= floor(log2(N/df)) via bitlen. Plan: one tokenize+rollup pass "
    "builds tf/dl/df (the inverted index), the 8-term query relation "
    "broadcasts onto the term-partitioned postings, and the only "
    "data-sized shuffles are the index build and the (query,doc) "
    "score rollup — the corpus is never joined to itself and the "
    "per-query work is |postings of its terms|, not |corpus|.",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df/corpus stats are tiny post-agg relations (|vocab| and 1 row)
    — broadcast onto the postings; the hot path is one groupBy over
    exploded tokens and one over (query_id, doc_id)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    # The postings list (tf) feeds FOUR consumers (dl, df, corpus
    # stats, the score join); without materialization each branch
    # re-tokenizes the corpus (Catalyst prunes the branches
    # differently, so exchange reuse can't dedupe them). Checkpointing
    # is also the honest production shape: an inverted index is a
    # built asset, written once and probed many times.
    tf = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dl").cast("long").alias("l"),
    )
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df"))
    # query-term selection ranks the WHOLE vocabulary — data-sized at
    # 100 TB. orderBy().limit(HI) compiles to TakeOrderedAndProject
    # (per-partition top-k, no single-task sort); the re-rank window
    # then touches at most HI rows, which is the benign bounded shape.
    top_terms = df.orderBy(F.col("df").desc(), F.col("tok").asc()).limit(
        _BM25_QUERY_RANK_HI
    )
    wdf = Window.orderBy(F.col("df").desc(), F.col("tok").asc())
    qterms = (
        top_terms.withColumn("rnk", F.row_number().over(wdf))
        .filter(
            F.col("rnk").between(_BM25_QUERY_RANK_LO, _BM25_QUERY_RANK_HI)
        )
        .select(
            "tok",
            ((F.col("rnk") - _BM25_QUERY_RANK_LO) % 4)
            .cast("long")
            .alias("query_id"),
        )
    )
    contrib = (
        tf.join(F.broadcast(qterms), "tok")
        .join(F.broadcast(df), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "c_milli",
            F.expr(
                "(length(bin(n div df)) - 1) * 44 * tf * l * 1000"
                " div (20 * tf * l + 6 * l + 18 * dl * n)"
            ),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("c_milli").cast("long").alias("score_milli"),
        F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("score_milli").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= _BM25_TOPK)
        .select(
            "query_id", "rank", "doc_id", "score_milli", "n_terms_matched"
        )
        .orderBy("query_id", "rank")
    )


# --- reciprocal-rank-fusion hybrid search ----------------------------------

_RRF_K = 60  # the standard RRF damping constant (Cormack et al.)
_RRF_ARM_K = 10  # shortlist depth per arm
_RRF_TOPK = 5
_RRF_QUERY_PRED_SQL = "vec_id < 8"

_RRF_ORACLE = f"""
    WITH cos_arm AS (
        {S.cosine_topk_oracle_sql(k=_RRF_ARM_K, query_pred=_RRF_QUERY_PRED_SQL)}
    ), int8_arm AS (
        {S.int8_quantized_topk_oracle_sql(k=_RRF_ARM_K, query_pred=_RRF_QUERY_PRED_SQL)}
    ), fused AS (
        SELECT COALESCE(c.query_id, i.query_id) AS query_id,
               COALESCE(c.neighbor_id, i.neighbor_id) AS neighbor_id,
               CAST(COALESCE(1000000 // ({_RRF_K} + c.rank), 0)
                    + COALESCE(1000000 // ({_RRF_K} + i.rank), 0) AS BIGINT)
                   AS rrf_micro,
               CAST(CASE WHEN c.rank IS NOT NULL AND i.rank IS NOT NULL
                         THEN 2 ELSE 1 END AS BIGINT) AS n_arms
        FROM cos_arm c
        FULL OUTER JOIN int8_arm i
          ON c.query_id = i.query_id AND c.neighbor_id = i.neighbor_id
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                   ORDER BY rrf_micro DESC, neighbor_id ASC) AS rank
        FROM fused
    )
    SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
           rrf_micro, n_arms
    FROM ranked WHERE rank <= {_RRF_TOPK}
    ORDER BY query_id, rank
"""


@register(
    "search_rrf_hybrid",
    oracle=_RRF_ORACLE,
    tags=("similarity", "retrieval", "llm", "ann"),
    doc="Hybrid-search reciprocal-rank fusion: the exact-cosine top-10 "
    "arm and the int8-quantized dot-product top-10 arm are fused per "
    "query with RRF (score = sum over arms of 1e6 div (60 + rank) — "
    "exact integers, the rank-only fusion that needs no score "
    "calibration between heterogeneous rankers), full-outer-joined so "
    "single-arm hits still score, re-ranked to a fused top-5. The "
    "100 TB shape: each arm is an existing bounded shortlist operator "
    "(broadcast queries, per-query window), and fusion touches only "
    "arms x k rows per query — fusing is free relative to retrieval.",
)
def search_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both arms reuse the registered operator bodies (cosine_topk /
    int8_quantized_topk), so the fusion op inherits their determinism
    contracts; the join keys are (query_id, neighbor_id) over at most
    arms*k rows per query."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    cos = S.cosine_topk(emb, queries, k=_RRF_ARM_K).select(
        "query_id", "neighbor_id", F.col("rank").alias("c_rank")
    )
    int8 = S.int8_quantized_topk(emb, queries, k=_RRF_ARM_K).select(
        "query_id", "neighbor_id", F.col("rank").alias("i_rank")
    )
    fused = (
        cos.join(int8, ["query_id", "neighbor_id"], "full_outer")
        .withColumn(
            "rrf_micro",
            (
                F.coalesce(
                    F.expr(f"1000000 div ({_RRF_K} + c_rank)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"1000000 div ({_RRF_K} + i_rank)"), F.lit(0)
                )
            ).cast("long"),
        )
        .withColumn(
            "n_arms",
            (
                F.col("c_rank").isNotNull().cast("long")
                + F.col("i_rank").isNotNull().cast("long")
            ).cast("long"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("rrf_micro").desc(), F.col("neighbor_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= _RRF_TOPK)
        .select("query_id", "rank", "neighbor_id", "rrf_micro", "n_arms")
        .orderBy("query_id", "rank")
    )


# --- RAKE keyword extraction -----------------------------------------------

_RAKE_N_STOPWORDS = 8  # corpus top-df terms act as the stopword list
_RAKE_TOPK = 15

_RAKE_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id,
               generate_subscripts(string_split(text, ' '), 1) AS pos,
               unnest(string_split(text, ' ')) AS tok
        FROM documents
    ), df AS (
        SELECT tok, count(DISTINCT doc_id) AS df
        FROM toks WHERE tok <> '' GROUP BY tok
    ), stopwords AS (
        SELECT tok FROM (
            SELECT tok, row_number() OVER (ORDER BY df DESC, tok ASC) AS rnk
            FROM df
        ) WHERE rnk <= {_RAKE_N_STOPWORDS}
    ), words AS (
        SELECT doc_id, pos, tok,
               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                   AS island
        FROM toks
        WHERE tok <> '' AND tok NOT IN (SELECT tok FROM stopwords)
    ), pw AS (
        SELECT doc_id, island, pos, tok,
               count(*) OVER (PARTITION BY doc_id, island) AS len
        FROM words
    ), wstats AS (
        SELECT tok, count(*) AS freq, CAST(sum(len) AS BIGINT) AS deg,
               CAST(sum(len) AS BIGINT) * 1000 // count(*) AS score_milli
        FROM pw GROUP BY tok
    ), phrases AS (
        SELECT p.doc_id, p.island,
               string_agg(p.tok, ' ' ORDER BY p.pos) AS phrase,
               CAST(sum(w.score_milli) AS BIGINT) AS p_score
        FROM pw p JOIN wstats w ON w.tok = p.tok
        GROUP BY p.doc_id, p.island
    ), dedup AS (
        SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
               max(p_score) AS score_milli
        FROM phrases GROUP BY phrase
    ), ranked AS (
        SELECT *, row_number() OVER (ORDER BY score_milli DESC,
                   n_occurrences DESC, phrase ASC) AS rank
        FROM dedup
    )
    SELECT CAST(rank AS INTEGER) AS rank, phrase, score_milli,
           n_occurrences
    FROM ranked WHERE rank <= {_RAKE_TOPK}
    ORDER BY rank
"""


@register(
    "text_rake_keywords",
    oracle=_RAKE_ORACLE,
    tags=("text", "retrieval", "llm"),
    doc="RAKE keyword extraction (Rose et al.): candidate phrases are "
    "maximal stopword-free token runs (gaps-and-islands on token "
    "position — island = pos - row_number), each word scores "
    "deg/freq where deg sums the lengths of every phrase containing "
    "it (the co-occurrence-degree signal), a phrase scores the sum "
    "of its words' scores, and identical phrases collapse with an "
    "occurrence count — top-15 on the exact milli grid with a "
    "totally-ordered cut. The stopword list is the corpus's own "
    "top-8 document-frequency terms, so the operator is "
    "self-contained at every SF. Plan: one tokenize pass feeds the "
    "island window (shuffle on doc), word stats are one groupBy on "
    "token, and the phrase rebuild is a broadcast of the |vocab|-"
    "sized score relation back onto the islands — no self-joins, "
    "nothing quadratic.",
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase strings are rebuilt deterministically with an ordered
    struct sort inside each island; every division is truncating on
    non-negatives."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
        )
        .withColumn("pos", F.col("pos0") + 1)
        .drop("pos0")
        .localCheckpoint(eager=False)
    )
    df = (
        toks.filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.countDistinct("doc_id").alias("df"))
    )
    # stopword selection = vocabulary top-N: orderBy().limit() is the
    # distributed TakeOrderedAndProject top-k — no rank column needed,
    # no single-task window over the data-sized vocab
    stopwords = (
        df.orderBy(F.col("df").desc(), F.col("tok").asc())
        .limit(_RAKE_N_STOPWORDS)
        .select("tok")
    )
    wisl = Window.partitionBy("doc_id").orderBy("pos")
    words = (
        toks.filter(F.col("tok") != "")
        .join(F.broadcast(stopwords), "tok", "left_anti")
        .withColumn("island", F.col("pos") - F.row_number().over(wisl))
    )
    pw = words.withColumn(
        "len", F.count(F.lit(1)).over(Window.partitionBy("doc_id", "island"))
    )
    wstats = pw.groupBy("tok").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("len").cast("long").alias("deg"),
        F.expr("cast(sum(len) as bigint) * 1000 div count(*)").alias(
            "score_milli"
        ),
    )
    phrases = (
        pw.join(
            F.broadcast(wstats.select("tok", F.col("score_milli").alias("ws"))),
            "tok",
        )
        .groupBy("doc_id", "island")
        .agg(
            F.expr(
                "array_join(transform(array_sort("
                "collect_list(struct(pos, tok))), s -> s.tok), ' ')"
            ).alias("phrase"),
            F.sum("ws").cast("long").alias("p_score"),
        )
    )
    dedup = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.max("p_score").alias("score_milli"),
    )
    # the final cut ranks the full distinct-phrase relation:
    # TakeOrderedAndProject bounds it to TOPK rows distributedly; the
    # global re-rank window then touches at most TOPK rows (benign)
    top = dedup.orderBy(
        F.col("score_milli").desc(),
        F.col("n_occurrences").desc(),
        F.col("phrase").asc(),
    ).limit(_RAKE_TOPK)
    wrank = Window.orderBy(
        F.col("score_milli").desc(),
        F.col("n_occurrences").desc(),
        F.col("phrase").asc(),
    )
    return (
        top.withColumn("rank", F.row_number().over(wrank))
        .select("rank", "phrase", "score_milli", "n_occurrences")
        .orderBy("rank")
    )


# --- tokenizer vocabulary coverage / OOV rate ------------------------------

_VOCAB_SIZE = 20
_OOV_HIGH_PERMILLE = 100

_OOV_ORACLE = f"""
    WITH toks AS (
        SELECT d.doc_id, d.source, unnest(string_split(d.text, ' ')) AS tok
        FROM documents d
    ), tf AS (
        SELECT tok, count(*) AS cf FROM toks WHERE tok <> '' GROUP BY tok
    ), vocab AS (
        SELECT tok FROM (
            SELECT tok, row_number() OVER (ORDER BY cf DESC, tok ASC) AS rnk
            FROM tf
        ) WHERE rnk <= {_VOCAB_SIZE}
    ), per_doc AS (
        SELECT doc_id, source,
               count(*) AS n_tokens,
               CAST(sum(CASE WHEN tok IN (SELECT tok FROM vocab)
                             THEN 0 ELSE 1 END) AS BIGINT) AS n_oov
        FROM toks WHERE tok <> ''
        GROUP BY doc_id, source
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_oov) AS BIGINT) AS oov_tokens,
           CAST(sum(n_oov) * 1000 // sum(n_tokens) AS BIGINT)
               AS oov_permille,
           CAST(sum(CASE WHEN n_oov * 1000 > {_OOV_HIGH_PERMILLE} * n_tokens
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_high_oov
    FROM per_doc
    GROUP BY source
    ORDER BY source
"""


@register(
    "text_vocab_oov_rate",
    oracle=_OOV_ORACLE,
    tags=("text", "llm", "quality"),
    doc="Tokenizer vocabulary coverage: per-source out-of-vocabulary "
    "rate against the corpus's own top-20 frequency vocabulary — the "
    "coverage report run before committing to a tokenizer (high OOV "
    "=> the vocab under-serves that source and its token counts "
    "inflate), with a per-doc high-OOV flag (>10%) cross-multiplied "
    "so no division happens per doc. Plan: one tokenize pass, the "
    "vocab is a broadcast of 20 rows onto the token stream, then a "
    "per-doc rollup and a per-source rollup — both map-side "
    "combinable; the only data-sized shuffle keys on doc_id.",
)
def text_vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cf"))
    # vocabulary selection = term top-N via TakeOrderedAndProject —
    # no single-task window over the data-sized term relation
    vocab = (
        tf.orderBy(F.col("cf").desc(), F.col("tok").asc())
        .limit(_VOCAB_SIZE)
        .select("tok")
        .withColumn("in_vocab", F.lit(1))
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("in_vocab").isNull().cast("long"))
            .cast("long")
            .alias("n_oov"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("n_oov").cast("long").alias("oov_tokens"),
            F.expr(
                "cast(sum(n_oov) * 1000 div sum(n_tokens) as bigint)"
            ).alias("oov_permille"),
            F.sum(
                (
                    F.col("n_oov") * 1000
                    > F.lit(_OOV_HIGH_PERMILLE) * F.col("n_tokens")
                ).cast("long")
            )
            .cast("long")
            .alias("n_docs_high_oov"),
        )
        .orderBy("source")
    )


# --- PMI collocation mining ------------------------------------------------

_PMI_MIN_PAIR = 5  # min adjacent-pair count to score
_PMI_TOPK = 20

_PMI_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id,
               generate_subscripts(string_split(text, ' '), 1) AS pos,
               unnest(string_split(text, ' ')) AS tok
        FROM documents
    ), clean AS (
        SELECT doc_id, pos, tok FROM toks WHERE tok <> ''
    ), uni AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS c FROM clean GROUP BY tok
    ), n_tot AS (
        SELECT CAST(sum(c) AS BIGINT) AS n FROM uni
    ), pairs AS (
        SELECT a.tok AS w1, b.tok AS w2, CAST(count(*) AS BIGINT) AS c_ab
        FROM clean a JOIN clean b
          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        GROUP BY 1, 2
        HAVING count(*) >= {_PMI_MIN_PAIR}
    ), scored AS (
        SELECT p.w1, p.w2, p.c_ab,
               CASE WHEN n.n * p.c_ab >= u1.c * u2.c
                    THEN length(bin((n.n * p.c_ab) // (u1.c * u2.c))) - 1
                    ELSE 1 - length(bin((u1.c * u2.c) // (n.n * p.c_ab)))
               END AS pmi_bits
        FROM pairs p
        JOIN uni u1 ON u1.tok = p.w1
        JOIN uni u2 ON u2.tok = p.w2
        CROSS JOIN n_tot n
    ), ranked AS (
        SELECT *, row_number() OVER (ORDER BY pmi_bits DESC, c_ab DESC,
                   w1 ASC, w2 ASC) AS rank
        FROM scored
    )
    SELECT CAST(rank AS INTEGER) AS rank, w1, w2, c_ab,
           CAST(pmi_bits AS BIGINT) AS pmi_bits
    FROM ranked WHERE rank <= {_PMI_TOPK}
    ORDER BY rank
"""


@register(
    "text_pmi_collocations",
    oracle=_PMI_ORACLE,
    tags=("text", "llm", "retrieval"),
    doc="PMI collocation mining: adjacent token pairs scored by "
    "pointwise mutual information — the phrase-discovery signal "
    "tokenizer vocab construction and stopword-free phrase lists "
    "are built from (word2vec's phrase pass, Mikolov et al.). PMI = "
    "log2(N*c_ab / (c_a*c_b)) lands on the exact integer grid with "
    "the house bitlen trick, SIGN-EXTENDED: ratios >= 1 score "
    "floor(log2(ratio)), ratios < 1 score 1-bitlen of the inverse — "
    "so repelled pairs rank below attracted ones without any libm. "
    "Pairs below 5 occurrences are cut before scoring (the PMI "
    "low-count instability guard). Plan: adjacency is a self-join "
    "on (doc, pos+1) — at 100 TB this becomes the lag() window on "
    "the same (doc, pos) sort, zero extra shuffles; unigram counts "
    "and the 1-row total broadcast onto the pair relation.",
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark side USES the lag-window form (one shuffle on doc_id
    shared by positions and adjacency); the oracle's self-join is the
    declarative twin."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
        )
        .filter(F.col("tok") != "")
        .localCheckpoint(eager=False)
    )
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    n_tot = uni.agg(F.sum("c").cast("long").alias("n"))
    wadj = Window.partitionBy("doc_id").orderBy("pos0")
    pairs = (
        toks.withColumn("w2", F.lead("tok").over(wadj))
        .withColumn("p2", F.lead("pos0").over(wadj))
        .filter(F.col("w2").isNotNull() & (F.col("p2") == F.col("pos0") + 1))
        .groupBy(F.col("tok").alias("w1"), "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= _PMI_MIN_PAIR)
    )
    scored = (
        pairs.join(
            F.broadcast(uni.select(F.col("tok").alias("w1"), F.col("c").alias("c1"))),
            "w1",
        )
        .join(
            F.broadcast(uni.select(F.col("tok").alias("w2"), F.col("c").alias("c2"))),
            "w2",
        )
        .crossJoin(F.broadcast(n_tot))
        .withColumn(
            "pmi_bits",
            F.expr(
                "CASE WHEN n * c_ab >= c1 * c2"
                " THEN length(bin((n * c_ab) div (c1 * c2))) - 1"
                " ELSE 1 - length(bin((c1 * c2) div (n * c_ab))) END"
            ).cast("long"),
        )
    )
    # the final cut over the surviving-pair relation:
    # TakeOrderedAndProject bounds it to TOPK rows distributedly; the
    # re-rank window then touches at most TOPK rows (benign)
    top = scored.orderBy(
        F.col("pmi_bits").desc(),
        F.col("c_ab").desc(),
        F.col("w1").asc(),
        F.col("w2").asc(),
    ).limit(_PMI_TOPK)
    wr = Window.orderBy(
        F.col("pmi_bits").desc(),
        F.col("c_ab").desc(),
        F.col("w1").asc(),
        F.col("w2").asc(),
    )
    return (
        top.withColumn("rank", F.row_number().over(wr))
        .select("rank", "w1", "w2", "c_ab", "pmi_bits")
        .orderBy("rank")
    )


# --- term burstiness (variance-to-mean ratio) ------------------------------

_BURST_TOP_TERMS = 20

_BURST_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ), n_docs AS (
        SELECT CAST(count(*) AS BIGINT) AS nd FROM documents
    ), tf AS (
        SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS x
        FROM toks WHERE tok <> '' GROUP BY 1, 2
    ), stats AS (
        SELECT tok,
               CAST(count(*) AS BIGINT) AS df,
               CAST(sum(x) AS BIGINT) AS cf,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM tf GROUP BY tok
    ), ranked AS (
        SELECT s.tok, s.df, s.cf, s.sxx, n.nd,
               row_number() OVER (ORDER BY s.cf DESC, s.tok ASC) AS rnk
        FROM stats s CROSS JOIN n_docs n
    )
    SELECT tok, df, cf,
           CAST((nd * sxx - cf * cf) * 1000 // (cf * (nd - 1)) AS BIGINT)
               AS vmr_milli,
           (nd * sxx - cf * cf) > cf * (nd - 1) AS is_bursty
    FROM ranked
    WHERE rnk <= {_BURST_TOP_TERMS}
    ORDER BY tok
"""


@register(
    "text_term_burstiness",
    oracle=_BURST_ORACLE,
    tags=("text", "llm", "stats"),
    doc="Term burstiness (Church-Gale): variance-to-mean ratio of each "
    "top-20 term's per-document count, INCLUDING zero-count docs — "
    "VMR ~ 1 marks Poisson-like function words (the statistical "
    "definition of a stopword, the principled upgrade to the raw-df "
    "lists RAKE/BM25 derive), VMR >> 1 marks content words that "
    "burst in few docs. Exact integers throughout: with zeros "
    "included, n*Var = nd*sxx - cf^2 over the nd-doc population, so "
    "VMR_milli = (nd*sxx - cf^2)*1000 div (cf*(nd-1)) and the "
    "bursty flag is the cross-multiplied VMR > 1 with no division "
    "at all. Plan: one tokenize + (doc,term) rollup, one per-term "
    "rollup (both map-side combinable), the 1-row doc count "
    "broadcast — zero-count docs are algebra, not rows.",
)
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("nd"))
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    stats = tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("x").cast("long").alias("cf"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    # top-term selection = term top-N via TakeOrderedAndProject — no
    # rank column needed, no single-task window over the term relation
    return (
        stats.crossJoin(F.broadcast(n_docs))
        .orderBy(F.col("cf").desc(), F.col("tok").asc())
        .limit(_BURST_TOP_TERMS)
        .select(
            "tok",
            "df",
            "cf",
            F.expr(
                "cast((nd * sxx - cf * cf) * 1000 div (cf * (nd - 1))"
                " as bigint)"
            ).alias("vmr_milli"),
            ((F.col("nd") * F.col("sxx") - F.col("cf") * F.col("cf"))
             > F.col("cf") * (F.col("nd") - 1)).alias("is_bursty"),
        )
        .orderBy("tok")
    )


# --- Zipf rank-frequency fit -----------------------------------------------

_ZIPF_ORACLE = """
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ), tf AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS cf
        FROM toks WHERE tok <> '' GROUP BY tok
    ), ranked AS (
        SELECT tok, cf,
               row_number() OVER (ORDER BY cf DESC, tok ASC) AS rnk
        FROM tf
    ), pts AS (
        SELECT CAST(length(bin(rnk)) - 1 AS BIGINT) AS x,
               CAST(length(bin(cf)) - 1 AS BIGINT) AS y
        FROM ranked
    ), m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM pts
    )
    SELECT n AS n_terms,
           (CASE WHEN n * sxy - sx * sy >= 0 THEN 1 ELSE -1 END)
               * (abs(n * sxy - sx * sy) * 1000 // (n * sxx - sx * sx))
               AS zipf_slope_milli,
           n * sxx - sx * sx > 0 AS fit_defined
    FROM m
"""


@register(
    "text_zipf_fit",
    oracle=_ZIPF_ORACLE,
    tags=("text", "llm", "stats"),
    doc="Zipf rank-frequency fit: least-squares slope of log2(freq) "
    "vs log2(rank) over the whole vocabulary, with both logs on the "
    "exact integer grid via bitlen and the slope as a sign-extracted "
    "scaled integer quotient (same closed form as events_trend_slope"
    "_by_type) — natural language fits slope ~ -1, so the statistic "
    "is a corpus-health diagnostic: a corpus that drifts from its "
    "expected Zipf slope has a generation/boilerplate/dedup problem "
    "upstream (the synthetic ~30-word fixture honestly reads as "
    "strongly non-Zipf, which is exactly what the diagnostic should "
    "say about it). Plan: one tokenize + vocab rollup; the full "
    "vocabulary ranking runs through the distributed global_rank "
    "primitive (range exchange + per-partition window + broadcast "
    "offsets — no single-partition window even though the post-agg "
    "relation is small), then a 1-row moment aggregate.",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dynamodb_stream_processor_2_0_spark.operators.ranking import (
        global_rank,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("cf"))
    pts = global_rank(
        tf.withColumn("negcf", -F.col("cf")), ["negcf", "tok"], "rnk"
    ).select(
        (F.length(F.bin("rnk")) - 1).cast("long").alias("x"),
        (F.length(F.bin("cf")) - 1).cast("long").alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    return m.select(
        F.col("n").alias("n_terms"),
        F.expr(
            "CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE"
            " (CASE WHEN n * sxy - sx * sy >= 0 THEN 1 ELSE -1 END)"
            " * (abs(n * sxy - sx * sy) * 1000 div (n * sxx - sx * sx)) END"
        )
        .cast("long")
        .alias("zipf_slope_milli"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0).alias(
            "fit_defined"
        ),
    )


# --- winnowing fingerprints (MOSS) -----------------------------------------

_WIN_K = 3  # token k-gram width
_WIN_W = 4  # winnowing window (guarantee: any match >= K+W-1 tokens shares a fp)
_WIN_DF_CAP = 50  # stop-fingerprint cap: drop fps present in > 50 docs
_WIN_TOPK = 20

_WINNOW_ORACLE = f"""
    WITH rawtoks AS (
        SELECT doc_id,
               generate_subscripts(string_split(text, ' '), 1) AS pos,
               unnest(string_split(text, ' ')) AS tok
        FROM documents
    ), toks AS (
        SELECT doc_id, tok,
               row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS gpos
        FROM rawtoks WHERE tok <> ''
    ), grams0 AS (
        SELECT doc_id, gpos,
               tok || ' '
                   || lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY gpos)
                   || ' '
                   || lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY gpos)
                   AS g
        FROM toks
    ), grams AS (
        SELECT * FROM grams0 WHERE g IS NOT NULL
    ), gstats AS (
        SELECT doc_id, count(*) AS ng FROM grams GROUP BY doc_id
    ), keyed AS (
        SELECT doc_id, gpos,
               substr(md5(g), 1, 10)
                   || lpad(CAST(9999999 - gpos AS VARCHAR), 7, '0') AS k
        FROM grams
    ), wins AS (
        SELECT k.doc_id, k.gpos - d.d AS s, k.k
        FROM keyed k
        CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS d) d
        JOIN gstats g ON g.doc_id = k.doc_id
        WHERE k.gpos - d.d >= 1
          AND k.gpos - d.d <= greatest(1, g.ng - {_WIN_W - 1})
    ), sel AS (
        SELECT doc_id, s, min(k) AS mk FROM wins GROUP BY doc_id, s
    ), fps AS (
        SELECT DISTINCT doc_id, substr(mk, 1, 10) AS fp FROM sel
    ), fpdf AS (
        SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {_WIN_DF_CAP}
    ), kept AS (
        SELECT f.doc_id, f.fp FROM fps f JOIN fpdf d ON d.fp = f.fp
    ), nfp AS (
        SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id
    ), pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS shared
        FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ), ranked AS (
        SELECT p.doc_a, p.doc_b, p.shared AS shared_fps,
               CAST(na.n AS BIGINT) AS fp_a, CAST(nb.n AS BIGINT) AS fp_b,
               row_number() OVER (
                   ORDER BY p.shared DESC, p.doc_a ASC, p.doc_b ASC
               ) AS rank
        FROM pairs p
        JOIN nfp na ON na.doc_id = p.doc_a
        JOIN nfp nb ON nb.doc_id = p.doc_b
        WHERE p.shared >= 2
    )
    SELECT CAST(rank AS INTEGER) AS rank, doc_a, doc_b, shared_fps,
           fp_a, fp_b
    FROM ranked WHERE rank <= {_WIN_TOPK}
    ORDER BY rank
"""


@register(
    "text_winnowing_fingerprints",
    oracle=_WINNOW_ORACLE,
    tags=("text", "dedup", "llm"),
    doc="Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the "
    "MOSS algorithm): hash every 3-token k-gram, slide a 4-gram window "
    "and keep each window's minimum hash (rightmost on ties via a "
    "position-descending composite key), giving the guarantee that any "
    "shared run of >= k+w-1 = 6 tokens shares at least one selected "
    "fingerprint at ~2/(w+1) storage density — the local-sampling "
    "upgrade over fixed-stride doc_fingerprint. Shared-fingerprint doc "
    "pairs (df-capped postings, >= 2 shared) rank a top-20 overlap "
    "report. Plan: the window-min is ONE groupBy(doc, window_start) "
    "over a w-way explode (no window-in-window), the pair join is the "
    "inverted index on fingerprint with the standard stop-fingerprint "
    "df cap bounding posting lists, and the final ranking sorts only "
    "the surviving pair relation.",
)
def text_winnowing_fingerprints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The composite key hex10||lpad(9999999-gpos) makes min(key) pick
    (min hash, rightmost position) in one aggregate — both engines
    compare the pure-ASCII key bytewise. Positions are re-numbered
    contiguously after the empty-token filter so gram adjacency is
    split-convention-independent."""
    docs = load_table(spark, sf_dir, "documents")
    wpos = Window.partitionBy("doc_id").orderBy("pos")
    toks = (
        docs.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
        )
        .filter(F.col("tok") != "")
        .withColumn("gpos", F.row_number().over(wpos))
        .drop("pos")
    )
    wg = Window.partitionBy("doc_id").orderBy("gpos")
    grams = (
        toks.select(
            "doc_id",
            "gpos",
            # concat (not concat_ws): NULL leads must propagate so the
            # trailing k-1 positions drop, matching the oracle.
            F.concat(
                F.col("tok"),
                F.lit(" "),
                F.lead("tok", 1).over(wg),
                F.lit(" "),
                F.lead("tok", 2).over(wg),
            ).alias("g"),
        )
        .filter(F.col("g").isNotNull())
        .localCheckpoint(eager=False)
    )
    gstats = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("ng"))
    keyed = grams.select(
        "doc_id",
        "gpos",
        F.concat(
            F.substring(F.md5("g"), 1, 10),
            F.lpad((F.lit(9999999) - F.col("gpos")).cast("string"), 7, "0"),
        ).alias("k"),
    )
    wins = (
        keyed.join(gstats, "doc_id")
        .select(
            "doc_id",
            "ng",
            "k",
            "gpos",
            F.explode(F.sequence(F.lit(0), F.lit(_WIN_W - 1))).alias("d"),
        )
        .select(
            "doc_id", "ng", "k", (F.col("gpos") - F.col("d")).alias("s")
        )
        .filter(
            (F.col("s") >= 1)
            & (F.col("s") <= F.greatest(F.lit(1), F.col("ng") - (_WIN_W - 1)))
        )
    )
    sel = wins.groupBy("doc_id", "s").agg(F.min("k").alias("mk"))
    fps = sel.select(
        "doc_id", F.substring("mk", 1, 10).alias("fp")
    ).distinct()
    fpdf = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _WIN_DF_CAP)
        .select("fp")
    )
    kept = fps.join(fpdf, "fp").localCheckpoint(eager=False)
    nfp = kept.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = kept.select(F.col("doc_id").alias("doc_a"), "fp")
    b = kept.select(F.col("doc_id").alias("doc_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= 2)
    )
    top = (
        pairs.join(
            nfp.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("fp_a")),
            "doc_a",
        )
        .join(
            nfp.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("fp_b")),
            "doc_b",
        )
        .orderBy(F.col("shared_fps").desc(), "doc_a", "doc_b")
        .limit(_WIN_TOPK)
    )
    # `top` is already .limit(_WIN_TOPK)-bounded, so this global window
    # ranks at most TOPK rows — the cheap TakeOrderedAndProject + tiny
    # re-rank shape, not a data-sized single-task window
    wrank = Window.orderBy(F.col("shared_fps").desc(), "doc_a", "doc_b")
    return (
        top.withColumn("rank", F.row_number().over(wrank))
        .select(
            "rank",
            "doc_a",
            "doc_b",
            "shared_fps",
            F.col("fp_a").cast("long").alias("fp_a"),
            F.col("fp_b").cast("long").alias("fp_b"),
        )
        .orderBy("rank")
    )


# --- Heaps' law vocabulary-growth fit --------------------------------------

_HEAPS_ORACLE = """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ), toks2 AS (
        SELECT doc_id, tok FROM toks WHERE tok <> ''
    ), per_doc AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS nt
        FROM toks2 GROUP BY doc_id
    ), first_occ AS (
        SELECT tok, min(doc_id) AS fdoc FROM toks2 GROUP BY tok
    ), new_types AS (
        SELECT fdoc AS doc_id, CAST(count(*) AS BIGINT) AS nv
        FROM first_occ GROUP BY fdoc
    ), curve AS (
        SELECT p.doc_id,
               sum(p.nt) OVER w AS cumtok,
               sum(COALESCE(n.nv, 0)) OVER w AS cumvocab
        FROM per_doc p LEFT JOIN new_types n USING (doc_id)
        WINDOW w AS (ORDER BY p.doc_id ROWS UNBOUNDED PRECEDING)
    ), pts AS (
        SELECT CAST(length(bin(cumtok)) - 1 AS BIGINT) AS x,
               CAST(length(bin(cumvocab)) - 1 AS BIGINT) AS y
        FROM curve
    ), m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM pts
    )
    SELECT n AS n_docs,
           CAST((SELECT max(cumtok) FROM curve) AS BIGINT) AS total_tokens,
           CAST((SELECT max(cumvocab) FROM curve) AS BIGINT) AS vocab_size,
           (CASE WHEN n * sxy - sx * sy >= 0 THEN 1 ELSE -1 END)
               * (abs(n * sxy - sx * sy) * 1000 // (n * sxx - sx * sx))
               AS heaps_beta_milli,
           n * sxx - sx * sx > 0 AS fit_defined
    FROM m
"""


@register(
    "text_heaps_law_fit",
    oracle=_HEAPS_ORACLE,
    tags=("text", "llm", "stats"),
    doc="Heaps'-law vocabulary-growth fit, the companion diagnostic to "
    "text_zipf_fit: V(n) ~ K * n^beta, with beta estimated as the "
    "least-squares slope of log2(cumulative vocab) vs log2(cumulative "
    "tokens) sampled at each document boundary in doc_id order — "
    "natural corpora fit beta ~ 0.4-0.6; a corpus whose vocabulary "
    "growth flatlines early (like this synthetic fixture's closed "
    "vocab) is template/boilerplate-heavy, and one that grows "
    "linearly is noise/ID-heavy — both upstream-pipeline signals. "
    "Both cumulative curves are DISTRIBUTED prefix sums over the "
    "per-doc rollup (global_running_sum: range exchange + broadcast "
    "offsets, no single-task window); the first-occurrence relation "
    "is one min-aggregate per token; logs are exact bitlen integers "
    "and the slope is the house sign-extracted scaled quotient.",
)
def text_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dynamodb_stream_processor_2_0_spark.operators.ranking import (
        global_running_sum,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("nt")
    )
    new_types = (
        toks.groupBy("tok")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("nv"))
    )
    base = per_doc.join(new_types, "doc_id", "left").withColumn(
        "nv", F.coalesce("nv", F.lit(0).cast("long"))
    )
    curve = global_running_sum(
        global_running_sum(base, ["doc_id"], "nt", "cumtok"),
        ["doc_id"],
        "nv",
        "cumvocab",
    )
    pts = curve.select(
        "cumtok",
        "cumvocab",
        (F.length(F.bin("cumtok")) - 1).cast("long").alias("x"),
        (F.length(F.bin("cumvocab")) - 1).cast("long").alias("y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max("cumtok").alias("total_tokens"),
        F.max("cumvocab").alias("vocab_size"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    return m.select(
        F.col("n").alias("n_docs"),
        "total_tokens",
        "vocab_size",
        F.expr(
            "CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE"
            " (CASE WHEN n * sxy - sx * sy >= 0 THEN 1 ELSE -1 END)"
            " * (abs(n * sxy - sx * sy) * 1000 div (n * sxx - sx * sx)) END"
        )
        .cast("long")
        .alias("heaps_beta_milli"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0).alias(
            "fit_defined"
        ),
    )


# --- cross-source quantile normalization -----------------------------------

_QNORM_ORACLE = """
    WITH scored AS (
        SELECT doc_id, source, CAST(n_chars AS BIGINT) AS score
        FROM documents
    ), per_src AS (
        SELECT doc_id, source, score,
               CAST(row_number() OVER (PARTITION BY source
                    ORDER BY score ASC, doc_id ASC) AS BIGINT) AS r,
               CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS ns
        FROM scored
    ), gref AS (
        SELECT score AS gval,
               CAST(row_number() OVER (ORDER BY score ASC, doc_id ASC)
                    AS BIGINT) AS g
        FROM scored
    ), mapped AS (
        SELECT p.source, p.score,
               (SELECT CAST(count(*) AS BIGINT) FROM scored) AS n_total,
               g2.gval AS norm
        FROM per_src p
        JOIN gref g2
          ON g2.g = (p.r - 1)
                    * (SELECT CAST(count(*) AS BIGINT) FROM scored)
                    // p.ns + 1
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(score) AS BIGINT) AS raw_sum,
           CAST(sum(norm) AS BIGINT) AS norm_sum,
           CAST(min(norm) AS BIGINT) AS norm_min,
           CAST(max(norm) AS BIGINT) AS norm_max
    FROM mapped GROUP BY source ORDER BY source
"""


@register(
    "text_quantile_normalize_sources",
    oracle=_QNORM_ORACLE,
    tags=("text", "llm", "stats"),
    doc="Cross-source quantile normalization (the microarray-heritage "
    "technique LLM pipelines use to make quality scores from "
    "different raters/classifiers comparable before mixing): each "
    "doc's score is replaced by the GLOBAL score at the same "
    "quantile position — rank r of n_s in its source maps to global "
    "sorted index (r-1)*N div n_s + 1 — so every source's "
    "normalized distribution is a subsample of the one reference "
    "distribution (norm_sum nearly equal across equal-sized "
    "sources = the calibration worked; raw_sum spread shows the "
    "pre-normalization bias). Exact integer ranks both sides, "
    "doc_id tiebreaks everywhere. Plan: per-source ranks are "
    "partitioned windows; the reference distribution is the "
    "distributed global_rank; the mapping join is an equi-join on "
    "the computed index — no quadratic quantile lookup.",
)
def text_quantile_normalize_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from dynamodb_stream_processor_2_0_spark.operators.ranking import (
        global_rank,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("score")
    ).localCheckpoint(eager=False)
    wsrc = Window.partitionBy("source").orderBy("score", "doc_id")
    per_src = scored.withColumn(
        "r", F.row_number().over(wsrc).cast("long")
    ).withColumn(
        "ns",
        F.count(F.lit(1)).over(Window.partitionBy("source")).cast("long"),
    )
    glob = global_rank(scored, ["score", "doc_id"], "g").select(
        F.col("g"), F.col("score").alias("gval")
    )
    n_total = F.broadcast(
        scored.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    )
    mapped = (
        per_src.crossJoin(n_total)
        .withColumn("g", F.expr("(r - 1) * n_total div ns + 1"))
        .join(glob, "g")
    )
    return (
        mapped.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("score").cast("long").alias("raw_sum"),
            F.sum("gval").cast("long").alias("norm_sum"),
            F.min("gval").cast("long").alias("norm_min"),
            F.max("gval").cast("long").alias("norm_max"),
        )
        .orderBy("source")
    )


# --- Chao1 vocabulary richness + Good-Turing coverage ------------------------
#
# The capture-recapture companion to text_heaps_law_fit: Heaps
# extrapolates the vocabulary GROWTH CURVE, Chao1 estimates the
# asymptotic vocabulary SIZE from the frequency-of-frequencies alone
# (f1 singletons, f2 doubletons): chao1 = V + f1*(f1-1)/(2*(f2+1)),
# the bias-corrected form that stays finite when f2 = 0. Good-Turing
# gives the unseen-token mass P0 = f1/N — the probability the NEXT
# token sampled is a new type — whose complement is corpus coverage.
# Both are corpus-curation signals: low coverage means the corpus is
# still vocabulary-open (keep crawling); chao1 >> V means a long tail
# the tokenizer will fragment.

_CHAO1_ORACLE = """
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ), freq AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS c
        FROM toks WHERE tok <> '' GROUP BY tok
    )
    SELECT CAST(count(*) AS BIGINT) AS vocab_size,
           CAST(sum(c) AS BIGINT) AS total_tokens,
           CAST(count(*) FILTER (c = 1) AS BIGINT) AS f1_singletons,
           CAST(count(*) FILTER (c = 2) AS BIGINT) AS f2_doubletons,
           CAST(count(*)
                + count(*) FILTER (c = 1)
                  * (count(*) FILTER (c = 1) - 1)
                  // (2 * (count(*) FILTER (c = 2) + 1))
                AS BIGINT) AS chao1_estimate,
           CAST(1000 * count(*) FILTER (c = 1) // sum(c) AS BIGINT)
               AS unseen_mass_permille,
           CAST(1000 - 1000 * count(*) FILTER (c = 1) // sum(c)
                AS BIGINT) AS coverage_permille
    FROM freq
"""


@register(
    "text_chao1_vocab_richness",
    oracle=_CHAO1_ORACLE,
    tags=("text", "llm", "stats"),
    doc="Chao1 asymptotic vocabulary-size estimate + Good-Turing "
    "unseen-mass coverage from the frequency-of-frequencies: chao1 = "
    "V + f1*(f1-1)/(2*(f2+1)) (bias-corrected, finite at f2=0) and "
    "P0 = f1/N in permille. The capture-recapture complement to "
    "text_heaps_law_fit: Heaps fits the growth curve, Chao1 bounds "
    "where it plateaus — 'is the corpus vocabulary-closed yet' is a "
    "crawl-scheduling signal, and chao1 >> V flags a long tail the "
    "tokenizer will fragment into bytes. Whitespace tokenization "
    "matches the house text family. ONE token-frequency groupBy "
    "(map-side combinable) then a single global aggregate over the "
    "frequency relation — all divisions are truncating over "
    "non-negative integers, identical in both engines.",
)
def text_chao1_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return freq.agg(
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.sum("c").cast("long").alias("total_tokens"),
        F.expr("CAST(count_if(c = 1) AS BIGINT)").alias("f1_singletons"),
        F.expr("CAST(count_if(c = 2) AS BIGINT)").alias("f2_doubletons"),
        F.expr(
            "CAST(count(1) + count_if(c = 1) * (count_if(c = 1) - 1)"
            " div (2 * (count_if(c = 2) + 1)) AS BIGINT)"
        ).alias("chao1_estimate"),
        F.expr("CAST(1000 * count_if(c = 1) div sum(c) AS BIGINT)").alias(
            "unseen_mass_permille"
        ),
        F.expr(
            "CAST(1000 - 1000 * count_if(c = 1) div sum(c) AS BIGINT)"
        ).alias("coverage_permille"),
    )


# --- Jensen-Shannon source-vs-rest divergence --------------------------------
#
# Which shard is distributionally ANOMALOUS: for every source s, the
# Jensen-Shannon divergence between its unigram distribution P and the
# rest-of-corpus distribution Q — JSD = H(M) - (H(P)+H(Q))/2 with
# M = (P+Q)/2 — the symmetric, bounded (<= 1 bit) drift score used to
# audit corpus mixes before training. All probability ratios are kept
# as exact integer fractions over the common denominator 2*Np*Nq
# (m_i = (c_i*Nq + r_i*Np) / 2NpNq) and every log2 is the house exact
# bitlen floor, so both engines produce identical millibits; the
# floor-log estimator biases each entropy DOWN by < 1 bit uniformly
# and JSD is their difference, so the ORDERING across sources — the
# thing the audit consumes — is preserved.

_JSD_ORACLE = """
    WITH toks AS (
        SELECT source, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ), counts AS (
        SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        FROM toks WHERE tok <> '' GROUP BY source, tok
    ), tok_tot AS (
        SELECT tok, CAST(sum(c) AS BIGINT) AS t FROM counts GROUP BY tok
    ), src_tot AS (
        SELECT source, CAST(sum(c) AS BIGINT) AS np FROM counts
        GROUP BY source
    ), n_all AS (
        SELECT CAST(sum(c) AS BIGINT) AS nt FROM counts
    ), grid AS (
        SELECT s.source, s.np, (SELECT nt FROM n_all) - s.np AS nq,
               tt.tok, tt.t,
               COALESCE(c.c, 0) AS cp,
               tt.t - COALESCE(c.c, 0) AS cq
        FROM src_tot s
        CROSS JOIN tok_tot tt
        LEFT JOIN counts c ON c.source = s.source AND c.tok = tt.tok
    ), terms AS (
        SELECT source, np, nq,
               cp * nq + cq * np AS cm,
               CASE WHEN cp > 0
                    THEN CAST(cp AS HUGEINT) * 1000
                         * (length(bin(np // cp)) - 1)
                    ELSE CAST(0 AS HUGEINT) END AS hp_term,
               CASE WHEN cq > 0
                    THEN CAST(cq AS HUGEINT) * 1000
                         * (length(bin(nq // cq)) - 1)
                    ELSE CAST(0 AS HUGEINT) END AS hq_term
        FROM grid
    ), ent AS (
        SELECT source, np, nq,
               CAST(sum(hp_term) // np AS BIGINT) AS h_p_millibits,
               CAST(sum(hq_term) // nq AS BIGINT) AS h_q_millibits,
               CAST(sum(CASE WHEN cm > 0
                             THEN CAST(cm AS HUGEINT) * 1000
                                  * (length(bin((2 * CAST(np AS HUGEINT)
                                                 * nq) // cm)) - 1)
                             ELSE CAST(0 AS HUGEINT) END)
                    // (2 * CAST(np AS HUGEINT) * nq) AS BIGINT)
                   AS h_m_millibits
        FROM terms
        GROUP BY source, np, nq
    )
    SELECT source, np AS n_tokens_src, nq AS n_tokens_rest,
           h_p_millibits, h_q_millibits, h_m_millibits,
           h_m_millibits - (h_p_millibits + h_q_millibits) // 2
               AS jsd_millibits
    FROM ent
    ORDER BY source
"""


@register(
    "text_js_divergence_sources",
    oracle=_JSD_ORACLE,
    tags=("text", "llm", "stats", "quality"),
    doc="Jensen-Shannon divergence of every source's unigram "
    "distribution against the rest of the corpus — the symmetric, "
    "bounded drift score for auditing a corpus mix before training "
    "(an anomalous shard shows a JSD far above its peers; cf. "
    "events_psi_drift for the time axis). Mixture probabilities stay "
    "exact integer fractions over the common denominator 2*Np*Nq "
    "and all logs are the house bitlen floor-log2, so the millibit "
    "outputs are bit-identical across engines and the cross-source "
    "ORDERING the audit consumes is exact. Shuffle shape: one "
    "(source,tok) count, one tok-total rollup, then a vocab x "
    "sources grid built by broadcasting the TINY source-totals "
    "relation onto the token totals with a left join back to the "
    "counts — O(V*S) rows, linear in vocabulary, corpus never "
    "re-scanned.",
)
def text_js_divergence_sources(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tok_tot = counts.groupBy("tok").agg(F.sum("c").cast("long").alias("t"))
    src_tot = counts.groupBy("source").agg(
        F.sum("c").cast("long").alias("np")
    )
    n_all = counts.agg(F.sum("c").cast("long").alias("nt"))
    grid = (
        tok_tot.crossJoin(
            F.broadcast(src_tot.crossJoin(F.broadcast(n_all)))
        )
        .join(counts, ["source", "tok"], "left")
        .select(
            "source",
            "np",
            (F.col("nt") - F.col("np")).alias("nq"),
            "tok",
            "t",
            F.coalesce("c", F.lit(0).cast("long")).alias("cp"),
            (F.col("t") - F.coalesce("c", F.lit(0).cast("long"))).alias(
                "cq"
            ),
        )
    )
    terms = grid.select(
        "source",
        "np",
        "nq",
        (F.col("cp") * F.col("nq") + F.col("cq") * F.col("np")).alias("cm"),
        F.expr(
            "CASE WHEN cp > 0 THEN CAST(cp AS DECIMAL(38,0)) * 1000"
            " * (length(bin(np div cp)) - 1)"
            " ELSE CAST(0 AS DECIMAL(38,0)) END"
        ).alias("hp_term"),
        F.expr(
            "CASE WHEN cq > 0 THEN CAST(cq AS DECIMAL(38,0)) * 1000"
            " * (length(bin(nq div cq)) - 1)"
            " ELSE CAST(0 AS DECIMAL(38,0)) END"
        ).alias("hq_term"),
    )
    # nq = 0 guard: a single-source corpus has an empty "rest" side, so
    # H(Q) and H(M) are undefined — NULL like the oracle's `//`, not an
    # ANSI div-by-zero job kill (tools/hostile_sweep.py degenerate world)
    ent = terms.groupBy("source", "np", "nq").agg(
        F.expr("CAST(sum(hp_term) div np AS BIGINT)").alias(
            "h_p_millibits"
        ),
        F.expr(
            "CAST(CASE WHEN nq = 0 THEN NULL"
            " ELSE sum(hq_term) div nq END AS BIGINT)"
        ).alias("h_q_millibits"),
        F.expr(
            "CAST(CASE WHEN nq = 0 THEN NULL ELSE"
            " sum(CASE WHEN cm > 0"
            " THEN CAST(cm AS DECIMAL(38,0)) * 1000"
            "      * (length(bin((2 * CAST(np AS DECIMAL(38,0)) * nq)"
            "         div cm)) - 1)"
            " ELSE CAST(0 AS DECIMAL(38,0)) END)"
            " div (2 * CAST(np AS DECIMAL(38,0)) * nq) END AS BIGINT)"
        ).alias("h_m_millibits"),
    )
    return ent.select(
        "source",
        F.col("np").alias("n_tokens_src"),
        F.col("nq").alias("n_tokens_rest"),
        "h_p_millibits",
        "h_q_millibits",
        "h_m_millibits",
        F.expr(
            "h_m_millibits - (h_p_millibits + h_q_millibits) div 2"
        ).alias("jsd_millibits"),
    ).orderBy("source")
