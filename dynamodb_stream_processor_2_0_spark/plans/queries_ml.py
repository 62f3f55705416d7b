"""Round-6 ML-primitive extensions: distributed model TRAINING
(closed-form OLS via sufficient statistics), model APPLY (feature-hashed
linear scorer over a broadcast weight table), and model EVAL
(calibration curve + expected calibration error).

These close the train/apply/evaluate loop around the quality-filter
operators the LLM-pipeline families already provide: `quality_
classifier_score` and `text_dsir_importance` are fixed scoring rules;
this module adds the shapes a pipeline uses to FIT such a rule (one
Gram-matrix aggregation), to SERVE a learned one (hashing-trick
featurize + broadcast-join the weight vector), and to JUDGE one
(reliability diagram / ECE), each as a pure DataFrame plan.

Reference analog: the reference consumes upstream model outputs as
opaque scores (overall_score / profile_quality, index.js:371-372) and
routes on thresholds (index.js:563); producing and auditing those
scores at corpus scale is part of the engine-surface extension mandated
by the driver north star (SURVEY.md §2.7), like the ANN and dedup
families.

Arithmetic discipline (house rules): every statistic lives on an exact
integer grid — cents / permille inputs, wide-int (DECIMAL(38,0) /
HUGEINT) Gram products, a
shared digit-drop quantization (the decimal cousin of the assortativity
bit-shift) before determinant products so Cramer's rule stays inside
128 bits at any row count, and every division is a sign-extracted
truncating `div` so Spark (trunc) and DuckDB (floor) agree on negatives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dynamodb_stream_processor_2_0_spark.plans.registry import register
from dynamodb_stream_processor_2_0_spark.sources.catalog import load_table

# --- closed-form OLS via sufficient statistics -----------------------------
#
# Per l_returnflag, fit  y = b0 + b1*x1 + b2*x2  with
#   y  = extendedprice in cents,  x1 = quantity,  x2 = discount permille
# by the centered normal equations: with
#   c11 = n*Sx1x1 - Sx1^2      c12 = n*Sx1x2 - Sx1*Sx2
#   c22 = n*Sx2x2 - Sx2^2      c1y = n*Sx1y  - Sx1*Sy
#   c2y = n*Sx2y  - Sx2*Sy
#   b1 = (c1y*c22 - c2y*c12) / (c11*c22 - c12^2)
#   b2 = (c2y*c11 - c1y*c12) / (c11*c22 - c12^2)
#   b0 = (Sy - b1*Sx1 - b2*Sx2) / n
# All five c-moments are exact 128-bit integers; before the pairwise
# determinant products each is quantized by a SHARED power-of-ten drop
# (k = max(0, maxdigits - 16)) so products stay < 1e32 (*1000 milli
# grid < 1e35) at ANY n — the ratio is quantization-invariant up to the
# documented truncation, and k = 0 (bit-exact Cramer) through ~1e7 rows
# per group. On the driver's synthetic lineitem, extendedprice is drawn
# independently of quantity and discount, so the fit is a null-signal
# audit (b1, b2 tiny vs the price scale, b0 ~ mean); on true TPC-H
# (extendedprice = qty * retail price) b1 recovers mean unit price.
#
# Scale: ONE map-side-combinable groupBy aggregation (9 sums), O(groups)
# rows out, closed-form solve in the projection — the sufficient-
# statistics shape a distributed linear-probe trainer uses; no
# iteration, no UDF, no second pass. BIGINT raw-sum headroom: the
# largest sum (Sx2y <= n * 1e9) stays inside int64 to n ~ 9e9 rows per
# group (~1.5 TB of lineitem); past that, sum y in dollars or
# accumulate the sums themselves as DECIMAL — the plan is unchanged.

_OLS_STATS = """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x1) AS BIGINT) AS s1,
           CAST(sum(x2) AS BIGINT) AS s2,
           CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x1 * x1) AS BIGINT) AS s11,
           CAST(sum(x1 * x2) AS BIGINT) AS s12,
           CAST(sum(x2 * x2) AS BIGINT) AS s22,
           CAST(sum(x1 * y) AS BIGINT) AS s1y,
           CAST(sum(x2 * y) AS BIGINT) AS s2y
    FROM grid GROUP BY l_returnflag
"""

# Centered second moments, exact wide-ints from the BIGINT sums.
_OLS_CMOM = """
    SELECT l_returnflag, n, s1, s2, sy,
           CAST(n AS {big}) * s11 - CAST(s1 AS {big}) * s1
               AS c11,
           CAST(n AS {big}) * s12 - CAST(s1 AS {big}) * s2
               AS c12,
           CAST(n AS {big}) * s22 - CAST(s2 AS {big}) * s2
               AS c22,
           CAST(n AS {big}) * s1y - CAST(s1 AS {big}) * sy
               AS c1y,
           CAST(n AS {big}) * s2y - CAST(s2 AS {big}) * sy
               AS c2y
    FROM stats
"""

# Shared digit-drop: k = max(0, digits(max |c|) - 16); ten_k = 10^k as
# an exact decimal built by string repetition (float pow would break
# bit-exactness). Quantized entries are sign-extracted truncations.
_OLS_QUANT = """
    SELECT l_returnflag, n, s1, s2, sy, k,
           {q_c11} AS c11q, {q_c12} AS c12q, {q_c22} AS c22q,
           {q_c1y} AS c1yq, {q_c2y} AS c2yq
    FROM (
        SELECT *, CAST(concat('1', repeat('0', CAST(k AS INT)))
                       AS {big}) AS ten_k
        FROM (
            SELECT *,
                   greatest(0, length(CAST(greatest(abs(c11), abs(c12),
                            abs(c22), abs(c1y), abs(c2y)) AS STRING))
                            - 16) AS k
            FROM cmom
        ) t
    ) s
"""


def _q(col: str, fdiv: str, big: str) -> str:
    """Sign-extracted quantization: sign(c) * (|c| div 10^k), re-widened
    to the engine's exact wide-integer type (Spark's decimal `div`
    returns BIGINT, whose pairwise products would overflow int64)."""
    return (
        f"CAST((CASE WHEN {col} < 0 THEN -1 ELSE 1 END)"
        f" * (abs({col}) {fdiv} ten_k) AS {big})"
    )


# Cramer on the quantized 2x2 system + exact back-substitution for b0.
# b0 numerator in DECIMAL so 1000*Sy survives any n.
_OLS_SOLVE = """
    SELECT l_returnflag,
           n AS n_rows,
           CAST(k AS BIGINT) AS digits_dropped,
           CAST(sy {fdiv} n AS BIGINT) AS mean_price_cents,
           CAST(CASE WHEN det = 0 THEN NULL ELSE
                (CASE WHEN (num1 < 0) != (det < 0) THEN -1 ELSE 1 END)
                * ((abs(num1) * 1000) {fdiv} abs(det)) END AS BIGINT)
               AS b1_cents_per_qty_milli,
           CAST(CASE WHEN det = 0 THEN NULL ELSE
                (CASE WHEN (num2 < 0) != (det < 0) THEN -1 ELSE 1 END)
                * ((abs(num2) * 1000) {fdiv} abs(det)) END AS BIGINT)
               AS b2_cents_per_permille_milli
    FROM (
        SELECT *,
               c11q * c22q - c12q * c12q AS det,
               c1yq * c22q - c2yq * c12q AS num1,
               c2yq * c11q - c1yq * c12q AS num2
        FROM quant
    ) d
"""

_OLS_B0 = """
    SELECT l_returnflag, n_rows, digits_dropped, mean_price_cents,
           b1_cents_per_qty_milli, b2_cents_per_permille_milli,
           CAST((CASE WHEN (b0n < 0) THEN -1 ELSE 1 END)
                * (abs(b0n) {fdiv} n_rows) AS BIGINT) AS b0_cents_milli
    FROM (
        SELECT s.*,
               CAST(1000 AS {big}) * sy
                   - CAST(b1_cents_per_qty_milli AS {big}) * s1
                   - CAST(b2_cents_per_permille_milli AS {big}) * s2
                   AS b0n
        FROM solved s JOIN raw USING (l_returnflag)
    ) z
    ORDER BY l_returnflag
"""

_OLS_GRID = """
    SELECT l_returnflag,
           CAST(l_quantity AS BIGINT) AS x1,
           CAST(round(l_discount * 1000) AS BIGINT) AS x2,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS y
    FROM lineitem
"""


def _ols_body(fdiv: str, big: str) -> str:
    """The shared CTE chain; per-engine wide-int type and int division
    (Spark: DECIMAL(38,0) + `div`; DuckDB: HUGEINT + `//` — DuckDB's
    `//` on DECIMAL detours through DOUBLE and loses exactness, while
    HUGEINT (int128) divides exactly; both types hold the documented
    < 1e35 headroom)."""
    return f"""
        stats AS ({_OLS_STATS}),
        raw AS (SELECT l_returnflag, s1, s2, sy FROM stats),
        cmom AS ({_OLS_CMOM.format(big=big)}),
        quant AS ({_OLS_QUANT.format(
            big=big,
            q_c11=_q('c11', fdiv, big), q_c12=_q('c12', fdiv, big),
            q_c22=_q('c22', fdiv, big), q_c1y=_q('c1y', fdiv, big),
            q_c2y=_q('c2y', fdiv, big))}),
        solved AS ({_OLS_SOLVE.format(fdiv=fdiv)})
        {_OLS_B0.format(fdiv=fdiv, big=big)}
    """


def _ols_oracle_sql() -> str:
    return f"""
        WITH grid AS ({_OLS_GRID}),
        {_ols_body('//', 'HUGEINT')}
    """


@register(
    "ml_ols_regression_closed_form",
    oracle=_ols_oracle_sql(),
    tags=("ml", "stats", "scale"),
    doc="Distributed multiple linear regression by closed-form normal "
    "equations: per returnflag, fit extendedprice_cents ~ quantity + "
    "discount_permille from ONE map-side-combinable aggregation of the "
    "nine sufficient statistics (the Gram matrix X'X and X'y), then "
    "solve the centered 2x2 system by Cramer's rule inside the "
    "projection — the linear-probe / feature-regression training shape "
    "at 100 TB: no iteration, no UDF, no driver round-trip, O(groups) "
    "output. Exactness: cents/permille integer grids, 128-bit "
    "centered moments, a shared power-of-ten digit-drop (k = 0, i.e. "
    "bit-exact Cramer, through ~1e7 rows/group; quantization identical "
    "in both engines above that) and sign-extracted truncating "
    "divisions throughout. On this driver-generated data the fit is a "
    "null-signal audit: extendedprice is drawn independently of "
    "quantity and discount (corr ~ 0.008 / 0.002, measured), and the "
    "regression honestly reports it — |b1|, |b2| land 3 orders of "
    "magnitude under the ~5e6-cent mean and b0 ~ mean price; on true "
    "TPC-H (extendedprice = qty * retail price) the same plan recovers "
    "the mean unit price in b1.",
)
def ml_ols_regression_closed_form(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    grid = li.selectExpr(
        "l_returnflag",
        "CAST(l_quantity AS BIGINT) AS x1",
        "CAST(round(l_discount * 1000) AS BIGINT) AS x2",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS y",
    )
    grid.createOrReplaceTempView("ml_ols_grid")
    # The chain is pure SQL over one temp view: Catalyst sees a single
    # plan (scan -> partial agg -> final agg -> projection), identical
    # to the oracle text modulo the wide-int type / div spelling.
    return spark.sql(
        f"""
        WITH grid AS (SELECT * FROM ml_ols_grid),
        {_ols_body('div', 'DECIMAL(38,0)')}
        """
    )

# --- feature-hashed linear scorer (model APPLY) ----------------------------
#
# The hashing-trick serving path (Weinberger et al., fasttext-style):
# featurize each token to one of 256 buckets via the house md5 idiom
# (vocabulary-free, so OOV tokens are impossible by construction),
# broadcast-join the weight vector — THE MODEL — onto the token stream,
# and reduce to one margin per document. Weights here are a
# deterministic surrogate (centered pseudo-random ints derived from the
# bucket id by a Knuth-multiplier residue); a learned vector drops in
# without changing the plan. Two shuffles total: (doc_id) margin rollup
# and (source, verdict) report; the weight join is broadcast, and at a
# production 2^22 buckets the table is still only a few MB.

_HASH_BUCKETS = 256
# Knuth multiplicative hash residue, centered: w in [-1001, 1001].
_WEIGHTS_RULE = "((b + 1) * 2654435761) % 2003 - 1001"


def _scorer_sql(
    tok_hash: str, fdiv: str, weights_src: str, exploded_cte: str
) -> str:
    return f"""
        WITH {exploded_cte}, toks AS (
            SELECT doc_id, source, tok
            FROM exploded
            WHERE tok <> ''
        ), weights AS (
            SELECT b AS bucket, CAST({_WEIGHTS_RULE} AS BIGINT) AS w
            FROM {weights_src}
        ), scored AS (
            SELECT t.doc_id, t.source,
                   CAST(sum(w.w) AS BIGINT) AS score,
                   CAST(count(*) AS BIGINT) AS dl
            FROM (SELECT doc_id, source, {tok_hash} % {_HASH_BUCKETS}
                         AS bucket
                  FROM toks) t
            JOIN weights w ON w.bucket = t.bucket
            GROUP BY t.doc_id, t.source
        ), margins AS (
            SELECT doc_id, source,
                   (CASE WHEN score < 0 THEN -1 ELSE 1 END)
                       * ((abs(score) * 1000) {fdiv} dl)
                       AS margin_per_kilotoken
            FROM scored
        )
        SELECT source,
               margin_per_kilotoken >= 0 AS kept,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST((CASE WHEN sum(margin_per_kilotoken) < 0 THEN -1
                     ELSE 1 END)
                    * (abs(CAST(sum(margin_per_kilotoken) AS BIGINT))
                       {fdiv} count(*)) AS BIGINT) AS mean_margin_milli
        FROM margins
        GROUP BY source, kept
        ORDER BY source, kept
    """


@register(
    "ml_hashed_linear_scorer",
    oracle=_scorer_sql(
        "CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT)",
        "//",
        "range(256) t(b)",
        "exploded AS (SELECT doc_id, source,"
        " unnest(string_split(text, ' ')) AS tok FROM documents)",
    ),
    tags=("ml", "llm", "text"),
    doc="Feature-hashed linear classifier serving (the hashing trick): "
    "tokens hash to 256 buckets via the house md5 idiom — vocabulary-"
    "free featurization, so serving never sees an OOV — and a "
    "broadcast weight table (the model; deterministic centered "
    "Knuth-residue surrogate weights, swapped for learned ones without "
    "touching the plan) joins onto the exploded token stream; one "
    "(doc_id) rollup yields the per-doc margin, normalized per "
    "kilotoken by a sign-extracted truncating division, and a "
    "(source, verdict) report closes it out. This is the fasttext-"
    "style quality-filter APPLY shape at 100 TB: broadcast join (no "
    "shuffle on the model side), two row shuffles, cost linear in "
    "corpus tokens; a 2^22-bucket production model is still a "
    "few-MB broadcast.",
)
def ml_hashed_linear_scorer(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("tok")
    ).createOrReplaceTempView("ml_scorer_exploded")
    spark.range(_HASH_BUCKETS).selectExpr(
        "id AS b"
    ).createOrReplaceTempView("ml_scorer_buckets")
    return spark.sql(
        _scorer_sql(
            "CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT)",
            "div",
            "ml_scorer_buckets",
            "exploded AS (SELECT * FROM ml_scorer_exploded)",
        )
    )


# --- calibration curve + expected calibration error (model EVAL) -----------
#
# Reliability diagram for a ranking score, distributed: the score under
# audit is the en-stopword rate (the text_langid_heuristic signal), the
# target is lang = 'en', confidence is the score's own global rank
# percentile (the uniformly-calibrated baseline a ranker implies), and
# the curve buckets the corpus into 10 equal-count rank bins — computed
# with the no-single-task global_rank primitive, NOT an ntile window
# (which would sort the corpus in one task). ECE = sum_b n_b *
# |acc_b - conf_b| / N rides along as a broadcast 1-row aggregate.

_CALIB_BINS = 10
_CALIB_STOPS = "'the', 'a', 'of', 'and', 'to'"


def _calib_report_sql(fdiv: str) -> str:
    """CTE continuation appended after a `ranked(y, r, n)` CTE."""
    return f"""
        , bins AS (
            SELECT CAST(((r - 1) * {_CALIB_BINS}) {fdiv} n AS BIGINT)
                       AS bin,
                   CAST((r * 1000) {fdiv} n AS BIGINT) AS conf_permille,
                   CAST(y AS BIGINT) AS y
            FROM ranked
        ), curve AS (
            SELECT bin,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(y) AS BIGINT) AS n_pos,
                   CAST((sum(y) * 1000) {fdiv} count(*) AS BIGINT)
                       AS acc_permille,
                   CAST(sum(conf_permille) {fdiv} count(*) AS BIGINT)
                       AS conf_mean_permille
            FROM bins GROUP BY bin
        ), ece AS (
            SELECT CAST(sum(n_docs * abs(acc_permille
                                         - conf_mean_permille))
                        {fdiv} sum(n_docs) AS BIGINT) AS ece_permille
            FROM curve
        )
        SELECT c.bin, c.n_docs, c.n_pos, c.conf_mean_permille,
               c.acc_permille,
               c.acc_permille - c.conf_mean_permille AS gap_permille,
               e.ece_permille
        FROM curve c CROSS JOIN ece e
        ORDER BY c.bin
    """


_CALIB_ORACLE = f"""
    WITH scored AS (
        SELECT doc_id,
               CAST(lang = 'en' AS BIGINT) AS y,
               (len(list_filter(string_split(text, ' '),
                                t -> t IN ({_CALIB_STOPS}))) * 1000)
                   // len(string_split(text, ' ')) AS score_permille
        FROM documents
    ), ranked AS (
        SELECT y,
               row_number() OVER (ORDER BY score_permille, doc_id) AS r,
               count(*) OVER () AS n
        FROM scored
    )
    {_calib_report_sql('//')}
"""


@register(
    "eval_calibration_curve_ece",
    oracle=_CALIB_ORACLE,
    tags=("ml", "eval", "llm"),
    doc="Reliability diagram + expected calibration error for a "
    "ranking score, fully distributed: audits the en-stopword-rate "
    "signal (text_langid_heuristic's core) against the lang='en' "
    "target. Confidence is the score's own global rank percentile "
    "(the uniformly-calibrated baseline any raw ranker implies), "
    "computed with the global_rank primitive — range exchange + "
    "per-partition window + broadcast offsets, NO single-task ntile "
    "sort — then 10 equal-count bins, per-bin observed positive rate "
    "vs mean confidence on the exact permille grid, and ECE as a "
    "broadcast 1-row weighted rollup. The eval leg of this module's "
    "train/apply/evaluate trio: any scalar score column plugs into "
    "the same plan (cf. eval_auc_mann_whitney for the AUC leg).",
)
def eval_calibration_curve_ece(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from dynamodb_stream_processor_2_0_spark.operators.ranking import (
        global_rank,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.selectExpr(
        "doc_id",
        "CAST(lang = 'en' AS BIGINT) AS y",
        f"(size(filter(split(text, ' '), t -> t IN ({_CALIB_STOPS})))"
        " * 1000) div size(split(text, ' ')) AS score_permille",
    )
    ranked = global_rank(scored, ["score_permille", "doc_id"], out_col="r")
    n_total = F.broadcast(
        ranked.agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    ranked.crossJoin(n_total).createOrReplaceTempView("ml_calib_ranked")
    return spark.sql(
        "WITH ranked AS (SELECT y, r, n FROM ml_calib_ranked)"
        + _calib_report_sql("div")
    )


# --- split-conformal prediction intervals (model GUARANTEE) ----------------
#
# The fourth leg of the train/apply/evaluate loop: a distribution-free
# COVERAGE GUARANTEE. Split conformal (Vovk; Lei et al.): fit on the
# train split, take the ceil(0.9*(n_cal+1))-th smallest absolute
# residual on a disjoint calibration split as the interval half-width
# q, and exchangeability alone guarantees P(|y - yhat| <= q) >= 0.9 on
# fresh data — no distributional assumption on y or the model. The
# model here is univariate OLS (order totalprice ~ summed quantity)
# kept as an exact RATIONAL: yhat = (A + B*x)/D with
#   D = n*Sxx - Sx^2,  B = n*Sxy - Sx*Sy,  A = Sy*Sxx - Sx*Sxy
# so the conformal score is the cross-multiplied integer
# |D*y - A - B*x| — no division ever touches a per-row score, and both
# engines agree bit-for-bit. Headroom: D < n^2*x^2 ~ 1e25 at 1e9
# orders, D*y < 1e33 — inside DECIMAL(38,0)/HUGEINT at any realistic
# corpus. The calibration order statistic runs through global_rank
# (range exchange + broadcast offsets, no single-task sort); train
# stats are ONE map-side-combinable aggregation broadcast as the
# model; coverage is ONE aggregate over the test split.

_CONF_SPLIT = """
    CAST(('0x' || substr(md5('conf:' || CAST(o_orderkey AS VARCHAR)),
                         1, 8)) AS BIGINT) % 100
"""

_CONF_ORACLE = f"""
    WITH x AS (
        SELECT l_orderkey AS okey,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x
        FROM lineitem GROUP BY l_orderkey
    ), base AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS y,
               x.x,
               {_CONF_SPLIT} AS bucket
        FROM orders JOIN x ON x.okey = o_orderkey
    ), train AS (
        SELECT CAST(count(*) AS HUGEINT) AS n,
               CAST(sum(x) AS HUGEINT) AS sx,
               CAST(sum(y) AS HUGEINT) AS sy,
               CAST(sum(x * x) AS HUGEINT) AS sxx,
               CAST(sum(x * y) AS HUGEINT) AS sxy
        FROM base WHERE bucket < 60
    ), model AS (
        SELECT n AS n_train,
               n * sxx - sx * sx AS dd,
               n * sxy - sx * sy AS bb,
               sy * sxx - sx * sxy AS aa
        FROM train
    ), cal AS (
        SELECT b.o_orderkey,
               abs(m.dd * b.y - m.aa - m.bb * b.x) AS s
        FROM base b CROSS JOIN model m
        WHERE b.bucket >= 60 AND b.bucket < 80
    ), kk AS (
        SELECT CAST(count(*) AS BIGINT) AS n_cal,
               least(CAST(count(*) AS BIGINT),
                     (9 * (CAST(count(*) AS BIGINT) + 1) + 9) // 10)
                   AS k
        FROM cal
    ), qsel AS (
        SELECT r.s AS q, kk.n_cal, kk.k
        FROM (SELECT s, row_number() OVER (ORDER BY s, o_orderkey)
                     AS rn
              FROM cal) r
        CROSS JOIN kk
        WHERE r.rn = kk.k
    ), test AS (
        SELECT CAST(count(*) AS BIGINT) AS n_test,
               CAST(count(*) FILTER (
                   abs(m.dd * b.y - m.aa - m.bb * b.x) <= q.q)
                   AS BIGINT) AS n_covered
        FROM base b CROSS JOIN model m CROSS JOIN qsel q
        WHERE b.bucket >= 80
    )
    SELECT CAST(m.n_train AS BIGINT) AS n_train,
           q.n_cal, t.n_test, q.k AS k_rank,
           CAST(q.q // m.dd AS BIGINT) AS half_width_cents,
           CAST((CASE WHEN m.bb < 0 THEN -1 ELSE 1 END)
                * ((abs(m.bb) * 1000) // m.dd) AS BIGINT)
               AS b1_cents_per_qty_milli,
           CAST((CASE WHEN m.aa < 0 THEN -1 ELSE 1 END)
                * (abs(m.aa) // m.dd) AS BIGINT) AS b0_cents,
           CAST(1000 * t.n_covered // t.n_test AS BIGINT)
               AS coverage_permille,
           CAST(900 AS BIGINT) AS target_permille
    FROM model m CROSS JOIN qsel q CROSS JOIN test t
"""


@register(
    "ml_conformal_interval_coverage",
    oracle=_CONF_ORACLE,
    tags=("ml", "eval", "stats"),
    doc="Split-conformal prediction intervals with the finite-sample "
    "coverage GUARANTEE (Vovk; Lei et al.): univariate OLS "
    "(totalprice_cents ~ summed order quantity) fit on a 60% md5 "
    "split, interval half-width = the ceil(0.9*(n_cal+1))-th "
    "smallest absolute residual on a disjoint 20% calibration "
    "split, coverage audited on the held-out 20% — exchangeability "
    "alone guarantees >= 90% coverage in expectation, which the "
    "behavior test asserts. The model stays an exact rational "
    "(yhat = (A + B*x)/D) so every conformal score is the "
    "cross-multiplied wide integer |D*y - A - B*x|: no per-row "
    "division, bit-identical across engines, DECIMAL(38,0)/HUGEINT "
    "headroom to ~1e9 orders (D*y < 1e33). Train stats are ONE "
    "map-side-combinable aggregation broadcast as the model; the "
    "calibration order statistic uses global_rank (range exchange, "
    "no single-task sort); coverage is one test-split aggregate.",
)
def ml_conformal_interval_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from dynamodb_stream_processor_2_0_spark.operators.ranking import (
        global_rank,
    )

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    x = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("x")
    )
    base = (
        orders.join(x, F.col("okey") == F.col("o_orderkey"))
        .select(
            "o_orderkey",
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("y"),
            "x",
            F.expr(
                "CAST(conv(substr(md5(concat('conf:', "
                "CAST(o_orderkey AS STRING))), 1, 8), 16, 10) AS BIGINT)"
                " % 100"
            ).alias("bucket"),
        )
        # The train/cal/test arms each consume `base`; without a pin
        # the orders||lineitem join recomputed per arm (28 parquet
        # scans in the plan, 0 ReusedExchange). Lazy checkpoint:
        # computed once at the first action, read back by the other
        # arms — no build-time jobs (no range partitioner here, unlike
        # the gini ranking pins).
        .localCheckpoint(eager=False)
    )
    dec = "DECIMAL(38,0)"
    train = base.filter(F.col("bucket") < 60).agg(
        F.expr(f"CAST(count(1) AS {dec})").alias("n"),
        F.expr(f"CAST(sum(x) AS {dec})").alias("sx"),
        F.expr(f"CAST(sum(y) AS {dec})").alias("sy"),
        F.expr(f"CAST(sum(x * x) AS {dec})").alias("sxx"),
        F.expr(f"CAST(sum(x * y) AS {dec})").alias("sxy"),
    )
    model = F.broadcast(
        train.select(
            F.col("n").alias("n_train_dec"),
            F.expr("n * sxx - sx * sx").alias("dd"),
            F.expr("n * sxy - sx * sy").alias("bb"),
            F.expr("sy * sxx - sx * sxy").alias("aa"),
        )
    )
    cal = (
        base.filter((F.col("bucket") >= 60) & (F.col("bucket") < 80))
        .crossJoin(model)
        .select(
            "o_orderkey",
            F.expr("abs(dd * y - aa - bb * x)").alias("s"),
        )
    )
    kk = F.broadcast(
        cal.agg(
            F.count(F.lit(1)).cast("long").alias("n_cal"),
            F.expr(
                "least(CAST(count(1) AS BIGINT),"
                " (9 * (CAST(count(1) AS BIGINT) + 1) + 9) div 10)"
            ).alias("k"),
        )
    )
    qsel = F.broadcast(
        global_rank(cal, ["s", "o_orderkey"], out_col="rn")
        .crossJoin(kk)
        .filter(F.col("rn") == F.col("k"))
        .select(F.col("s").alias("q"), "n_cal", "k")
    )
    test = F.broadcast(
        base.filter(F.col("bucket") >= 80)
        .crossJoin(model)
        .crossJoin(qsel)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.expr(
                "CAST(count_if(abs(dd * y - aa - bb * x) <= q)"
                " AS BIGINT)"
            ).alias("n_covered"),
        )
    )
    return (
        model.crossJoin(qsel)
        .crossJoin(test)
        .select(
            F.expr("CAST(n_train_dec AS BIGINT)").alias("n_train"),
            "n_cal",
            "n_test",
            F.col("k").alias("k_rank"),
            F.expr("CAST(q div dd AS BIGINT)").alias(
                "half_width_cents"
            ),
            F.expr(
                "CAST((CASE WHEN bb < 0 THEN -1 ELSE 1 END)"
                " * ((abs(bb) * 1000) div dd) AS BIGINT)"
            ).alias("b1_cents_per_qty_milli"),
            F.expr(
                "CAST((CASE WHEN aa < 0 THEN -1 ELSE 1 END)"
                " * (abs(aa) div dd) AS BIGINT)"
            ).alias("b0_cents"),
            F.expr(
                "CAST(1000 * n_covered div n_test AS BIGINT)"
            ).alias("coverage_permille"),
            F.lit(900).cast("long").alias("target_permille"),
        )
    )


# --- Brier score + Murphy decomposition (model EVAL) ------------------------
#
# The PROPER-SCORING leg of the eval family: ECE measures calibration
# alone; the Brier score is a strictly proper score and Murphy (1973)
# splits it into REL - RES + UNC — how mis-calibrated the forecast is
# (REL), how much sharper than the base rate it is (RES), and the
# irreducible outcome variance (UNC). Same audited signal as
# eval_calibration_curve_ece (en-stopword rate vs lang='en'), same
# 10 equal-count rank bins via global_rank, forecast = the bin's mean
# rank-percentile confidence. All terms are exact micro units
# (permille^2); the decomposition identity holds up to the truncation
# of the bin means, and the residual is REPORTED as murphy_gap_micro
# rather than hidden.


def _brier_report_sql(fdiv: str) -> str:
    """CTE continuation appended after a `ranked(y, r, n)` CTE."""
    return f"""
        , bins AS (
            SELECT CAST(((r - 1) * 10) {fdiv} n AS BIGINT) AS bin,
                   CAST((r * 1000) {fdiv} n AS BIGINT) AS conf_permille,
                   CAST(y AS BIGINT) AS y
            FROM ranked
        ), curve AS (
            SELECT bin,
                   CAST(count(*) AS BIGINT) AS n_b,
                   CAST(sum(y) AS BIGINT) AS pos_b,
                   CAST(sum(conf_permille) {fdiv} count(*) AS BIGINT)
                       AS conf_b,
                   CAST((sum(y) * 1000) {fdiv} count(*) AS BIGINT)
                       AS acc_b
            FROM bins GROUP BY bin
        ), tot AS (
            SELECT CAST(sum(n_b) AS BIGINT) AS n,
                   CAST(sum(pos_b) AS BIGINT) AS pos,
                   CAST((sum(pos_b) * 1000) {fdiv} sum(n_b) AS BIGINT)
                       AS ybar
            FROM curve
        ), terms AS (
            SELECT t.n, t.pos, t.ybar,
                   CAST(sum(c.pos_b * (1000 - c.conf_b)
                                    * (1000 - c.conf_b)
                            + (c.n_b - c.pos_b) * c.conf_b * c.conf_b)
                        {fdiv} t.n AS BIGINT) AS brier_micro,
                   CAST(sum(c.n_b * (c.conf_b - c.acc_b)
                                  * (c.conf_b - c.acc_b))
                        {fdiv} t.n AS BIGINT) AS reliability_micro,
                   CAST(sum(c.n_b * (c.acc_b - t.ybar)
                                  * (c.acc_b - t.ybar))
                        {fdiv} t.n AS BIGINT) AS resolution_micro,
                   CAST((CAST(t.pos AS DECIMAL(38,0)) * (t.n - t.pos)
                         * 1000000) {fdiv} (CAST(t.n AS DECIMAL(38,0))
                                            * t.n) AS BIGINT)
                       AS uncertainty_micro
            FROM curve c CROSS JOIN tot t
            GROUP BY t.n, t.pos, t.ybar
        )
        SELECT n AS n_docs, pos AS n_pos, ybar AS ybar_permille,
               brier_micro, reliability_micro, resolution_micro,
               uncertainty_micro,
               brier_micro - (reliability_micro - resolution_micro
                              + uncertainty_micro) AS murphy_gap_micro
        FROM terms
    """


_BRIER_ORACLE = f"""
    WITH scored AS (
        SELECT doc_id,
               CAST(lang = 'en' AS BIGINT) AS y,
               (len(list_filter(string_split(text, ' '),
                                t -> t IN ({_CALIB_STOPS}))) * 1000)
                   // len(string_split(text, ' ')) AS score_permille
        FROM documents
    ), ranked AS (
        SELECT y,
               row_number() OVER (ORDER BY score_permille, doc_id) AS r,
               count(*) OVER () AS n
        FROM scored
    )
    {_brier_report_sql('//')}
"""


@register(
    "eval_brier_murphy_decomposition",
    oracle=_BRIER_ORACLE,
    tags=("ml", "eval", "llm"),
    doc="Brier score with the Murphy (1973) decomposition Brier = "
    "REL - RES + UNC for the en-stopword-rate signal against the "
    "lang='en' target: the strictly PROPER scoring complement to "
    "eval_calibration_curve_ece (ECE measures calibration alone and "
    "can be gamed by a constant base-rate forecast; Brier also pays "
    "for lost sharpness, which RES makes explicit). Forecast = the "
    "10-bin mean rank-percentile confidence from the same "
    "global_rank binning as the ECE query (range exchange + "
    "broadcast offsets, no single-task sort); every term is an "
    "exact integer in micro (permille^2) units, and the truncation "
    "residual of the identity is REPORTED as murphy_gap_micro "
    "instead of silently absorbed. One rank pass + one 10-row "
    "rollup; O(1) output at any corpus size.",
)
def eval_brier_murphy_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from dynamodb_stream_processor_2_0_spark.operators.ranking import (
        global_rank,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.selectExpr(
        "doc_id",
        "CAST(lang = 'en' AS BIGINT) AS y",
        f"(size(filter(split(text, ' '), t -> t IN ({_CALIB_STOPS})))"
        " * 1000) div size(split(text, ' ')) AS score_permille",
    )
    ranked = global_rank(scored, ["score_permille", "doc_id"], out_col="r")
    n_total = F.broadcast(
        ranked.agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    ranked.crossJoin(n_total).createOrReplaceTempView("ml_brier_ranked")
    return spark.sql(
        "WITH ranked AS (SELECT y, r, n FROM ml_brier_ranked)"
        + _brier_report_sql("div")
    )


# --- exact Gini decision stump (model TRAIN) ---------------------------------
#
# Second TRAINING leg beside the closed-form OLS: a depth-1 decision
# tree (stump) fit EXACTLY over the full corpus — no sampling, no
# histogram approximation (the classic single-machine sort-and-scan,
# re-expressed as global_rank + distributed prefix sums). For each
# numeric feature, every boundary between distinct adjacent values is
# a candidate threshold; weighted Gini impurity at split i is
#   2/n * (pos_l*(i-pos_l)/i + pos_r*(n-i-pos_r)/(n-i))
# kept as one exact integer quotient in micro units. The argmin is a
# broadcast min + equality filter (deterministic lowest-threshold
# tie-break). Label: l_returnflag = 'R'.

_STUMP_FEATURES = (
    ("l_quantity", "CAST(l_quantity AS BIGINT)"),
    ("l_extendedprice_cents", "CAST(round(l_extendedprice * 100) AS BIGINT)"),
)


def _stump_oracle() -> str:
    arms = []
    for fname, fexpr in _STUMP_FEATURES:
        arms.append(f"""
        SELECT '{fname}' AS feature, n, pos,
               CAST(2 * 1000000 * CAST(pos AS HUGEINT) * (n - pos)
                    // (CAST(n AS HUGEINT) * n) AS BIGINT)
                   AS baseline_gini_micro,
               best_threshold, best_impurity_micro
        FROM (
            WITH rows_ AS (
                SELECT {fexpr} AS val,
                       CAST(l_returnflag = 'R' AS BIGINT) AS y,
                       l_orderkey * 100 + l_linenumber AS rid
                FROM lineitem
            ), ranked AS (
                SELECT val, y,
                       row_number() OVER (ORDER BY val, rid) AS r,
                       sum(y) OVER (ORDER BY val, rid
                                    ROWS UNBOUNDED PRECEDING) AS pos_l,
                       lead(val) OVER (ORDER BY val, rid) AS next_val,
                       count(*) OVER () AS n,
                       sum(y) OVER () AS pos
                FROM rows_
            ), cand AS (
                SELECT r AS i, val AS thr, pos_l, n, pos,
                       CAST(2 * 1000000 *
                            (CAST(pos_l AS HUGEINT) * (r - pos_l)
                                 * (n - r)
                             + CAST(pos - pos_l AS HUGEINT)
                                 * ((n - r) - (pos - pos_l)) * r)
                            // (CAST(n AS HUGEINT) * r * (n - r))
                            AS BIGINT) AS imp
                FROM ranked
                WHERE next_val IS NOT NULL AND next_val > val
            ), best AS (
                SELECT min(imp) AS best_imp FROM cand
            )
            SELECT max(c.n) AS n, max(c.pos) AS pos,
                   CAST(min(c.thr) AS BIGINT) AS best_threshold,
                   b.best_imp AS best_impurity_micro
            FROM cand c CROSS JOIN best b
            WHERE c.imp = b.best_imp
            GROUP BY b.best_imp
        )""")
    u = "\n        UNION ALL\n".join(arms)
    return f"""
        SELECT feature, CAST(n AS BIGINT) AS n_rows,
               CAST(pos AS BIGINT) AS n_pos, baseline_gini_micro,
               best_threshold, best_impurity_micro,
               baseline_gini_micro - best_impurity_micro
                   AS info_gain_micro
        FROM ({u})
        ORDER BY feature
    """


@register(
    "ml_gini_decision_stump",
    oracle=_stump_oracle(),
    tags=("ml", "train", "scale"),
    doc="Exact Gini decision stump over the full corpus — the "
    "sort-and-scan CART split finder re-expressed distributed. "
    "Candidate thresholds only exist at boundaries between DISTINCT "
    "adjacent values, so each feature first collapses to its distinct "
    "values with per-value row/positive counts (hash groupBy — "
    "map-side partial agg absorbs heavy-hitter values; |distinct| <= "
    "|rows| always, and for low-cardinality features the arm becomes "
    "trivially small). One multi-column distributed prefix-sum pass "
    "(global_running_sums: range exchange + broadcast offsets, no "
    "single-task sort) then carries BOTH the cumulative row count "
    "(the split rank r) and the cumulative positives (pos_l), and "
    "every distinct value except the global max IS a candidate — no "
    "rank-(r+1) self-join, no row-level ranking. The weighted Gini "
    "at every split is ONE exact integer quotient in micro units "
    "(DECIMAL(38,0) headroom past 1e9 rows). No sampling, no "
    "histogram binning — the exact split XGBoost's 'exact' tree "
    "method computes per node, at Spark scale. Deterministic "
    "argmin: broadcast min impurity + lowest-threshold tie-break. "
    "Label l_returnflag='R'; info_gain_micro vs the baseline Gini "
    "says whether the feature carries any signal at all.",
)
def ml_gini_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dynamodb_stream_processor_2_0_spark.operators.ranking import (
        global_running_sums,
    )

    li = load_table(spark, sf_dir, "lineitem")

    def build_arm(fname: str, fexpr: str):
        grouped = (
            li.selectExpr(
                f"{fexpr} AS val",
                "CAST(l_returnflag = 'R' AS BIGINT) AS y",
            )
            .groupBy("val")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("ypos"))
        )
        pref = global_running_sums(
            grouped, ["val"], [("cnt", "r"), ("ypos", "pos_l")]
        )
        tot = F.broadcast(
            grouped.agg(
                F.sum("cnt").cast("long").alias("n"),
                F.sum("ypos").cast("long").alias("pos"),
            )
        )
        cand = (
            pref.crossJoin(tot)
            # every distinct value except the global max bounds a split
            .filter(F.col("r") < F.col("n"))
            .select(
                F.col("val").alias("thr"),
                # nullif keeps the quotient total under ANSI: Catalyst
                # may evaluate the pushed-down imp == best_imp
                # predicate BEFORE the r < n filter in the fused
                # stage, and the r == n row has divisor 0; NULL there
                # is ignored by min() and excluded by the equality.
                F.expr(
                    "CAST(2 * 1000000 *"
                    " (CAST(pos_l AS DECIMAL(38,0)) * (r - pos_l)"
                    "      * (n - r)"
                    "  + CAST(pos - pos_l AS DECIMAL(38,0))"
                    "      * ((n - r) - (pos - pos_l)) * r)"
                    " div (CAST(n AS DECIMAL(38,0)) * r"
                    "      * nullif(n - r, 0))"
                    " AS BIGINT)"
                ).alias("imp"),
                "n",
                "pos",
            )
        )
        best = F.broadcast(cand.agg(F.min("imp").alias("best_imp")))
        arm = (
            cand.crossJoin(best)
            .filter(F.col("imp") == F.col("best_imp"))
            .groupBy("best_imp")
            .agg(
                F.max("n").alias("n"),
                F.max("pos").alias("pos"),
                F.min("thr").cast("long").alias("best_threshold"),
            )
            .select(
                F.lit(fname).alias("feature"),
                F.col("n").cast("long").alias("n_rows"),
                F.col("pos").cast("long").alias("n_pos"),
                F.expr(
                    "CAST(2 * 1000000 * CAST(pos AS DECIMAL(38,0))"
                    " * (n - pos) div (CAST(n AS DECIMAL(38,0)) * n)"
                    " AS BIGINT)"
                ).alias("baseline_gini_micro"),
                "best_threshold",
                F.col("best_imp").alias("best_impurity_micro"),
            )
        )
        return arm

    # The 8 arms are independent until the final union, and each arm's
    # build triggers eager work (global_running_sums' pin + the range
    # sampler's driver-side jobs). Built sequentially those jobs
    # serialize ~5-6 s of mostly-idle cluster time (r12 VERDICT item 5);
    # a small thread pool overlaps them (guide §2.6 — actions are only
    # sequential because the driver calls them sequentially). Arm order
    # (and therefore the unioned plan and output) is preserved by
    # pool.map; each arm's checkpoint content is per-arm deterministic,
    # so results are unchanged.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        arms = list(pool.map(lambda fa: build_arm(*fa), _STUMP_FEATURES))
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.select(
        "feature",
        "n_rows",
        "n_pos",
        "baseline_gini_micro",
        "best_threshold",
        "best_impurity_micro",
        (F.col("baseline_gini_micro") - F.col("best_impurity_micro")).alias(
            "info_gain_micro"
        ),
    ).orderBy("feature")


# --- multinomial naive Bayes language ID (train + apply + eval) --------------
#
# The GENERATIVE classifier leg beside the discriminative hashed
# linear scorer: multinomial NB with add-one smoothing, trained on a
# deterministic md5 60/40 doc split, scored entirely in exact integer
# SURPRISAL bits (the house floor-log2): predicted lang = argmin of
# prior surprisal + sum over token occurrences of
# floorlog2((N_l + V) / (c_{l,tok} + 1)). Unseen tokens take the
# per-class smoothing floor bitlen(N_l + V) - 1. Floored logs bias
# every class score identically downward, so the ARGMAX ordering —
# the thing the classifier is — is the NB decision up to 1-bit ties
# broken deterministically (score asc, lang asc). Accuracy is scored
# per true language on the held-out split.

_NB_SPLIT = (
    "CAST(conv(substr(md5(concat('nb:', CAST(doc_id AS STRING))), 1, 8),"
    " 16, 10) AS BIGINT) % 100"
)
_NB_SPLIT_DUCK = (
    "CAST(('0x' || substr(md5('nb:' || CAST(doc_id AS VARCHAR)), 1, 8))"
    " AS BIGINT) % 100"
)

_NB_ORACLE = f"""
    WITH docs AS (
        SELECT doc_id, lang, text,
               {_NB_SPLIT_DUCK} < 60 AS is_train
        FROM documents
    ), toks AS (
        SELECT doc_id, lang, is_train,
               unnest(string_split(text, ' ')) AS tok
        FROM docs
    ), toks2 AS (
        SELECT doc_id, lang, is_train, tok FROM toks WHERE tok <> ''
    ), counts AS (
        SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
        FROM toks2 WHERE is_train GROUP BY lang, tok
    ), vocab AS (
        SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
        FROM toks2 WHERE is_train
    ), lang_tot AS (
        SELECT lang, CAST(sum(c) AS BIGINT) AS nl FROM counts
        GROUP BY lang
    ), priors AS (
        SELECT d.lang,
               CAST(count(*) AS BIGINT) AS dl,
               CAST((SELECT count(*) FROM docs WHERE is_train)
                    AS BIGINT) AS dtot
        FROM docs d WHERE d.is_train GROUP BY d.lang
    ), scored AS (
        SELECT doc_id, true_lang, cand_lang,
               CAST(sum((length(bin(r)) - 1) * 1000
                        + ((r - (CAST(1 AS BIGINT)
                                 << (length(bin(r)) - 1))) * 1000)
                          // (CAST(1 AS BIGINT)
                              << (length(bin(r)) - 1))
                        - 10000) AS BIGINT) AS score_tok_milli
        FROM (
            SELECT t.doc_id, t.lang AS true_lang, lt.lang AS cand_lang,
                   ((lt.nl + vv.v) * 1024)
                       // (COALESCE(c.c, 0) + 1) AS r
            FROM toks2 t
            CROSS JOIN lang_tot lt
            CROSS JOIN vocab vv
            LEFT JOIN counts c ON c.lang = lt.lang AND c.tok = t.tok
            WHERE NOT t.is_train
        )
        GROUP BY doc_id, true_lang, cand_lang
    ), s_pr AS (
        SELECT s.*, (p.dtot * 1024) // p.dl AS pr
        FROM scored s JOIN priors p ON p.lang = s.cand_lang
    ), with_prior AS (
        SELECT s.doc_id, s.true_lang, s.cand_lang,
               s.score_tok_milli
               + (length(bin(pr)) - 1) * 1000
               + ((pr - (CAST(1 AS BIGINT) << (length(bin(pr)) - 1)))
                  * 1000)
                 // (CAST(1 AS BIGINT) << (length(bin(pr)) - 1))
               - 10000 AS score_milli
        FROM s_pr s
    ), pred AS (
        SELECT doc_id, true_lang, cand_lang AS predicted_lang
        FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                          ORDER BY score_milli ASC, cand_lang ASC) AS rn
            FROM with_prior
        ) WHERE rn = 1
    )
    SELECT true_lang,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(count(*) FILTER (predicted_lang = true_lang) AS BIGINT)
               AS n_correct,
           CAST(1000 * count(*) FILTER (predicted_lang = true_lang)
                // count(*) AS BIGINT) AS accuracy_permille
    FROM pred
    GROUP BY true_lang
    ORDER BY true_lang
"""


@register(
    "ml_naive_bayes_langid",
    oracle=_NB_ORACLE,
    tags=("ml", "train", "eval", "text", "llm"),
    doc="Multinomial naive Bayes language classifier, trained and "
    "evaluated in-plan: deterministic md5 60/40 doc split, add-one "
    "smoothed per-(lang, token) counts, and classification as argmin "
    "of exact integer MILLI-BIT surprisals: each ratio (N_l+V)/(c+1) "
    "is scaled by 1024 and passed through the piecewise-linear "
    "integer log2 k*1000 + (r - 2^k)*1000/2^k (max error ~86 "
    "millibits, deterministic in both engines) — enough resolution "
    "for the likelihoods to out-vote the class prior, which the "
    "house 1-bit floor-log could not. The generative TRAIN leg "
    "complementing the discriminative hashed linear scorer; held-out "
    "per-language accuracy is the deliverable (cf. "
    "text_langid_confusion_matrix, which audits the hand-written "
    "heuristic — this one is LEARNED from the same corpus). Shape: "
    "one (lang, tok) training rollup, test tokens crossed with the "
    "|langs|-row totals (broadcast) and LEFT-joined to the weight "
    "table on (lang, tok) — the shuffle carries token occurrences "
    "x |langs|, linear in corpus size; argmin is a per-doc window "
    "over |langs| candidate rows.",
)
def ml_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "text",
        F.expr(f"{_NB_SPLIT} < 60").alias("is_train"),
    )
    toks = docs.select(
        "doc_id",
        "lang",
        "is_train",
        F.explode(F.split("text", " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    train = toks.filter("is_train")
    counts = train.groupBy("lang", "tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    vocab = train.agg(
        F.countDistinct("tok").cast("long").alias("v")
    )
    lang_tot = counts.groupBy("lang").agg(
        F.sum("c").cast("long").alias("nl")
    )
    n_train_docs = docs.filter("is_train").agg(
        F.count(F.lit(1)).cast("long").alias("dtot")
    )
    priors = (
        docs.filter("is_train")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("dl"))
        .crossJoin(F.broadcast(n_train_docs))
    )
    cand = F.broadcast(
        lang_tot.crossJoin(F.broadcast(vocab)).select(
            F.col("lang").alias("cand_lang"), "nl", "v"
        )
    )
    test_tok = toks.filter(~F.col("is_train")).select(
        "doc_id", F.col("lang").alias("true_lang"), "tok"
    )
    ml2 = (
        "(length(bin({r})) - 1) * 1000"
        " + (({r} - shiftleft(CAST(1 AS BIGINT),"
        " length(bin({r})) - 1)) * 1000)"
        " div shiftleft(CAST(1 AS BIGINT), length(bin({r})) - 1)"
        " - 10000"
    )
    scored = (
        test_tok.crossJoin(cand)
        .join(
            counts.select(
                F.col("lang").alias("cand_lang"), "tok", "c"
            ),
            ["cand_lang", "tok"],
            "left",
        )
        .select(
            "doc_id",
            "true_lang",
            "cand_lang",
            F.expr("((nl + v) * 1024) div (COALESCE(c, 0) + 1)").alias(
                "r"
            ),
        )
        .groupBy("doc_id", "true_lang", "cand_lang")
        .agg(
            F.expr(
                f"CAST(sum({ml2.format(r='r')}) AS BIGINT)"
            ).alias("score_tok_milli")
        )
    )
    with_prior = scored.join(
        F.broadcast(
            priors.select(
                F.col("lang").alias("cand_lang"),
                F.expr("(dtot * 1024) div dl").alias("pr"),
            ).selectExpr(
                "cand_lang",
                f"CAST({ml2.format(r='pr')} AS BIGINT) AS prior_milli",
            )
        ),
        "cand_lang",
    ).select(
        "doc_id",
        "true_lang",
        "cand_lang",
        (F.col("score_tok_milli") + F.col("prior_milli")).alias(
            "score_milli"
        ),
    )
    wdoc = Window.partitionBy("doc_id").orderBy(
        F.col("score_milli").asc(), F.col("cand_lang").asc()
    )
    pred = (
        with_prior.withColumn("rn", F.row_number().over(wdoc))
        .filter(F.col("rn") == 1)
        .select("doc_id", "true_lang", F.col("cand_lang").alias("pred"))
    )
    return (
        pred.groupBy("true_lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.expr("CAST(count_if(pred = true_lang) AS BIGINT)").alias(
                "n_correct"
            ),
        )
        .select(
            "true_lang",
            "n_test",
            "n_correct",
            F.expr("CAST(1000 * n_correct div n_test AS BIGINT)").alias(
                "accuracy_permille"
            ),
        )
        .orderBy("true_lang")
    )


# --- k-NN label classifier eval (embeddings) ----------------------------------
#
# The non-parametric classifier leg over the labeled embedding corpus:
# deterministic md5 80/20 train/test split, each test vector labeled
# by the MAJORITY of its k=5 nearest TRAIN neighbors by exact cosine
# (ties: higher vote count, then smaller label), per-label held-out
# accuracy. On synthetic random embeddings the labels are independent
# of geometry, so the expected accuracy is the ~1/|labels| chance
# floor and the operator is a CALIBRATION audit (a score above chance
# flags leakage); on a real corpus it is the standard embedding-
# quality probe (kNN accuracy tracks linear-probe accuracy). Test
# side broadcasts against the train scan (the cosine_topk shape) —
# at larger test fractions flip to the IVF/LSH bucketed path.

_KNN_K = 5
_KNN_SPLIT_DUCK = (
    "CAST(('0x' || substr(md5('knn:' || CAST(vec_id AS VARCHAR)), 1, 8))"
    " AS BIGINT) % 100"
)

_KNN_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, v) -> acc + v)"
)

_KNN_ORACLE = f"""
    WITH split AS (
        SELECT vec_id, embedding, label,
               {_KNN_SPLIT_DUCK} < 80 AS is_train
        FROM embeddings
    ), normed AS (
        SELECT vec_id, embedding, label, is_train,
               sqrt({_KNN_DOT.format(a="embedding", b="embedding")})
                   AS norm
        FROM split
    ), probes AS (
        SELECT vec_id, embedding, label, norm
        FROM normed WHERE NOT is_train
        ORDER BY md5('knnp:' || CAST(vec_id AS VARCHAR)), vec_id
        LIMIT 512
    ), scored AS (
        SELECT q.vec_id AS test_id, q.label AS true_label,
               c.label AS cand_label,
               {_KNN_DOT.format(a="q.embedding", b="c.embedding")}
                   / (q.norm * c.norm) AS cosine,
               c.vec_id AS cand_id
        FROM probes q JOIN normed c ON c.is_train
    ), topk AS (
        SELECT test_id, true_label, cand_label
        FROM (
            SELECT *, row_number() OVER (PARTITION BY test_id
                          ORDER BY cosine DESC, cand_id) AS rn
            FROM scored
        ) WHERE rn <= {_KNN_K}
    ), votes AS (
        SELECT test_id, true_label, cand_label,
               CAST(count(*) AS BIGINT) AS v
        FROM topk GROUP BY test_id, true_label, cand_label
    ), pred AS (
        SELECT test_id, true_label, cand_label AS predicted
        FROM (
            SELECT *, row_number() OVER (PARTITION BY test_id
                          ORDER BY v DESC, cand_label ASC) AS rn
            FROM votes
        ) WHERE rn = 1
    )
    SELECT true_label,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(count(*) FILTER (predicted = true_label) AS BIGINT)
               AS n_correct,
           CAST(1000 * count(*) FILTER (predicted = true_label)
                // count(*) AS BIGINT) AS accuracy_permille
    FROM pred
    GROUP BY true_label
    ORDER BY true_label
"""


@register(
    "ml_knn_label_eval",
    oracle=_KNN_ORACLE,
    tags=("ml", "eval", "similarity", "llm"),
    doc="k-NN (k=5) label classification over the labeled embedding "
    "corpus with a deterministic md5 80/20 split: exact-cosine "
    "nearest train neighbors (ordered double fold, rank ties to the "
    "smaller vec_id), majority vote (ties to the smaller label), "
    "per-label held-out accuracy. The standard embedding-quality "
    "probe — kNN accuracy tracks linear-probe accuracy on real "
    "corpora; on THIS synthetic corpus labels are independent of "
    "geometry, so the output is a chance-floor calibration audit "
    "(~1/|labels|) and anything above it would flag leakage. The "
    "probe set is CAPPED at 512 deterministic md5-ordered test "
    "vectors (TakeOrderedAndProject), so the brute-force arm is "
    "O(512 * n_train) — LINEAR in corpus size by construction "
    "(uncapped, both sides grow and the scoring is quadratic: "
    "measured 18x at 10x rows before the cap). The 512-probe "
    "broadcast rides the cosine_topk shape with the r12 split-fold "
    "fast path (operators/similarity.with_pair_fold: codegen'd "
    "unrolled dot for width-64 rows, HOF arm for the rest, "
    "bit-identical union — 5.5 -> 2.2 s at sf0.1); exhaustive-probe "
    "grading belongs on the IVF/LSH bucketed arms.",
)
def ml_knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from dynamodb_stream_processor_2_0_spark.operators.similarity import (
        with_norm,
        with_pair_fold,
    )

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        "label",
        F.expr(
            "CAST(conv(substr(md5(concat('knn:', "
            "CAST(vec_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"
            " % 100 < 80"
        ).alias("is_train"),
    )
    normed = with_norm(emb)
    train = normed.filter("is_train").select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("cand_vec"),
        F.col("label").alias("cand_label"),
        F.col("norm").alias("cand_norm"),
    )
    test = (
        normed.filter("NOT is_train")
        .orderBy(
            F.expr("md5(concat('knnp:', CAST(vec_id AS STRING)))"),
            "vec_id",
        )
        .limit(512)
        .select(
            F.col("vec_id").alias("test_id"),
            F.col("embedding").alias("test_vec"),
            F.col("label").alias("true_label"),
            F.col("norm").alias("test_norm"),
        )
    )
    scored = with_pair_fold(
        train.join(F.broadcast(test), F.lit(True)), "test_vec", "cand_vec", "_pdot"
    ).select(
        "test_id",
        "true_label",
        "cand_label",
        "cand_id",
        # try_divide: zero-norm vectors score NULL (ranks last), they
        # must not kill the eval (tools/hostile_sweep.py nulls world)
        F.try_divide(
            F.col("_pdot"),
            F.col("test_norm") * F.col("cand_norm"),
        ).alias("cosine"),
    )
    wrank = W.partitionBy("test_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    topk = (
        scored.withColumn("rn", F.row_number().over(wrank))
        .filter(F.col("rn") <= _KNN_K)
        .select("test_id", "true_label", "cand_label")
    )
    votes = topk.groupBy("test_id", "true_label", "cand_label").agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    wv = W.partitionBy("test_id").orderBy(
        F.col("v").desc(), F.col("cand_label").asc()
    )
    pred = (
        votes.withColumn("rn", F.row_number().over(wv))
        .filter("rn = 1")
        .select("test_id", "true_label", F.col("cand_label").alias("predicted"))
    )
    return (
        pred.groupBy("true_label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.expr(
                "CAST(count_if(predicted = true_label) AS BIGINT)"
            ).alias("n_correct"),
        )
        .select(
            "true_label",
            "n_test",
            "n_correct",
            F.expr("CAST(1000 * n_correct div n_test AS BIGINT)").alias(
                "accuracy_permille"
            ),
        )
        .orderBy("true_label")
    )


# --- feature-label mutual information (feature selection) ----------------------
#
# Filter-method feature selection: MI(X; Y) between banded lineitem
# features and the return-flag label, in exact integer MILLIBITS via
# the same piecewise-linear integer log2 the NB classifier uses
# (k*1000 + (r-2^k)*1000/2^k on 1024-scaled ratios) — the lift ratio
# p(x,y)/(p(x)p(y)) enters as the exact integer fraction
# c_xy*n / (c_x*c_y), sign-split so ratios below 1 contribute their
# negative term exactly. Normalized by the label entropy H(Y) (same
# log) to the uncertainty-coefficient permille, so features are
# comparable across datasets. One (feature, x, y) cell rollup per
# feature — map-side combinable, O(bands * 2) cells out of any
# corpus.

_MI_FEATURES = (
    ("qty_band10", "CAST(l_quantity AS BIGINT) // 10"),
    ("discount_pct", "CAST(round(l_discount * 100) AS BIGINT)"),
    ("ship_month", "CAST(month(l_shipdate) AS BIGINT)"),
)


def _mi_ml2(r: str, div: str) -> str:
    """Milli-log2 of the 1024-scaled integer ratio {r} (>= 1)."""
    return (
        f"((length(bin({r})) - 1) * 1000"
        f" + (({r} - (CAST(1 AS BIGINT) << (length(bin({r})) - 1)))"
        f" * 1000) {div} (CAST(1 AS BIGINT) << (length(bin({r})) - 1))"
        f" - 10000)"
    )


def _mi_oracle() -> str:
    arms = []
    for fname, fexpr in _MI_FEATURES:
        fexpr_d = fexpr
        arms.append(f"""        SELECT '{fname}' AS feature, {fexpr_d} AS x,
               CAST(l_returnflag = 'R' AS BIGINT) AS y
        FROM lineitem""")
    u = "\n        UNION ALL\n".join(arms)
    up = "(CAST(cxy AS HUGEINT) * n * 1024) // (CAST(cx AS HUGEINT) * cy)"
    dn = "(CAST(cx AS HUGEINT) * cy * 1024) // (CAST(cxy AS HUGEINT) * n)"
    hy_r = "(CAST(n AS HUGEINT) * 1024) // cy"
    return f"""
        WITH rows_ AS ({u}),
        cells AS (
            SELECT feature, x, y, CAST(count(*) AS BIGINT) AS cxy
            FROM rows_ GROUP BY feature, x, y
        ), xs AS (
            SELECT feature, x, CAST(sum(cxy) AS BIGINT) AS cx
            FROM cells GROUP BY feature, x
        ), ys AS (
            SELECT feature, y, CAST(sum(cxy) AS BIGINT) AS cy,
                   CAST(sum(sum(cxy)) OVER (PARTITION BY feature)
                        AS BIGINT) AS n
            FROM cells GROUP BY feature, y
        ), terms AS (
            SELECT c.feature, c.cxy, ys.n,
                   CASE WHEN CAST(c.cxy AS HUGEINT) * ys.n
                             >= CAST(xs.cx AS HUGEINT) * ys.cy
                        THEN CAST({_mi_ml2(up, "//")} AS BIGINT)
                        ELSE -CAST({_mi_ml2(dn, "//")} AS BIGINT)
                   END AS ml2_milli
            FROM cells c
            JOIN xs ON xs.feature = c.feature AND xs.x = c.x
            JOIN ys ON ys.feature = c.feature AND ys.y = c.y
        ), mi AS (
            SELECT feature, max(n) AS n,
                   CAST(sum(CAST(cxy AS HUGEINT) * ml2_milli)
                        // max(n) AS BIGINT) AS mi_millibits
            FROM terms GROUP BY feature
        ), hy AS (
            SELECT feature,
                   CAST(sum(CAST(cy AS HUGEINT)
                            * {_mi_ml2(hy_r, "//")})
                        // max(n) AS BIGINT) AS h_y_millibits
            FROM ys GROUP BY feature
        )
        SELECT m.feature, m.n AS n_rows, m.mi_millibits,
               h.h_y_millibits,
               CASE WHEN h.h_y_millibits = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(1000 * greatest(m.mi_millibits, 0)
                              // h.h_y_millibits AS BIGINT)
               END AS uncertainty_coeff_permille
        FROM mi m JOIN hy h ON h.feature = m.feature
        ORDER BY m.feature
    """


@register(
    "ml_feature_mutual_information",
    oracle=_mi_oracle(),
    tags=("ml", "stats", "eval"),
    doc="Filter-method feature selection: mutual information between "
    "banded lineitem features (quantity decade, discount percent, "
    "ship month) and the return-flag label, in exact integer "
    "millibits — the lift p(x,y)/(p(x)p(y)) enters as the integer "
    "fraction c_xy*n/(c_x*c_y) through the piecewise-linear integer "
    "log2 (the NB classifier's), sign-split so sub-1 ratios "
    "contribute their negative terms exactly. Normalized to the "
    "uncertainty coefficient MI/H(Y) in permille so features are "
    "comparable. On this label-independent fixture all three MIs "
    "sit at the ~0 noise floor — the calibration reading; a planted "
    "dependent feature in the behavior test scores the full H(Y). "
    "One (feature, band, label) cell rollup per feature, map-side "
    "combinable, O(bands*2) cells at any corpus size.",
)
def ml_feature_mutual_information(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    arms = []
    for fname, fexpr in _MI_FEATURES:
        arms.append(
            li.selectExpr(
                f"'{fname}' AS feature",
                f"{fexpr.replace('//', 'div')} AS x",
                "CAST(l_returnflag = 'R' AS BIGINT) AS y",
            )
        )
    rows = arms[0]
    for a in arms[1:]:
        rows = rows.unionByName(a)
    cells = rows.groupBy("feature", "x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("cxy")
    )
    xs = cells.groupBy("feature", "x").agg(
        F.sum("cxy").cast("long").alias("cx")
    )
    wf = W.partitionBy("feature")
    ys = (
        cells.groupBy("feature", "y")
        .agg(F.sum("cxy").cast("long").alias("cy"))
        .select(
            "feature",
            "y",
            "cy",
            F.sum("cy").over(wf).cast("long").alias("n"),
        )
    )
    up = (
        "(CAST(cxy AS DECIMAL(38,0)) * n * 1024)"
        " div (CAST(cx AS DECIMAL(38,0)) * cy)"
    )
    dn = (
        "(CAST(cx AS DECIMAL(38,0)) * cy * 1024)"
        " div (CAST(cxy AS DECIMAL(38,0)) * n)"
    )
    terms = (
        cells.join(xs, ["feature", "x"])
        .join(ys, ["feature", "y"])
        .select(
            "feature",
            "cxy",
            "n",
            F.expr(
                f"CASE WHEN CAST(cxy AS DECIMAL(38,0)) * n"
                f" >= CAST(cx AS DECIMAL(38,0)) * cy"
                f" THEN CAST({_mi_ml2(up, 'div')} AS BIGINT)"
                f" ELSE -CAST({_mi_ml2(dn, 'div')} AS BIGINT) END"
            ).alias("ml2_milli"),
        )
    )
    mi = terms.groupBy("feature").agg(
        F.max("n").alias("n_rows"),
        F.expr(
            "CAST(sum(CAST(cxy AS DECIMAL(38,0)) * ml2_milli)"
            " div max(n) AS BIGINT)"
        ).alias("mi_millibits"),
    )
    hy_r = "(CAST(n AS DECIMAL(38,0)) * 1024) div cy"
    hy = ys.groupBy("feature").agg(
        F.expr(
            f"CAST(sum(CAST(cy AS DECIMAL(38,0))"
            f" * {_mi_ml2(hy_r, 'div')}) div max(n) AS BIGINT)"
        ).alias("h_y_millibits")
    )
    return (
        mi.join(hy, "feature")
        .select(
            "feature",
            "n_rows",
            "mi_millibits",
            "h_y_millibits",
            F.expr(
                "CASE WHEN h_y_millibits = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST(1000 * greatest(mi_millibits, 0)"
                " div h_y_millibits AS BIGINT) END"
            ).alias("uncertainty_coeff_permille"),
        )
        .orderBy("feature")
    )
