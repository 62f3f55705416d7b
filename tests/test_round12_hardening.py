"""Round-12 hardening pins.

attribution_markov_removal grew a measured-threshold driver-side solve
arm (the value iteration runs over an O(variants x channels^2) relation
whose size depends only on channel cardinality; below
_MRA_DRIVER_MAX_CHANNELS the rolled-up transition table is collected
once and the same truncating-integer iteration runs in exact Python
ints — sf0.1 warm steady measured 6.53 s -> ~1.8 s). These tests pin
the equivalence contract: the two arms must return IDENTICAL rows on
real data, on the nulls hostile world (3VL: NULL s dropped by the
variant filter, NULL t counts toward tot but contributes 0), and on the
empty world. If the driver mirror ever drifts from the SQL semantics,
this fails before the oracle gate does.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT / "tools") not in sys.path:
    sys.path.insert(0, str(REPO_ROOT / "tools"))

from hostile_sweep import build_degenerate, build_empty, build_nulls  # noqa: E402

import dynamodb_stream_processor_2_0_spark.plans.queries_causal_eval as QCE  # noqa: E402
from dynamodb_stream_processor_2_0_spark.plans import registry  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def _both_arms(spark, sf_dir: str):
    fn = registry.get("attribution_markov_removal").fn
    saved = QCE._MRA_DRIVER_MAX_CHANNELS
    try:
        QCE._MRA_DRIVER_MAX_CHANNELS = 10**9  # force driver arm
        driver_rows = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
        QCE._MRA_DRIVER_MAX_CHANNELS = -1  # force distributed arm
        dist_rows = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
    finally:
        QCE._MRA_DRIVER_MAX_CHANNELS = saved
    return driver_rows, dist_rows


def test_mra_arms_identical_real_data(spark):
    driver_rows, dist_rows = _both_arms(spark, SF0001)
    assert driver_rows == dist_rows
    assert len(driver_rows) > 0
    # schema-stable 5-tuple: channel + 4 BIGINT metrics
    assert all(len(r) == 5 for r in driver_rows)


@pytest.mark.parametrize(
    "build", [build_degenerate, build_nulls, build_empty], ids=["degenerate", "nulls", "empty"]
)
def test_mra_arms_identical_hostile(spark, build):
    tmp = tempfile.mkdtemp(prefix="mra_eq_")
    build(tmp)
    driver_rows, dist_rows = _both_arms(spark, tmp)
    assert driver_rows == dist_rows


def test_mra_default_gate_uses_driver_arm_on_testdata(spark):
    """The gate must actually fire on the realistic corpus (5 event
    types << 64) — if the threshold constant regresses, the measured
    win silently disappears."""
    assert QCE._MRA_DRIVER_MAX_CHANNELS >= 5


# ---------------------------------------------------------------------------
# with_pair_fold: the r12 codegen fast path for pairwise vector folds.
# The unrolled expression MUST be bit-identical to the zip_with/aggregate
# HOF on every input class — same left fold, same IEEE order — and the
# DataFrame-level split must route every row class to a correct arm.
# ---------------------------------------------------------------------------

_ADVERSARIAL_VECS = [
    # (label, a, b)
    ("random", [((7 * i + 3) % 13 - 6) / 7.0 for i in range(64)],
     [((5 * i + 1) % 11 - 5) / 3.0 for i in range(64)]),
    ("neg-zero-a", [-0.0] * 64, [0.0] * 64),
    ("neg-zero-b", [0.0] * 64, [-0.0] * 64),
    ("nan", [float("nan")] * 64, [1.0] * 64),
    ("inf", [float("inf")] * 64, [-1.0] * 64),
    ("short-equal", [1.5] * 3, [0.5] * 3),
    ("ragged", [1.0] * 64, [1.0] * 3),
    ("null-array", None, [1.0] * 64),
    ("null-elem", [None if i == 5 else 1.0 for i in range(64)], [1.0] * 64),
]


@pytest.mark.parametrize("kind", ["dot", "sqdist"])
def test_pair_fold_bit_identical_to_hof(spark, kind):
    from pyspark.sql import functions as F

    from dynamodb_stream_processor_2_0_spark.operators import similarity as S

    df = spark.createDataFrame(
        [(i, a, b) for i, (_l, a, b) in enumerate(_ADVERSARIAL_VECS)],
        "id long, a array<double>, b array<double>",
    )
    ref = df.select(
        "id", F.expr(f"cast({S._fold_hof_sql(kind, 'a', 'b')} as string)").alias("v")
    )
    got = S.with_pair_fold(df, "a", "b", "_out", kind=kind).select(
        "id", F.expr("cast(_out as string)").alias("v")
    )
    ref_rows = {r["id"]: r["v"] for r in ref.collect()}
    got_rows = {r["id"]: r["v"] for r in got.collect()}
    assert got_rows == ref_rows  # string form distinguishes -0.0/NaN/NULL


def test_pair_fold_int_dot_matches_hof(spark):
    from pyspark.sql import functions as F

    from dynamodb_stream_processor_2_0_spark.operators import similarity as S

    rows = [
        (0, [1] * 64, [2] * 64),
        (1, [-(3**5)] * 64, [7] * 64),
        (2, [1] * 3, [1] * 3),          # short equal
        (3, [1] * 64, [1] * 5),          # ragged
        (4, None, [1] * 64),             # null array
        (5, [None if i == 9 else 1 for i in range(64)], [1] * 64),
    ]
    df = spark.createDataFrame(rows, "id long, a array<bigint>, b array<bigint>")
    ref = {r["id"]: r["v"] for r in df.select(
        "id", F.expr(S._fold_hof_sql("int_dot", "a", "b")).alias("v")).collect()}
    got = {r["id"]: r["v"] for r in S.with_pair_fold(
        df, "a", "b", "_out", kind="int_dot").select(
        "id", F.col("_out").alias("v")).collect()}
    assert got == ref


def test_pair_folds_single_split_multi_output(spark):
    from pyspark.sql import functions as F

    from dynamodb_stream_processor_2_0_spark.operators import similarity as S

    df = spark.createDataFrame(
        [(i, a, b) for i, (_l, a, b) in enumerate(_ADVERSARIAL_VECS)],
        "id long, a array<double>, b array<double>",
    )
    got = S.with_pair_folds(
        df, [("a", "b", "d1", "dot"), ("a", "a", "d2", "dot")]
    )
    ref = df.select(
        "id",
        F.expr(f"cast({S._fold_hof_sql('dot', 'a', 'b')} as string)").alias("d1"),
        F.expr(f"cast({S._fold_hof_sql('dot', 'a', 'a')} as string)").alias("d2"),
    )
    g = {r["id"]: (r["d1"], r["d2"]) for r in got.select(
        "id", F.expr("cast(d1 as string)").alias("d1"),
        F.expr("cast(d2 as string)").alias("d2")).collect()}
    r = {x["id"]: (x["d1"], x["d2"]) for x in ref.collect()}
    assert g == r
    # the split must not drop or duplicate rows
    assert got.count() == df.count()
