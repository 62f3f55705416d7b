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
