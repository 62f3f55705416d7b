"""Results must not depend on spark.sql.shuffle.partitions: every
registered batch query is executed at width 7 and width 32 and the
canonicalized outputs compared. Backs COVERAGE.md's
partition-independence claim. Opt-in (SPARK_GRAFT_PARTITION_SWEEP=1) —
it reruns the whole registry twice."""

from __future__ import annotations

import os

import pytest

from dynamodb_stream_processor_2_0_spark.plans import registry


def _specs():
    registry._load()
    # streaming queries scope their own width (and run minutes, not
    # seconds); their determinism is covered by the e2e oracle gates
    return [s for s in registry.REGISTRY.values() if "streaming" not in s.tags]


def _canon(df):
    return sorted(
        tuple(str(v) for v in row)
        for row in df.toPandas()[sorted(df.columns)].itertuples(index=False)
    )


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_PARTITION_SWEEP") != "1",
    reason="set SPARK_GRAFT_PARTITION_SWEEP=1 for the two-width sweep",
)
@pytest.mark.parametrize("spec", _specs(), ids=lambda s: s.name)
def test_width_invariant(spark, sf_dir, spec):
    prior = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        narrow = _canon(spec.fn(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        wide = _canon(spec.fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prior)
    assert narrow == wide, f"{spec.name}: output depends on shuffle width"
