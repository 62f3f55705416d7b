"""Controlled experiment: does a query family's measured time depend on
its POSITION in the bench sweep?

Round-6 flagged the TEXT family measuring ~2x slower in the closing
full sweep than at a mid-round checkpoint despite byte-identical plans.
Hypothesis: profile-guided JIT — a query timed after ~250 other plans
have compiled the common operator paths sees different (sometimes
WORSE, due to deopt/recompilation churn and code-cache pressure) JIT
state than the same query timed on a freshly warmed JVM.

Protocol (each arm is its OWN subprocess, i.e. a fresh JVM):
  EARLY: warm trivially, then time the text family (min of 2 post-
         warm-up runs per query, bench.py's protocol).
  LATE:  first run N_PRELUDE other queries once each (registry order,
         text family excluded), then time the text family identically.

Prints one JSON line {query: {"early": s, "late": s, "ratio": r}} plus
a summary. Commit the observed numbers to SCALE.md.

Usage: python tools/text_position_experiment.py [n_prelude]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent

_ARM_SCRIPT = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from dynamodb_stream_processor_2_0_spark.plans import registry
from dynamodb_stream_processor_2_0_spark.session import get_spark

registry._load()
arm = {arm!r}
n_prelude = {n_prelude}
sf_dir = {sf_dir!r}

spark = get_spark("text-pos-" + arm)
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(f"{{sf_dir}}/region.parquet").count()

text_family = sorted(
    n for n, s in registry.REGISTRY.items()
    if "text" in s.tags and "streaming" not in s.tags
)

def run_once(name):
    t0 = time.perf_counter()
    registry.REGISTRY[name].fn(spark, sf_dir).write.mode(
        "overwrite").format("noop").save()
    return time.perf_counter() - t0

session_width = spark.conf.get("spark.sql.shuffle.partitions")

if arm == "late":
    prelude = [n for n, s in registry.REGISTRY.items()
               if n not in set(text_family)
               and "streaming" not in s.tags][:n_prelude]
    for n in prelude:
        spark.conf.set("spark.sql.shuffle.partitions", session_width)
        spark.catalog.clearCache()
        run_once(n)

out = {{}}
for n in text_family:
    spark.conf.set("spark.sql.shuffle.partitions", session_width)
    spark.catalog.clearCache()
    run_once(n)  # warm-up
    out[n] = round(min(run_once(n), run_once(n)), 3)
print("ARM_RESULT " + json.dumps(out))
"""


def run_arm(arm: str, n_prelude: int, sf_dir: str) -> dict[str, float]:
    script = _ARM_SCRIPT.format(
        repo=str(REPO_ROOT), arm=arm, n_prelude=n_prelude, sf_dir=sf_dir
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        check=True,
        cwd=str(REPO_ROOT),
    )
    for line in proc.stdout.splitlines():
        if line.startswith("ARM_RESULT "):
            return json.loads(line[len("ARM_RESULT "):])
    raise RuntimeError(f"no ARM_RESULT in {arm} output:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


def main() -> None:
    n_prelude = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    early = run_arm("early", 0, sf_dir)
    late = run_arm("late", n_prelude, sf_dir)
    rows = {}
    for n in sorted(early):
        e, l = early[n], late.get(n)
        rows[n] = {"early": e, "late": l,
                   "ratio": round(l / e, 2) if e else None}
    te, tl = sum(early.values()), sum(late.values())
    summary = {
        "n_prelude": n_prelude,
        "sf_dir": sf_dir,
        "family_total_early_sec": round(te, 3),
        "family_total_late_sec": round(tl, 3),
        "family_ratio_late_over_early": round(tl / te, 3),
    }
    print(json.dumps({"summary": summary, "queries": rows}, indent=1))


if __name__ == "__main__":
    main()
