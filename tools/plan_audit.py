"""Regenerate the plan evidence behind SCALE.md's claims.

For each headline query (plus any names passed as arguments), prints
`.explain("formatted")` and a one-line summary of the plan properties
SCALE.md asserts: pushed filters, pruned read schema, broadcast joins,
partial aggregates, whole-stage codegen spans, and the absence of
row-at-a-time Python evaluation.

Usage: python tools/plan_audit.py [query ...]   (default: bench headline)
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    from dynamodb_stream_processor_2_0_spark.plans import registry
    from dynamodb_stream_processor_2_0_spark.session import get_spark

    sys.path.insert(0, str(REPO_ROOT))
    import bench

    names = sys.argv[1:] or bench.HEADLINE
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    registry._load()

    for name in names:
        spec = registry.REGISTRY.get(name)
        if spec is None:
            print(f"== {name}: NOT REGISTERED")
            continue
        if "streaming" in spec.tags:
            print(f"== {name}: streaming query (no static plan) — skipped")
            continue
        df = spec.fn(spark, sf_dir)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        plan = buf.getvalue()
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        pushed = [p for p in pushed if p and not p.isspace()]
        summary = {
            "pushed_filter_scans": len(pushed),
            "broadcast_joins": plan.count("BroadcastHashJoin"),
            "sortmerge_joins": plan.count("SortMergeJoin"),
            "partial_aggs": len(
                re.findall(r"HashAggregate.*partial", plan, re.IGNORECASE)
            )
            + plan.count("partial_"),
            # codegen ids materialize only in the executed (post-AQE)
            # plan; tests/test_plan_shapes.py asserts them after a real
            # action, so this static audit reports logical properties.
            "python_row_eval": plan.count("BatchEvalPython"),
            "arrow_python": plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("PythonMapInArrow"),
        }
        print(f"== {name}: {summary}")
        for p in pushed[:3]:
            print(f"   pushed: [{p[:120]}]")
        if "-v" in sys.argv or "--verbose" in sys.argv:
            print(plan)


if __name__ == "__main__":
    main()
