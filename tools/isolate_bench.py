"""Isolated bench-protocol timing for named queries.

Usage: python tools/isolate_bench.py <query> [query ...] [--reps N] [--sf DIR]

Protocol matches bench.py: engine session, warm-up run then min of N
steady runs (default 2) against the noop sink, per-query
setJobDescription labels, shuffle-width + cache reset between queries.
Prints one line per query: name, cold, steady(min), all reps.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    args = sys.argv[1:]
    reps = 2
    sf_dir = "/root/testdata/sf0.1"
    names = []
    it = iter(args)
    for a in it:
        if a == "--reps":
            reps = int(next(it))
        elif a == "--sf":
            sf_dir = next(it)
        else:
            names.append(a)

    from dynamodb_stream_processor_2_0_spark.plans import registry
    from dynamodb_stream_processor_2_0_spark.session import get_spark

    registry._load()
    spark = get_spark("isolate-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    width = spark.conf.get("spark.sql.shuffle.partitions")

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        registry.REGISTRY[name].fn(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        return time.perf_counter() - t0

    for name in names:
        spark.conf.set("spark.sql.shuffle.partitions", width)
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"isolate: {name}")
        cold = run_once(name)
        runs = [run_once(name) for _ in range(reps)]
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: cold={cold:.3f} steady={min(runs):.3f} reps="
            + ",".join(f"{r:.3f}" for r in runs)
        )
    spark.stop()


if __name__ == "__main__":
    main()
