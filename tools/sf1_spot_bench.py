"""sf1.0 spot-bench: validate SCALE.md §8's growth rows at a REAL
materialized size jump (r10 verdict item 4b).

The §8 rows come from in-memory 10x unions. This tool materializes a
true sf1.0-shaped dataset to parquet (10 id-shifted copies of every
sf0.1 table, join keys shifted CONSISTENTLY across tables, content
columns perturbed per copy so dedup/ANN queries see near-neighbors,
not 10 exact clones of everything) and runs the N most expensive
sweep queries end-to-end — real scan, real shuffle sizes, realistic
distributions — warm at sf0.1 and at the synthetic sf1.0.

Pass criterion: time growth at most ~linear in rows (<= ~10x at 10x
rows on fixed cores; most queries should sit well below because sf0.1
underutilizes 32 threads).

Usage: python tools/sf1_spot_bench.py [n_queries] [out.json]
       python tools/sf1_spot_bench.py --queries name1,name2 [out.json]
The --queries form spot-checks an explicit list (e.g. re-measuring a
rewritten query that no longer ranks in the expensive top-N).
The synthetic dataset is cached at /tmp/sf1.0_synth (delete to rebuild).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

SF01 = "/root/testdata/sf0.1"
SYNTH = Path("/tmp/sf1.0_synth")
N_COPIES = 10

# join-key strides, consistent across every table that carries the key
STRIDES = {
    "o_orderkey": 10**9,
    "l_orderkey": 10**9,
    "o_custkey": 10**8,
    "c_custkey": 10**8,
    "l_suppkey": 10**7,
    "s_suppkey": 10**7,
    "l_partkey": 2 * 10**7,
    "p_partkey": 2 * 10**7,
    "event_id": 10**9,
    "user_id": 10**8,
    "doc_id": 10**7,
    "vec_id": 10**7,
}

# tiny dims stay 1x so FK targets remain valid (copies reuse them)
SCALED_TABLES = [
    "lineitem",
    "orders",
    "customer",
    "supplier",
    "part",
    "events",
    "documents",
    "embeddings",
]
PASSTHROUGH_TABLES = ["nation", "region"]


def materialize(spark) -> None:
    from pyspark.sql import functions as F

    SYNTH.mkdir(parents=True, exist_ok=True)
    from dynamodb_stream_processor_2_0_spark.sources.catalog import load_table

    # Skip keys on the _SUCCESS marker INSIDE the table dir, not the dir
    # itself: Spark creates the dir before the write completes, so a run
    # killed mid-write leaves a partial table that a dir-exists check
    # would silently treat as complete, skewing growth numbers (r11
    # ADVICE). mode("overwrite") rewrites any _SUCCESS-less partial.
    for name in PASSTHROUGH_TABLES:
        out = SYNTH / f"{name}.parquet"
        if (out / "_SUCCESS").exists():
            continue
        df = spark.read.parquet(f"{SF01}/{name}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(str(out))

    for name in SCALED_TABLES:
        out = SYNTH / f"{name}.parquet"
        if (out / "_SUCCESS").exists():
            continue
        base = spark.read.parquet(f"{SF01}/{name}.parquet")
        cols = set(base.columns)
        parts = []
        for i in range(N_COPIES):
            c = base
            for col, stride in STRIDES.items():
                if col in cols and i > 0:
                    c = c.withColumn(col, F.col(col) + F.lit(i * stride))
            # content perturbation: copies are NEAR neighbors, not clones
            if name == "documents" and i > 0:
                c = c.withColumn(
                    "text",
                    F.when(
                        F.col("text").isNotNull(),
                        F.concat(F.col("text"), F.lit(f" copytag{i}")),
                    ),
                ).withColumn("n_chars", F.length("text").cast("long"))
            if name == "embeddings" and i > 0:
                # nudge the first component by a per-copy epsilon: keeps
                # norms ~equal, breaks exact duplication for ANN/dedup
                c = c.withColumn(
                    "embedding",
                    F.concat(
                        F.array(
                            (F.element_at("embedding", 1) + F.lit(i * 1e-3)).cast(
                                "float"
                            )
                        ),
                        F.slice("embedding", 2, 10**6),
                    ),
                )
            parts.append(c)
        full = parts[0]
        for c in parts[1:]:
            full = full.unionByName(c)
        full.repartition(32).write.mode("overwrite").parquet(str(out))
        n = spark.read.parquet(str(out)).count()
        print(f"materialized {name}: {n} rows", flush=True)


def main() -> None:
    explicit: list[str] | None = None
    args = sys.argv[1:]
    if args and args[0] == "--queries":
        explicit = [q for q in args[1].split(",") if q]
        args = args[2:]
        n_queries = len(explicit)
        out_path = args[0] if args else "tools/sf1_spot_bench.json"
    else:
        n_queries = int(args[0]) if args else 10
        out_path = args[1] if len(args) > 1 else "tools/sf1_spot_bench.json"

    from dynamodb_stream_processor_2_0_spark.plans import registry
    from dynamodb_stream_processor_2_0_spark.session import get_spark

    spark = get_spark("sf1-spot-bench")
    spark.sparkContext.setLogLevel("ERROR")

    materialize(spark)

    if explicit is not None:
        top = explicit
    else:
        bench = json.loads((REPO_ROOT / "BENCH_full_latest.json").read_text())
        top = [
            k
            for k, _ in sorted(
                bench["steady_sec"].items(), key=lambda kv: -kv[1]
            )[:n_queries]
        ]

    registry._load()
    results = {}
    for name in top:
        fn = registry.REGISTRY[name].fn
        row = {}
        for label, sf_dir in (("sf0.1", SF01), ("sf1.0", str(SYNTH))):
            times = []
            for _ in range(2):  # warm-up + measured
                t0 = time.monotonic()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                times.append(time.monotonic() - t0)
            row[label] = round(times[-1], 3)
        row["growth"] = (
            round(row["sf1.0"] / row["sf0.1"], 2) if row["sf0.1"] else None
        )
        results[name] = row
        print(
            f"{name}: {row['sf0.1']:.2f}s -> {row['sf1.0']:.2f}s "
            f"({row['growth']}x at {N_COPIES}x rows)",
            flush=True,
        )

    Path(out_path).write_text(
        json.dumps(
            {"n_copies": N_COPIES, "queries": results}, indent=1
        )
        + "\n"
    )
    print(json.dumps({"wrote": out_path, "n": len(results)}))


if __name__ == "__main__":
    main()
