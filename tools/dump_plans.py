"""Dump .explain("formatted") for named queries to text files.

Usage: python tools/dump_plans.py <out_dir> <suffix> <query> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query. Run from any cwd;
imports the repo this file lives in (so a worktree copy dumps the
worktree's plans). Planning only — no jobs are executed.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    out_dir = Path(sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.1"
    out_dir.mkdir(parents=True, exist_ok=True)

    from dynamodb_stream_processor_2_0_spark.plans import registry
    from dynamodb_stream_processor_2_0_spark.session import get_spark

    registry._load()
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spec = registry.REGISTRY[name]
        df = spec.fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {out_dir / f'{name}_{suffix}.txt'}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
