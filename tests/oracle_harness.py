"""Differential harness mirroring the driver's correctness gate:
run a registry query in Spark and its DuckDB oracle SQL on the same
parquet tables, then compare row-count + column names + values
(order-insensitive, column-name-sorted), strictly — floats must match
bit-exactly, which every registered query is designed to guarantee
(decimal sums, deterministic fold order, rounding at the boundary).
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

from dynamodb_stream_processor_2_0_spark.sources.catalog import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_value(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        return ("float", repr(v))
    if isinstance(v, Decimal):
        # scale-insensitive compare: driver may stringify; we normalize
        # to a canonical exact string so Decimal('1.50') == Decimal('1.5')
        # fails loudly only if values differ numerically.
        return ("dec", str(v.normalize()))
    if isinstance(v, _dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("list", tuple(_norm_value(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, _norm_value(x)) for k, x in v.items())))
    if isinstance(v, (bytes, bytearray)):
        return ("bin", bytes(v).hex())
    return ("str", str(v))


def _normalize_rows(cols: list[str], rows) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_value(row[i]) for i in order) for row in rows]
    out.sort()
    return out


def compare_query(spark, spec, sf_dir: str, limit_diff: int = 5) -> None:
    """Assert the Spark result and DuckDB oracle result are identical."""
    sdf = spec.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connect(sf_dir)
    cur = con.execute(spec.oracle)
    d_cols = [d[0] for d in cur.description]
    d_rows = cur.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{spec.name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{spec.name}: row count mismatch spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn = _normalize_rows(s_cols, s_rows)
    dn = _normalize_rows(d_cols, d_rows)
    if sn != dn:
        diffs = [
            (a, b) for a, b in zip(sn, dn) if a != b
        ][:limit_diff]
        only_s = [r for r in sn if r not in set(dn)][:limit_diff]
        only_d = [r for r in dn if r not in set(sn)][:limit_diff]
        raise AssertionError(
            f"{spec.name}: value mismatch\nfirst diffs: {diffs}\n"
            f"spark-only: {only_s}\nduckdb-only: {only_d}"
        )
