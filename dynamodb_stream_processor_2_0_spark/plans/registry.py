"""Query registry: one entry per implemented operator (SURVEY.md §2).

Each spec pairs a PySpark plan builder with a DuckDB oracle SQL twin (or
None for genuinely non-SQL-expressible operators, which get a rows-only
check from the driver). The registry is the single source of truth that
``__spark_entry__.queries()`` / ``oracle_sql()`` re-export.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries on import; keep in build-plan order.
_QUERY_MODULES = (
    "dynamodb_stream_processor_2_0_spark.plans.queries_pipeline",
    "dynamodb_stream_processor_2_0_spark.plans.queries_scalar",
    "dynamodb_stream_processor_2_0_spark.plans.queries_relational",
    "dynamodb_stream_processor_2_0_spark.plans.queries_dedup",
    "dynamodb_stream_processor_2_0_spark.plans.queries_text",
    "dynamodb_stream_processor_2_0_spark.plans.queries_multimodal",
    "dynamodb_stream_processor_2_0_spark.plans.queries_udf",
    "dynamodb_stream_processor_2_0_spark.plans.queries_advanced",
    "dynamodb_stream_processor_2_0_spark.plans.queries_temporal_graph",
    "dynamodb_stream_processor_2_0_spark.plans.queries_similarity",
    "dynamodb_stream_processor_2_0_spark.plans.queries_streaming_batch",
)

_loaded = False


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as exc:
            # Allow partial builds: a module listed but not yet written
            # only fails if it's someone else's import error.
            if mod.rsplit(".", 1)[-1] not in str(exc):
                raise
    _loaded = True


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracle_sql() -> dict[str, str]:
    _load()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


def get(name: str) -> QuerySpec:
    _load()
    return REGISTRY[name]
