from dynamodb_stream_processor_2_0_spark.plans.registry import (
    REGISTRY,
    QuerySpec,
    all_queries,
    all_oracle_sql,
    register,
)

__all__ = ["REGISTRY", "QuerySpec", "all_queries", "all_oracle_sql", "register"]
