"""PySpark-native analytics engine with the query/data-processing
capabilities of retinaxtream/DynamoDB_Stream_Processor-2.0.

The reference (`/root/reference/index.js`) is a stateful CDC stream
processor: change-type filters, typed parse of a dynamic row, multi-layer
exactly-once dedup, validation predicates, business-rule routing with a
disposition ledger, nested-document sink and batch counters. This package
re-expresses that surface — plus the relational closure and
LLM-data-pipeline operators (dedup, similarity search, text analysis) —
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, with
Structured Streaming for the stateful layer.
"""

from dynamodb_stream_processor_2_0_spark.config import EngineConfig
from dynamodb_stream_processor_2_0_spark.session import get_spark

__all__ = ["EngineConfig", "get_spark"]
__version__ = "0.1.0"
