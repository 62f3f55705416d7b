"""First-class Spark 4 Python DataSource for the reference's wire
format: ``spark.read.format("dynamodb_stream_wire")``.

The reference's input is a Lambda event whose ``Records[]`` each carry
one DynamoDB stream record (index.js:34-43). This module packages that
ingest as a registerable Spark data source: shard directories become
``InputPartition``s (one reader task per shard, the Kinesis-shard
parallelism model), and each partition yields raw wire records. The
source intentionally emits the RAW ``record_json`` — typed projection
stays in the JVM expression layer (``dynamodb_stream.decode_records``
/ ``parse_new_image``), mirroring how real connectors split transport
from parsing, and keeping the per-row Python work to line IO only.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class WireShardPartition(InputPartition):
    def __init__(self, shard: int, files: list[str]):
        self.shard = shard
        self.files = files


class DynamoDBWireDataSource(DataSource):
    """Batch source over a staged wire directory laid out as
    ``<path>/shard=<i>/part-*.txt`` (one JSON wire record per line)."""

    @classmethod
    def name(cls) -> str:
        return "dynamodb_stream_wire"

    def schema(self) -> str:
        return "shard int, record_json string"

    def reader(self, schema) -> "DynamoDBWireReader":
        return DynamoDBWireReader(dict(self.options))


class DynamoDBWireReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("dynamodb_stream_wire: 'path' option is required")
        self.path = path

    def partitions(self) -> list[WireShardPartition]:
        """One InputPartition per shard directory — the planner sees the
        shard count, so reader parallelism == shard count regardless of
        file sizes (the stream-shard model, not the byte-split model)."""
        parts = []
        for entry in sorted(os.listdir(self.path)):
            if not entry.startswith("shard="):
                continue
            shard_dir = os.path.join(self.path, entry)
            files = sorted(
                os.path.join(shard_dir, f)
                for f in os.listdir(shard_dir)
                if not f.startswith(("_", "."))
            )
            parts.append(WireShardPartition(int(entry.split("=", 1)[1]), files))
        if not parts:
            raise ValueError(
                f"dynamodb_stream_wire: no shard=* dirs under {self.path}"
            )
        return parts

    def read(self, partition: WireShardPartition):
        for fpath in partition.files:
            with open(fpath, encoding="utf-8") as fh:
                for line in fh:
                    line = line.rstrip("\n")
                    if line:
                        yield (partition.shard, line)


_REGISTERED: set[int] = set()
_JSONL_STAGE: dict[str, str] = {}


def register_wire_datasource(spark) -> None:
    """Idempotent per-session registration."""
    sid = id(spark)
    if sid not in _REGISTERED:
        spark.dataSource.register(DynamoDBWireDataSource)
        _REGISTERED.add(sid)


def staged_wire_jsonl(spark, sf_dir: str, n_shards: int = 8) -> str:
    """Stage the synthetic events as sharded wire JSONL once per
    (process, sf_dir): ``shard = event_id % n_shards`` models the
    stream's hash-partitioned shards; encode is test scaffolding, the
    source under test is the read path."""
    if sf_dir not in _JSONL_STAGE:
        import tempfile

        from pyspark.sql import functions as F

        from dynamodb_stream_processor_2_0_spark.sources.catalog import load_table
        from dynamodb_stream_processor_2_0_spark.sources.dynamodb_stream import (
            events_as_stream_json,
        )

        path = tempfile.mkdtemp(prefix="ddb_wire_jsonl_")
        events = load_table(spark, sf_dir, "events")
        (
            events_as_stream_json(events)
            .withColumn("shard", (F.col("event_id") % n_shards).cast("int"))
            .select("shard", F.col("record_json").alias("value"))
            .repartition("shard")
            .write.mode("overwrite")
            .partitionBy("shard")
            .text(path)
        )
        _JSONL_STAGE[sf_dir] = path
    return _JSONL_STAGE[sf_dir]
