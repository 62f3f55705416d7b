"""Format-agnostic batch IO: one reader/writer surface over the file
formats the engine supports (parquet / json-lines / csv / orc).

Reference analog: the reference's only sources/sinks are service APIs
(DynamoDB stream in, SQS out — index.js:34-101, 570-611); a Spark
engine replaces them with storage formats. Parquet is the primary
(columnar, predicate pushdown, column pruning); JSON-lines is the
S3-envelope sink format (`to_json` bodies, one document per line);
CSV exists for interop ingest.

Scale notes: every reader takes an explicit schema — at 100 TB schema
inference is a full extra pass over the data (and for CSV/JSON is also
a correctness hazard). The writer partitions by columns so downstream
scans prune; `maxRecordsPerFile` bounds file sizes for object stores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

READ_FORMATS = ("parquet", "json", "csv", "orc")


def read_batch(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read a batch DataFrame from ``path``.

    Schema is required for json/csv (no inference pass at scale);
    parquet/orc carry their own. CSV defaults: header on, standard
    quoting."""
    if fmt not in READ_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {READ_FORMATS}")
    reader = spark.read.format(fmt)
    if fmt in ("json", "csv"):
        if schema is None:
            raise ValueError(f"{fmt} requires an explicit schema (no inference at scale)")
        reader = reader.schema(schema)
        if fmt == "csv":
            reader = reader.option("header", options.pop("header", "true"))
    elif schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_batch(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    **options: str,
) -> None:
    """Write ``df`` to ``path``. ``partition_by`` produces the
    hive-style directory layout that downstream scans partition-prune
    on; ``max_records_per_file`` bounds object sizes."""
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if fmt == "csv":
        writer = writer.option("header", options.pop("header", "true"))
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


# All staging dirs created by staged_tmpdir, cleaned by ONE atexit
# handler, registered unconditionally at import (a no-op on an empty
# list). A single module-level registry instead of one atexit entry
# per call keeps long-lived driver processes from accumulating
# unbounded atexit entries, and makes the cleanup order explicit:
# nothing is deleted until the one handler runs, so a Spark read of a
# cached staged path can never race an earlier per-dir hook during
# interpreter shutdown. Import-time registration also removes the
# check-then-set race a lazy flag would have if plans ever staged from
# worker threads (list.append itself is atomic under the GIL).
_STAGED_DIRS: list[str] = []


def _cleanup_staged_dirs() -> None:
    import shutil

    for path in _STAGED_DIRS:
        shutil.rmtree(path, ignore_errors=True)
    _STAGED_DIRS.clear()


import atexit as _atexit  # noqa: E402  (after the handler it registers)

_atexit.register(_cleanup_staged_dirs)


def staged_tmpdir(prefix: str) -> str:
    """mkdtemp tracked for a single atexit cleanup.

    Every staging directory the query plans materialize (format
    round-trips, harmonization shards, sink outputs, checkpoints) is
    process-scoped scratch: callers cache the path for the life of the
    process, so the only correct deletion point is interpreter exit.
    Tracking the dirs in one registry keeps staged shard copies from
    leaking across sessions without registering one atexit hook per
    call.
    """
    import tempfile

    path = tempfile.mkdtemp(prefix=prefix)
    _STAGED_DIRS.append(path)
    return path
