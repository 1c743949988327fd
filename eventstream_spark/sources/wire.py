"""Custom Python data source for the reference's wire format.

The reference's source (A1) is a Redis-Stream poll loop yielding
``(message_id, {field: str_value})`` entries, where the entry ID's millis
prefix doubles as event time (reference utilities/communication.py:648-712;
clean_handler_records.py:65-71 for the ID→date rule). This module maps that
onto Spark 4's Python DataSource API — the idiomatic way to teach Spark a
new wire format end-to-end:

- ``spark.read.format("eventwire")`` — batch: one input partition per
  landed file, so a directory of stream dumps scans in parallel.
- ``spark.readStream.format("eventwire")`` — streaming: offsets are the
  set of files consumed; each micro-batch picks up newly landed files
  (the file-tailing twin of the reference's XREADGROUP loop — delivery
  bookkeeping lives in Spark's checkpoint, not in consumer groups).

File encoding: JSON Lines, one stream entry per line:
``{"id": "1712000000000-0", "fields": {"event": "click", "value": "1.5"}}``
Values are all strings (the Redis wire type); typed access happens
downstream via the codec's interpret_* casts (SURVEY §1.3: inference on
read, schema owned by the registry — never per-row guessing inside the
source).

Scale notes: partition-per-file parallelism is bounded by file layout, the
same contract as Spark's own file sources; a production deployment lands
micro-batched dumps (one file per trigger per writer), so partitions stay
balanced. The source never buffers more than one line at a time.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WIRE_SCHEMA = StructType(
    [
        StructField("message_id", StringType()),
        StructField("ts", TimestampType()),
        StructField("fields", MapType(StringType(), StringType())),
    ]
)


def _list_wire_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _dirs, names in os.walk(path):
        for n in sorted(names):
            if n.endswith((".jsonl", ".ndjson", ".wire")) and not n.startswith("."):
                out.append(os.path.join(root, n))
    return sorted(out)


def _ts_from_message_id(message_id: str) -> datetime:
    """Millis prefix of a ``millis-seq`` entry ID → naive UTC timestamp
    (the reference's get_message_date, clean_handler_records.py:65-71).
    Naive because the session runs UTC and the fixtures are tz-naive."""
    millis = int(message_id.split("-", 1)[0])
    return datetime.fromtimestamp(millis / 1000.0, tz=timezone.utc).replace(
        tzinfo=None
    )


def _read_wire_file(fpath: str, page: int = 2000):
    """Yield Arrow RecordBatches of wire rows (columnar hand-off per page —
    the per-row tuple path costs ~0.6 ms/row at the Python-source
    boundary; see redis_stream._arrow_batch for the measurement)."""
    import pyarrow as pa

    def batch(rows):
        return pa.RecordBatch.from_arrays(
            [
                pa.array([r[0] for r in rows], type=pa.string()),
                pa.array([r[1] for r in rows], type=pa.timestamp("us")),
                pa.array(
                    [list(r[2].items()) for r in rows],
                    type=pa.map_(pa.string(), pa.string()),
                ),
            ],
            names=["message_id", "ts", "fields"],
        )

    rows = []
    with open(fpath, "r", encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            entry = json.loads(line)
            mid = str(entry["id"])
            fields = {str(k): str(v) for k, v in entry.get("fields", {}).items()}
            rows.append((mid, _ts_from_message_id(mid), fields))
            if len(rows) >= page:
                yield batch(rows)
                rows = []
    if rows:
        yield batch(rows)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class EventWireBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("eventwire requires a path")

    def partitions(self):
        return [_FilePartition(f) for f in _list_wire_files(self.path)] or [
            _FilePartition("")
        ]

    def read(self, partition: _FilePartition):
        if partition.path:
            yield from _read_wire_file(partition.path)


class EventWireStreamReader(DataSourceStreamReader):
    """File-tailing stream: offset = the sorted list of files already
    consumed. New files between two offsets form the micro-batch — the
    checkpoint replaces the reference's consumer-group bookkeeping
    (exactly-once instead of ack-after-process at-least-once)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("eventwire requires a path")

    def initialOffset(self):
        return {"files": []}

    def latestOffset(self):
        return {"files": _list_wire_files(self.path)}

    def partitions(self, start, end):
        new = [f for f in end["files"] if f not in set(start["files"])]
        return [_FilePartition(f) for f in new] or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if partition.path:
            yield from _read_wire_file(partition.path)

    def commit(self, end):
        pass


class EventWireDataSource(DataSource):
    """``spark.dataSource.register(EventWireDataSource)`` then
    ``spark.read.format("eventwire").option("path", dir).load()``."""

    @classmethod
    def name(cls):
        return "eventwire"

    def schema(self):
        return WIRE_SCHEMA

    def reader(self, schema):
        return EventWireBatchReader(self.options)

    def streamReader(self, schema):
        return EventWireStreamReader(self.options)


def register_eventwire(spark) -> None:
    spark.dataSource.register(EventWireDataSource)
