"""Custom *streaming* Python data source: a deterministic event generator.

Completes the source surface with PySpark 4's streaming DataSource API
(`pyspark.sql.datasource.SimpleDataSourceStreamReader`): where
`sources/dbf.py` shows the batch reader protocol, this shows the
offset-tracked streaming protocol —

    spark.readStream.format("eventgen")
         .option("rows_per_batch", 100).load()

Offsets are plain dicts checkpointed by the engine; `read(start)` returns
(rows, next_offset) and `readBetweenOffsets` replays a committed range
after restart, which is exactly the replayability contract an
exactly-once file/queue connector implements.  Rows are a deterministic
function of their index (seeded hash), so tests — and restarted queries —
always see identical data.

Used in tests as an infinite-yet-reproducible event firehose without
touching the filesystem; at production scale the same skeleton wraps any
cursor/offset-capable service (a queue, a CDC slot, an HTTP feed).
"""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_EPOCH = dt.datetime(2024, 1, 1, 0, 0, 0)
_TYPES = ("view", "click", "purchase", "error")


def _row(i: int):
    """Deterministic event #i (stable across runs and replays)."""
    h = int.from_bytes(
        hashlib.md5(str(i).encode()).digest()[:8], "big", signed=False
    )
    return (
        i,
        _EPOCH + dt.timedelta(seconds=i),
        h % 50,
        _TYPES[(h >> 8) % len(_TYPES)],
        round((h % 10_000) / 100.0, 2),
    )


class EventGenStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        lo = start["i"]
        hi = lo + self.rows_per_batch
        return (iter([_row(i) for i in range(lo, hi)]), {"i": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay after restart: identical rows for a committed range
        return iter([_row(i) for i in range(start["i"], end["i"])])


class EventGenDataSource(DataSource):
    """`format("eventgen")` — streaming-only deterministic event source."""

    @classmethod
    def name(cls) -> str:
        return "eventgen"

    def schema(self) -> StructType:
        return StructType(
            [
                StructField("event_id", LongType()),
                StructField("ts", TimestampType()),
                StructField("user_id", LongType()),
                StructField("event_type", StringType()),
                StructField("value", DoubleType()),
            ]
        )

    def simpleStreamReader(self, schema: StructType):
        return EventGenStreamReader(self.options)


def register_eventgen(spark) -> None:
    spark.dataSource.register(EventGenDataSource)
