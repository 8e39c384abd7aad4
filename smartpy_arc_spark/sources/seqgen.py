"""Bounded deterministic sequence source (streaming Python data source).

Sibling of ``sources/eventgen.py``: eventgen is the *unbounded*
reproducible event firehose used to exercise restart/replay; this one is
**bounded and closed-form**, so a full drain is oracle-checkable row for
row in plain SQL:

    seq     = 0 .. n_total-1                     (dense, never skips)
    user_id = seq mod n_users
    amount  = (seq * 2654435761) mod 10000       (Knuth hash, exact ints)

After ``n_total`` the offset stops advancing, so a continuous-trigger
drain (``streaming/stream.py:run_stream_until_idle``) terminates
deterministically with exactly the generate_series() relation an oracle
engine can rebuild.  ``readBetweenOffsets`` regenerates any [start, end)
slice — the generator is its own write-ahead log, the replayability
contract of an exactly-once queue/CDC connector.

Options: ``n_total`` (default 1000), ``rows_per_batch`` (default 250),
``n_users`` (default 50).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader


def _gen(start: int, end: int, n_users: int) -> list[tuple]:
    return [
        (seq, seq % n_users, (seq * 2654435761) % 10000)
        for seq in range(start, end)
    ]


class SeqGenStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.n_total = int(options.get("n_total", 1000))
        self.rows_per_batch = int(options.get("rows_per_batch", 250))
        self.n_users = int(options.get("n_users", 50))

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = int(start["seq"])
        hi = min(lo + self.rows_per_batch, self.n_total)
        # iter(list), not a bare generator or list: the runner's prefetch
        # cache copy.copy()s the value (generators aren't copyable) and
        # then next()s it (lists aren't iterators); a list_iterator is both
        return iter(_gen(lo, hi, self.n_users)), {"seq": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # replay for recovery: regenerate the exact [start, end) slice
        return iter(_gen(int(start["seq"]), int(end["seq"]), self.n_users))

    def commit(self, end: dict) -> None:
        pass  # nothing to acknowledge — the generator is stateless


class SeqGenDataSource(DataSource):
    """``spark.readStream.format("seqgen")`` bounded deterministic source."""

    @classmethod
    def name(cls) -> str:
        return "seqgen"

    def schema(self) -> str:
        return "seq long, user_id long, amount long"

    def simpleStreamReader(self, schema) -> SeqGenStreamReader:
        return SeqGenStreamReader(self.options)


def register_seqgen(spark) -> None:
    spark.dataSource.register(SeqGenDataSource)
