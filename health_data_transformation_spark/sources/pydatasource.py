"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic-activity generator with real partition planning.

The reference's only sources are two CSV shapes (SURVEY.md §2.1); this
supplies the "custom connector" capability — the API a team uses to
expose an internal feed (billing exports, device telemetry, a REST
paginator) as a first-class parallel scan.  The demonstration source
generates rows from a seeded md5 stream so the DuckDB oracle can
recompute the identical table from ``range(n)`` — making a *connector*
differentially testable, which file-based fixtures cannot do for
arbitrary feeds.

Scale shape: ``partitions()`` splits the row space into ``shards``
contiguous ranges — Spark schedules one task per shard, so read
parallelism is declared by the source exactly like file splits; each
``read`` streams tuples, never materializing the shard.  A real feed
connector swaps the md5 arithmetic for API pagination with the same
partition contract (one page range per InputPartition).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

KINDS = ("view", "click", "purchase")


def _h60(s: str) -> int:
    """First 15 hex digits of md5 as int — matches functions.text.hex_hash64
    and the DuckDB expression CAST(('0x' || substr(md5(s),1,15)) AS BIGINT)."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@dataclass
class _Shard(InputPartition):
    start: int
    end: int


class SyntheticActivityDataSource(DataSource):
    """spark.read.format("synthetic_activity").option("rows", N)
    .option("shards", K).load()"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_activity"

    def schema(self) -> str:
        return "row_id BIGINT, user_id BIGINT, kind STRING, amount_cents BIGINT"

    def reader(self, schema) -> "SyntheticActivityReader":
        return SyntheticActivityReader(self.options)


class SyntheticActivityReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", 10_000))
        self.shards = max(1, int(options.get("shards", 8)))

    def partitions(self):
        step = -(-self.rows // self.shards)  # ceil
        return [
            _Shard(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _Shard):
        for i in range(partition.start, partition.end):
            h = _h60(str(i))
            yield (i, h % 1000, KINDS[h % 3], h % 100_000)


def register(spark) -> None:
    """Idempotently register the source with a session.

    Only the "already registered" collision is swallowed; any other
    failure (e.g. the Python DataSource API missing on an older
    runtime) propagates so the root cause surfaces here, not as a
    confusing "format not found" later at read time.
    """
    try:
        spark.dataSource.register(SyntheticActivityDataSource)
    except Exception as exc:  # noqa: BLE001 - filtered by message below
        msg = str(exc).lower()
        if "already" in msg and ("exist" in msg or "register" in msg):
            return
        raise
