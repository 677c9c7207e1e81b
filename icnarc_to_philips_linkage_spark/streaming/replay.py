"""Event-replay streaming source (Spark 4 Python DataSource streaming
API): replays a parquet events table as a structured stream in
deterministic event-time order, ``batchSize`` rows per micro-batch —
the backtesting harness for streaming pipelines (drive the EXACT
production query over historical data, watermarks and all, without a
live feed).

    spark.dataSource.register(EventReplaySource)
    spark.readStream.format("event_replay")
         .option("path", ".../events.parquet")
         .option("batchSize", "1000").load()

Offset model: the offset is a ROW INDEX into the (ts, tiebreak)-ordered
table — monotone, checkpointable, and replayable (the order is total,
so the same offset range always yields the same rows; that is what
makes ``readBetweenOffsets`` exact on recovery). Implemented on
``SimpleDataSourceStreamReader`` because replay progress is a function
of the CHECKPOINTED offset, which this API hands to ``read(start)`` —
the partition-planning API's ``latestOffset()`` takes no start, so a
restarted reader couldn't know where the stream left off. Reads slice
the ordered table with LIMIT/OFFSET through DuckDB — an O(n log n)
sort per batch, the deliberate price of a tool that must replay in
event order regardless of file layout (a range-sorted layout,
sources/layout.py, makes the sort a merge).

An ``availableNow`` run processes one batch per trigger and
checkpoints; repeated runs (or a continuous trigger) drain the table
incrementally and resume exactly after restarts.
"""

from __future__ import annotations

import re

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)

EVENTS_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)

# orderBy is interpolated into SQL, so it is restricted to a
# comma-list of plain identifiers with optional ASC/DESC — anything
# else (quotes, parens, subqueries) is rejected up front rather than
# passed through to DuckDB
_ORDER_TERM = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\s+(?i:asc|desc))?$")


def _validated_order_by(spec: str) -> str:
    terms = [t.strip() for t in spec.split(",")]
    if not terms or not all(_ORDER_TERM.fullmatch(t) for t in terms):
        raise ValueError(
            "orderBy must be a comma-list of column identifiers "
            f"(optionally ASC/DESC), got: {spec!r}"
        )
    return ", ".join(terms)


class EventReplayReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("event_replay requires .option('path', ...)")
        self.batch = int(options.get("batchsize", 1000))
        self.order_by = _validated_order_by(
            options.get("orderby", "ts, event_id")
        )
        import duckdb

        # path goes through read_parquet(?) as a bind parameter — a
        # quote in the file path can't break out of the SQL string
        self.n_rows = duckdb.execute(
            "SELECT COUNT(*) FROM read_parquet(?)", [self.path]
        ).fetchone()[0]

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def _slice(self, start: int, end: int):
        import duckdb

        if end <= start:
            return iter(())
        rows = duckdb.execute(
            f"SELECT * FROM read_parquet(?) ORDER BY {self.order_by} "
            f"LIMIT {end - start} OFFSET {start}",
            [self.path],
        ).fetchall()
        return iter([tuple(r) for r in rows])

    def read(self, start: dict):
        s = start["idx"]
        e = min(s + self.batch, self.n_rows)
        return self._slice(s, e), {"idx": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        # exact replay of a previously planned batch (recovery path):
        # total ordering makes the slice deterministic
        return self._slice(start["idx"], end["idx"])

    def commit(self, end: dict) -> None:
        pass


class EventReplaySource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "event_replay"

    def schema(self) -> str:
        return self.options.get("schema", EVENTS_DDL)

    def simpleStreamReader(self, schema) -> EventReplayReader:
        return EventReplayReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(EventReplaySource)
