"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's pipeline is stateless, but a CDC consumer almost always
wants keyed state next: first-seen dedup (at-least-once Kafka delivery
re-sends records) and latest-value compaction (T24 sends whole-record
images; the sink wants the newest per RECID). Both are implemented as
grouped-state operators — state is partitioned by key, so they scale
horizontally like any shuffle; with a watermark the state is bounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def streaming_first_seen_dedup(
    df: DataFrame,
    key_col: str = "recid",
    timeout_ms: int | None = None,
) -> DataFrame:
    """Emit each key's FIRST record only (exactly-once dedup over an
    at-least-once stream). State per key is one boolean; with
    ``timeout_ms`` state expires after inactivity (bounded state for
    unbounded key spaces — the 100 TB knob)."""
    out_schema = df.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.exists
        if not seen:
            for pdf in pdfs:
                if len(pdf) > 0:
                    yield pdf.head(1)
                    break
            state.update((True,))
        else:
            for _ in pdfs:  # drain
                pass
        if timeout_ms:
            # MUST re-arm on every invocation: Spark clears a pending
            # timeout whenever the function runs for a key, so arming
            # only on first sight would leave re-delivered keys
            # resident forever (unbounded state)
            state.setTimeoutDuration(timeout_ms)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )


def batch_first_seen_dedup(df: DataFrame, key_col: str = "recid", order_col: str | None = None) -> DataFrame:
    """Batch twin of :func:`streaming_first_seen_dedup` for parity
    testing and backfills: keep one row per key (the ``order_col``-first
    row when given, else an arbitrary-but-single row, matching
    dropDuplicates semantics)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if order_col is None:
        return df.dropDuplicates([key_col])
    w = Window.partitionBy(key_col).orderBy(F.asc(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def streaming_running_totals(
    df: DataFrame,
    key_col: str,
    value_col: str,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key running count + sum over an unbounded stream, emitted
    once per key per micro-batch (update semantics through an append
    operator: downstream sinks key on ``key_col`` and keep the latest).
    The CDC shape this serves: continuously-maintained per-account
    totals over the T24 entry stream.

    State per key is two numbers — O(distinct keys) total, partitioned
    by key like any shuffle, optionally TTL-bounded via ``timeout_ms``
    (the unbounded-key-space knob, same discipline as
    :func:`streaming_first_seen_dedup`)."""
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)  # re-arm every batch
        yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [total]})

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )


def streaming_tws_running_totals(
    df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key running count + sum via ``transformWithStateInPandas`` —
    the Spark 4 stateful-processor API (SPARK-49564), the successor to
    :func:`streaming_running_totals`'s ``applyInPandasWithState``.

    Why keep both: applyInPandasWithState is the widely-deployed 3.x
    surface; transformWithState is where new state features land
    (typed value/list/map state handles, state TTL, timers, initial
    state). Semantics here are identical to the 3.x twin — one
    (count, sum) ValueState per key, one emission per key per
    micro-batch — so the two are gated against the same batch oracle.

    State is partitioned by the grouping key and sized O(distinct
    keys) × two numbers; the RocksDB state-store provider (the default
    recommendation for transformWithState) keeps it off-heap, which is
    the 100 TB configuration.

    Runtime prerequisites (per PySpark's own dependency matrix): the
    ``protobuf`` Python package (the state-server protocol is protobuf
    over a local socket) and
    ``spark.sql.streaming.stateStore.providerClass`` set to the
    RocksDB provider. The test for this operator skips when protobuf
    is absent (as in this sandbox); the 3.x twin
    :func:`streaming_running_totals` carries the driver-gated
    correctness signal for the same semantics."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n BIGINT, total DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col].sum())
            self._state.update((n, total))
            yield pd.DataFrame({"key": [key[0]], "n": [n], "total": [total]})

        def close(self) -> None:
            pass

    return df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="None",
    )
