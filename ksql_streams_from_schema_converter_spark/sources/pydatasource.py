"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic CDC generator, registered as format
``t24_synth_cdc``.

The reference ingests T24 CDC from Kafka topics that live outside the
repo (src/controllers/index.js:574,583); tests and demos need a
broker-free source that still behaves like a real connector. The
DataSource V2 Python API gives exactly that surface — schema,
partition planning (parallel generation), predicate pushdown into the
source, and Arrow-batched record production — so the engine exercises
a full connector contract without any external system.

Scale notes: ``partitions()`` splits the sequence range so generation
parallelizes like any scan; ``pushFilters`` accepts ``seq`` bounds and
shrinks the generated range AT THE SOURCE (the driver never plans rows
a filter would discard — the connector analogue of parquet predicate
pushdown, asserted in tests); ``read`` yields ONE pyarrow RecordBatch
per partition (the Arrow fast path — no per-row Python tuples on the
wire).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

_SCHEMA = "seq BIGINT, recid STRING, op STRING, amount BIGINT"


def cdc_row(i: int) -> tuple[int, str, str, int]:
    """The deterministic record for sequence ``i`` — md5-derived so any
    engine can reproduce it (the DuckDB oracle does)."""
    h = hashlib.md5(str(i).encode()).hexdigest()
    c = h[0]
    if c in "01234567":
        op = "UPDATE"
    elif c in "89ab":
        op = "INSERT"
    else:
        op = "DELETE"
    return i, "R" + h[:8], op, int(h[1:5], 16)


@dataclass
class _SeqRange(InputPartition):
    start: int
    end: int  # exclusive


class SyntheticCdcReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", "1000"))
        self.num_partitions = int(options.get("numpartitions", "8"))
        self.lo = 0
        self.hi = self.rows  # exclusive

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Absorb ``seq`` range predicates into the generated range;
        yield back everything else for Spark to evaluate."""
        for f in filters:
            if getattr(f, "attribute", None) == ("seq",):
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, int(f.value))
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, int(f.value) + 1)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, int(f.value))
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
            yield f

    def partitions(self) -> list[_SeqRange]:
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, self.num_partitions)
        step = max(1, -(-(hi - lo) // n))
        return [
            _SeqRange(s, min(s + step, hi)) for s in range(lo, hi, step)
        ] or [_SeqRange(lo, lo)]

    def read(self, partition: _SeqRange):
        import pyarrow as pa

        rows = [cdc_row(i) for i in range(partition.start, partition.end)]
        if not rows:
            return iter(())
        seqs, recids, ops, amounts = zip(*rows)
        batch = pa.record_batch(
            [
                pa.array(seqs, pa.int64()),
                pa.array(recids, pa.string()),
                pa.array(ops, pa.string()),
                pa.array(amounts, pa.int64()),
            ],
            names=["seq", "recid", "op", "amount"],
        )
        return iter([batch])


class SyntheticCdcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "t24_synth_cdc"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> SyntheticCdcReader:
        return SyntheticCdcReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticCdcStreamReader":
        return SyntheticCdcStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the data source on a session, enabling
    Python-source filter pushdown (runtime conf; off by default in
    Spark 4 — without it a reader implementing ``pushFilters`` is
    rejected outright)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(SyntheticCdcDataSource)
    except Exception:
        pass  # already registered on this session


class SyntheticCdcStreamReader(SimpleDataSourceStreamReader):
    """Offset-managed streaming side of the same connector: the offset
    is ``{"seq": N}`` (next unread sequence number), each micro-batch
    emits up to ``batchrows`` records, and ``readBetweenOffsets``
    regenerates any committed range deterministically — which is what
    makes restart recovery exact (same property a Kafka offset range
    has). The Simple reader variant generates on the driver and is the
    right fit for a low-throughput CDC trickle; a partition-planned
    ``DataSourceStreamReader`` is the high-throughput escalation."""

    def __init__(self, options):
        self.rows = int(options.get("rows", "1000"))
        self.batch_rows = int(options.get("batchrows", "250"))

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def read(self, start: dict):
        lo = int(start["seq"])
        hi = min(lo + self.batch_rows, self.rows)
        return iter([cdc_row(i) for i in range(lo, hi)]), {"seq": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([cdc_row(i) for i in range(int(start["seq"]), int(end["seq"]))])

    def commit(self, end: dict) -> None:
        pass  # nothing external to clean up — generation is stateless
