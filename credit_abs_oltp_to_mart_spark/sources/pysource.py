"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

The reference's only "source" is a Postgres table kept fresh by an external
generator process (pg_oltp_synth.py:144-194). This source removes the
external dependency entirely: ``spark.read.format("credit_synth")`` plans N
input partitions, each worker generates its slice of deterministic
loan-event rows on demand, and an equality/IN filter on ``product_type``
pushes INTO the source (the worker never materializes pruned rows). That is
the same contract a JDBC/warehouse connector honors — demonstrated here
with generation instead of IO, in Arrow batches (vectorized, not
row-at-a-time tuples).

Determinism: every value is a pure function of (seed, event_id) via the
same split-mix style integer hashing the distributed generator uses —
results are independent of partition count and scheduling.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

PRODUCT_TYPES = [
    "consumer", "mortgage", "auto", "sme", "credit_card", "overdraft",
]
_SCHEMA = (
    "event_id bigint, loan_id bigint, product_type string, "
    "amount double, days_past_due int"
)


def _mix64(x: int) -> "object":
    """splitmix64 finalizer, vectorized over a numpy uint64 array."""
    import numpy as np

    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


class _SlicePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class CreditSynthReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 10_000))
        self.n_parts = int(options.get("numpartitions", 8))
        self.seed = int(options.get("seed", 42))
        self.keep_products: list[str] | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("product_type",)
            ):
                self.keep_products = [f.value]
            elif isinstance(f, In) and f.attribute == ("product_type",):
                self.keep_products = list(f.value)
            else:
                yield f  # not handled here — Spark keeps it

    def partitions(self):
        per = -(-self.n_rows // self.n_parts)
        return [
            _SlicePartition(i * per, min((i + 1) * per, self.n_rows))
            for i in range(self.n_parts)
            if i * per < self.n_rows
        ]

    def read(self, partition: _SlicePartition):
        import numpy as np
        import pyarrow as pa

        ids = np.arange(partition.start, partition.end, dtype=np.uint64)
        h = _mix64(ids + np.uint64(self.seed) * np.uint64(0x100000001))
        product_idx = (h % np.uint64(len(PRODUCT_TYPES))).astype(np.int64)
        h2 = _mix64(h)
        amount = np.round(
            500.0 + (h2 % np.uint64(1_000_000)).astype(np.float64) / 20.0, 2
        )
        h3 = _mix64(h2)
        dpd = np.where(
            (h3 % np.uint64(100)) < np.uint64(18),
            (h3 % np.uint64(180)).astype(np.int32),
            np.int32(0),
        ).astype(np.int32)
        products = np.array(PRODUCT_TYPES, dtype=object)[product_idx]
        mask = np.ones(len(ids), dtype=bool)
        if self.keep_products is not None:
            mask = np.isin(products, self.keep_products)
        batch = pa.record_batch(
            {
                "event_id": pa.array(ids[mask].astype(np.int64)),
                "loan_id": pa.array(
                    (ids[mask] % np.uint64(997)).astype(np.int64)
                ),
                "product_type": pa.array(products[mask]),
                "amount": pa.array(amount[mask]),
                "days_past_due": pa.array(dpd[mask]),
            }
        )
        yield batch


class CreditSynthStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream of the same deterministic feed.

    Offsets are plain row counters (``{"pos": n}``) — exactly the Kafka
    offset/file-position contract: every batch reads
    [pos, pos + rowsPerBatch), replays are idempotent, and a restart from
    a checkpointed offset regenerates identical rows because values are
    pure functions of (seed, id)."""

    def __init__(self, options):
        self.per_batch = int(options.get("rowsperbatch", 1000))
        self.seed = int(options.get("seed", 42))
        self._inner = CreditSynthReader(
            {"rows": "0", "seed": str(self.seed)}
        )

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        end = {"pos": start["pos"] + self.per_batch}
        rows = self._rows(start["pos"], end["pos"])
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["pos"], end["pos"]))

    def _rows(self, lo: int, hi: int):
        import pyarrow as pa

        batches = list(self._inner.read(_SlicePartition(lo, hi)))
        tbl = pa.Table.from_batches(batches)
        return list(zip(*(c.to_pylist() for c in tbl.columns)))


class CreditSynthDataSource(DataSource):
    """``spark.read.format("credit_synth").option("rows", N).load()`` or
    ``spark.readStream.format("credit_synth").option("rowsPerBatch", N)``."""

    @classmethod
    def name(cls) -> str:
        return "credit_synth"

    def schema(self) -> str | StructType:
        return _SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return CreditSynthReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return CreditSynthStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(CreditSynthDataSource)
