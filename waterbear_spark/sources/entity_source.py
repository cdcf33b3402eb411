"""Custom Python DataSource (Spark 4 DataSource API): synthetic entity
records as a first-class ``spark.read.format(...)`` source.

The reference generates test data driver-side only
(/root/reference/waterbear/generator.py:6-103). Here the same generator
becomes a planned, partitioned source: Spark asks for N partitions, each
worker generates its deterministic shard (seed = base seed + partition
id), so corpus size scales with the cluster and nothing materialises on
the driver. Usage::

    spark.dataSource.register(EntityDataSource)
    df = (spark.read.format("waterbear_entity")
          .option("model_dir", ".../model").option("entity", "staff")
          .option("n", 100_000).option("numPartitions", 8).load())

The schema is the compiled entity StructType, so downstream expectation
evaluation and Delta DDL work unchanged. (The pure-Catalyst
``RecordGenerator.frame`` path is still the cheapest generator; this
source exists for the places that want a reader-shaped integration —
scan planning, option plumbing, format strings in configs.)
"""

from __future__ import annotations

import datetime
import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import ArrayType, DateType, StructType, TimestampType

_DATE_FMT = "%Y-%m-%d"
_TS_FMT = "%Y-%m-%dT%H:%M:%S"


def _strip_metadata(dtype):
    """Recursively drop StructField metadata (see schema() note)."""
    from pyspark.sql.types import StructField

    if isinstance(dtype, StructType):
        return StructType(
            [
                StructField(f.name, _strip_metadata(f.dataType), f.nullable)
                for f in dtype.fields
            ]
        )
    if isinstance(dtype, ArrayType):
        return ArrayType(_strip_metadata(dtype.elementType), dtype.containsNull)
    return dtype


def _to_row(value, dtype):
    """JSON-decoded generator output -> Spark row value for ``dtype``."""
    if value is None:
        return None
    if isinstance(dtype, StructType):
        return tuple(_to_row(value.get(f.name), f.dataType) for f in dtype.fields)
    if isinstance(dtype, ArrayType):
        return [_to_row(v, dtype.elementType) for v in value]
    if isinstance(dtype, DateType):
        return datetime.datetime.strptime(value, _DATE_FMT).date()
    if isinstance(dtype, TimestampType):
        return datetime.datetime.strptime(value, _TS_FMT)
    return value


class EntityDataSource(DataSource):
    """``format("waterbear_entity")`` — partitioned synthetic records."""

    @classmethod
    def name(cls) -> str:
        return "waterbear_entity"

    def schema(self) -> StructType:
        from waterbear_spark.schema.compiler import SchemaCompiler

        compiled = SchemaCompiler(self.options["model_dir"]).compile(
            self.options["entity"]
        )
        # comment metadata must be stripped: the streaming path round-trips
        # the schema through Arrow (which has no field metadata) and the
        # engine asserts declared == round-tripped. Delta DDL comments come
        # from the compiled entity directly (schema/ddl.py), not from here.
        return _strip_metadata(compiled.schema)

    def reader(self, schema: StructType) -> DataSourceReader:
        return _EntityReader(self.options, schema)

    def simpleStreamReader(self, schema: StructType):
        return _EntityStreamReader(self.options, schema)


class _EntityReader(DataSourceReader):
    def __init__(self, options, schema):
        self._options = dict(options)
        self._schema = schema

    def partitions(self):
        n = int(self._options.get("n", 1000))
        parts = int(self._options.get("numPartitions", 4))
        base = n // parts
        extra = n % parts
        out = []
        start = 0
        for i in range(parts):
            cnt = base + (1 if i < extra else 0)
            out.append(InputPartition((i, cnt)))
            start += cnt
        return out

    def read(self, partition):
        from waterbear_spark.generator.records import RecordGenerator

        idx, cnt = partition.value
        gen = RecordGenerator(
            self._options["model_dir"],
            nullable_rate=float(self._options.get("nullable_rate", 0.0)),
            seed=int(self._options.get("seed", 42)) + idx,
        )
        for rec in gen.generate(self._options["entity"], cnt):
            obj = json.loads(rec)
            yield tuple(
                _to_row(obj.get(f.name), f.dataType) for f in self._schema.fields
            )


class _EntityStreamReader(SimpleDataSourceStreamReader):
    """Streaming variant (Spark 4 SimpleDataSourceStreamReader): an
    unbounded synthetic entity stream, ``rows_per_batch`` rows per
    micro-batch. Offsets are batch ordinals and each batch derives its
    generator seed from (base seed + ordinal), so ``readBetweenOffsets``
    replays EXACTLY the same rows after a restart — the property that
    makes a custom source safe under checkpoint recovery. ``max_batches``
    (default unbounded) lets tests drain via ``processAllAvailable``.
    """

    def __init__(self, options, schema):
        self._options = dict(options)
        self._schema = schema

    def initialOffset(self) -> dict:
        return {"batch": 0}

    def _batch_rows(self, ordinal: int):
        from waterbear_spark.generator.records import RecordGenerator

        gen = RecordGenerator(
            self._options["model_dir"],
            nullable_rate=float(self._options.get("nullable_rate", 0.0)),
            seed=int(self._options.get("seed", 42)) + ordinal,
        )
        n = int(self._options.get("rows_per_batch", 100))
        for rec in gen.generate(self._options["entity"], n):
            obj = json.loads(rec)
            yield tuple(
                _to_row(obj.get(f.name), f.dataType) for f in self._schema.fields
            )

    def read(self, start: dict):
        b = start["batch"]
        limit = int(self._options.get("max_batches", -1))
        if 0 <= limit <= b:
            # terminal no-progress answer: the wrapper probes it with
            # next(), so it must be an (exhausted) iterator
            return iter(()), start
        # non-empty batches must be LISTS: the wrapper's prefetch cache
        # copy.copy()s them per replay, which a generator can't survive
        return list(self._batch_rows(b)), {"batch": b + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        return [
            row
            for b in range(start["batch"], end["batch"])
            for row in self._batch_rows(b)
        ]
