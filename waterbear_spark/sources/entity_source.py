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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import ArrayType, DateType, StructType, TimestampType

_DATE_FMT = "%Y-%m-%d"
_TS_FMT = "%Y-%m-%dT%H:%M:%S"


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
        return compiled.schema

    def reader(self, schema: StructType) -> DataSourceReader:
        return _EntityReader(self.options, schema)


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
