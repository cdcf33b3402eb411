"""Schema-enforced batch and streaming scans.

Parity target: the reference's documented runtime patterns — batch
``spark.read.format(fmt).schema(s).load(path)`` (README.md:49-56,
tests_convertor.py:355) and Auto Loader / ``readStream`` with the same
schema (README.md:88-98). Schema-on-read semantics are Spark's own:
missing fields -> NULL, unexpected fields discarded, types coerced
(PERMISSIVE mode by default; expose ``mode`` and
``columnNameOfCorruptRecord`` for the strict variants).

Scale notes: schema enforcement at the scan keeps the parser single-pass
(no inference job over 100 TB of JSON), and an explicit schema is what
enables predicate pushdown + column pruning on columnar formats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# Text sources parse fractional seconds through format patterns whose
# defaults keep only millis — and TIMESTAMP_NTZ columns read the separate
# ``timestampNTZFormat`` option, a trap when an entity schema types a
# column as NTZ. Pass ``**MICROS_TS_OPTIONS`` to a reader (and its writer
# twin) when event times carry microseconds; not the default because the
# strict pattern rejects inputs without exactly six fractional digits.
MICROS_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
MICROS_TS_OPTIONS = {
    "timestampFormat": MICROS_TS_FMT,
    "timestampNTZFormat": MICROS_TS_FMT,
}


def read_entity(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "json",
    **options: str,
) -> DataFrame:
    """Batch scan with an enforced entity schema (R17)."""
    reader = spark.read.format(fmt).schema(schema)
    if options:
        reader = reader.options(**options)
    return reader.load(path)


def read_entity_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """Streaming scan with an enforced entity schema (R18).

    File-source equivalent of the reference's Auto Loader pattern; pair
    with ``trigger(availableNow=True)`` for incremental batch processing
    and a checkpoint location for exactly-once.
    """
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if options:
        reader = reader.options(**options)
    return reader.load(path)
