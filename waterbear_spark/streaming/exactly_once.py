"""Exactly-once APPEND sink for foreachBatch: a batch-id ledger makes
re-delivered micro-batches no-ops.

``stream_merge_into`` (cdc.py) gets exactly-once from MERGE being
idempotent per key; an APPEND sink has no such algebra — a replayed
micro-batch (driver restart between sink write and checkpoint commit)
would duplicate rows. The standard fix, implemented here: write each
micro-batch to a ``batch_id=<id>`` subdirectory EXACTLY when that id is
absent, using a write-then-commit marker so a half-written batch from a
crash is invisible until its marker lands. Readers scan only committed
batch directories.

Scale: the ledger check is one filesystem stat per micro-batch (no data
read); batch directories are the natural compaction unit for
``sources.sinks.compact_files``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _committed_marker(target: str, batch_id: int) -> str:
    return os.path.join(target, "_committed", f"{batch_id}")


def idempotent_append(batch: DataFrame, batch_id: int, target: str) -> bool:
    """foreachBatch body: append ``batch`` under ``batch_id=<id>`` unless
    that id already committed. Returns True if this call wrote, False if
    the batch was a re-delivery and was skipped."""
    marker = _committed_marker(target, batch_id)
    if os.path.exists(marker):
        return False
    batch.write.mode("overwrite").parquet(
        os.path.join(target, f"batch_id={batch_id}")
    )
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    with open(marker, "w") as fh:
        fh.write("ok")
    return True


def read_committed(
    spark: SparkSession, target: str, schema: str | None = None
) -> DataFrame:
    """Read ONLY committed batch directories (a crashed half-write has
    no marker and is skipped). Batch ids sort numerically (lexicographic
    would put '10' before '2' and break any order-sensitive consumer).

    ``schema`` (DDL string) types the empty-ledger return so downstream
    unions/selects against a populated sink keep working before the
    first commit; without it an empty ledger is an error rather than a
    silently wrong placeholder schema."""
    committed_dir = os.path.join(target, "_committed")
    # digit-only filter: a stray temp/hidden file in _committed must not
    # turn the numeric sort into a ValueError read outage
    ids = (
        sorted((n for n in os.listdir(committed_dir) if n.isdigit()), key=int)
        if os.path.isdir(committed_dir)
        else []
    )
    if not ids:
        if schema is None:
            raise FileNotFoundError(
                f"no committed batches under {target}; pass schema= to "
                "get a typed empty DataFrame instead"
            )
        return spark.createDataFrame([], f"{schema}, batch_id int")
    paths = [os.path.join(target, f"batch_id={i}") for i in ids]
    return spark.read.option("basePath", target).parquet(*paths)
