"""CDC-style streaming upsert: foreachBatch + merge.

The canonical silver-table maintenance pattern: a stream of change rows
(inserts + updates keyed by a primary key) is merged into the target
table once per micro-batch. With Delta this is a transactional MERGE;
with the parquet fallback it reuses ``sources.sinks.merge_upsert``'s
staged-swap. Exactly-once comes from the streaming checkpoint: a replayed
micro-batch re-merges the same keys idempotently.

Scale: each micro-batch shuffles only on the merge keys; the target is
never rewritten wholesale under Delta (file pruning) — the parquet
fallback does rewrite and is the single-writer/small-table variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from waterbear_spark.sources.sinks import merge_upsert


def stream_merge_into(
    changes: DataFrame,
    target_path: str,
    keys: list[str],
    checkpoint: str,
    dedupe_order_col: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously merge a change stream into the table at target_path.

    :param dedupe_order_col: when a micro-batch contains several versions
        of one key, keep the row with the greatest value of this column
        (e.g. an update timestamp) before merging — merge semantics
        require one row per key per batch.
    """

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if dedupe_order_col:
            from pyspark.sql import Window
            from pyspark.sql import functions as F

            w = Window.partitionBy(*keys).orderBy(F.col(dedupe_order_col).desc())
            batch = (
                batch.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        merge_upsert(spark, target_path, batch, keys)

    writer = (
        changes.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
