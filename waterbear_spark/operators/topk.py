"""Top-k per group via ranked window — the scalable top-k pattern.

``row_number`` over (group, order) then ``rn <= k`` is one shuffle on the
group key; Spark's physical plan inserts a per-partition TopK
(WindowGroupLimit) before the shuffle for rank-limit filters, so the
exchange only carries k rows per group per input partition instead of the
full table — essential at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the top ``k`` rows of each group, ranked deterministically.

    ``order_cols`` must define a total order (include a unique tiebreak
    column) so results are reproducible for oracle comparison.
    """
    window = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(window))
        .filter(F.col(rank_col) <= k)
    )
