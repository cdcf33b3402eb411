from waterbear_spark.functions.udfs import (
    median_grouped_agg,
    normalize_embedding,
    zscore_by_group,
)

__all__ = ["normalize_embedding", "zscore_by_group", "median_grouped_agg"]
