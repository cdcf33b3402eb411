from waterbear_spark.operators.asof import asof_join
from waterbear_spark.operators.skew import salted_agg, salted_join
from waterbear_spark.operators.topk import top_k_per_group

__all__ = ["asof_join", "top_k_per_group", "salted_join", "salted_agg"]
