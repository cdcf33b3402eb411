from waterbear_spark.streaming.funnel import funnel_census, funnel_flags
from waterbear_spark.streaming.windows import (
    session_metrics,
    stream_dedup,
    stream_static_enrich,
    stream_stream_join,
    stream_stream_left_join,
    tumbling_metrics,
)

__all__ = [
    "funnel_census",
    "funnel_flags",
    "tumbling_metrics",
    "session_metrics",
    "stream_dedup",
    "stream_static_enrich",
    "stream_stream_join",
    "stream_stream_left_join",
]
