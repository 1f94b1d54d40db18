"""Structured Streaming wrappers (SURVEY §2.10 generalized surface).

The reference is batch with incremental bookkeeping (I1-I6); the Spark
engine exposes true event-time streaming: tumbling/sliding/session windows
with watermarks.  Every transformation here is the SAME expression used by
the batch queries in queries/events.py — one definition, two run modes.
"""

from vunnel_spark.streaming.dedup import foreach_batch_near_dup_filter  # noqa: F401
from vunnel_spark.streaming.joins import interval_join  # noqa: F401
from vunnel_spark.streaming.enrich import (  # noqa: F401
    foreach_batch_upsert,
    stream_static_enrich,
)
from vunnel_spark.streaming.windows import (  # noqa: F401
    session_counts,
    streaming_dedup,
    sliding_counts,
    tumbling_counts,
)
