"""Custom stateful streaming operators via applyInPandasWithState.

``streaming_first_observed`` is the true-streaming realization of the
reference's first-observed fix-date store
(/root/reference/src/vunnel/tool/fixdate/first_observed.py:35-63, batch
form: sinks/writers.py first_observed_merge): for every key the FIRST
event-time seen is remembered in per-key state and emitted with each
update; later observations never move it.

State layout: one row per key group holding the min event timestamp —
GroupState survives across micro-batches via the checkpoint, which is
exactly the cross-run accumulation the reference gets from SQLite.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, first_observed timestamp, n_seen long"
STATE_SCHEMA = "first_observed timestamp, n_seen long"


def _update_first_observed(key, pdfs: Iterator, state: GroupState):
    import pandas as pd

    min_ts = None
    n_new = 0
    for pdf in pdfs:
        n_new += len(pdf)
        batch_min = pdf["ts"].min()
        if min_ts is None or batch_min < min_ts:
            min_ts = batch_min
    if state.exists:
        first, n_seen = state.get
        # first-observed semantics: existing date NEVER moves, even if an
        # earlier-timestamped event arrives late (mirrors the reference:
        # the stored date is observation time, not event time)
        state.update((first, n_seen + n_new))
    else:
        state.update((min_ts.to_pydatetime(), n_new))
    first, n_seen = state.get
    yield pd.DataFrame([{"key": key[0], "first_observed": first, "n_seen": n_seen}])


def streaming_first_observed(events: DataFrame, key_col: str, ts_col: str = "ts") -> DataFrame:
    """(streaming) events -> (key, first_observed, n_seen) updates."""
    from pyspark.sql import functions as F

    src = events.select(F.col(key_col).cast("string").alias("key"), F.col(ts_col).alias("ts"))
    return src.groupBy("key").applyInPandasWithState(
        _update_first_observed,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
