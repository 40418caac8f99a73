"""Custom stateful streaming operator: per-user session tracking with
``applyInPandasWithState`` — the streaming twin of the batch
sessionization (registry.events_sessionize).

State per user: (session_id, last_ts_epoch, n_events). A gap larger than
GAP_SECONDS opens a new session (the previous one emits as closed); the
currently-open session emits a progress row per batch. This is the harness for any custom stateful operator the engine
needs (dedup-within-window, rate limiting, incremental cell rollups).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, session_id long, n_events long, closed boolean"
STATE_SCHEMA = "session_id long, last_ts double, n_events long"
GAP_SECONDS = 1800.0


def _update(key, pdfs, state: GroupState):
    (user_id,) = key
    session_id, last_ts, n = state.get if state.exists else (0, None, 0)
    rows = pd.concat(list(pdfs)).sort_values("ts_epoch")
    out = []
    for ts in rows["ts_epoch"]:
        ts = float(ts)
        if last_ts is None or ts - last_ts > GAP_SECONDS:
            if n > 0:
                out.append((user_id, session_id, n, True))  # closed by gap
            session_id += 1
            n = 0
        last_ts = ts
        n += 1
    state.update((int(session_id), float(last_ts), int(n)))
    out.append((user_id, session_id, n, False))  # open session progress
    yield pd.DataFrame(out, columns=["user_id", "session_id", "n_events", "closed"])


def sessionize_stream(stream: DataFrame) -> DataFrame:
    """events stream (ts, user_id, ...) -> per-user session rows."""
    prepared = stream.withColumn(
        "ts_epoch", F.unix_timestamp(F.col("ts").cast("timestamp")).cast("double")
    ).select("user_id", "ts_epoch")
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
