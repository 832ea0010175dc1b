"""Custom stateful streaming operator via ``applyInPandasWithState``.

``session_window`` covers declarative sessionization; this module is the
ARBITRARY-state path (the reference has none — its only state is "does the
ES mapping exist", IndexingListener.java:34–36): per-user sessionization
with explicit GroupState, the template for operators Spark's built-ins
can't express (custom eviction, cross-event invariants, ML feature state).

Semantics: a session closes when a later event for the same user arrives
≥ GAP after the previous one; the closed session is emitted with its start
and event count. A user's final session never closes (no timeout — closure
is data-driven), which keeps the operator deterministic and lets a SQL
oracle express it exactly: all gaps-and-islands sessions except each
user's last.

State per user is one (start, count, last_ts) triple — O(users) total, the
shape that scales to any key cardinality under RocksDB state store.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from bigdataindexing_spark.registry import register
from bigdataindexing_spark.streaming.core import run_available_now, stream_table

SESSION_GAP_SECONDS = 30 * 60

_OUTPUT_SCHEMA = "user_id BIGINT, session_start TIMESTAMP, cnt BIGINT"
_STATE_SCHEMA = "start DOUBLE, cnt BIGINT, last DOUBLE"


def _sessionize(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import datetime as dt

    if state.exists:
        start, cnt, last = state.get
    else:
        start = cnt = last = None
    closed: list[tuple] = []
    # Buffer the whole group before sorting: the iterator yields the
    # group's rows in Arrow-chunk pieces, and sorting within each chunk
    # alone would process events out of timestamp order whenever a key's
    # micro-batch spans multiple chunks (>~10k rows per key).
    chunks = [pdf["ts"] for pdf in pdfs]
    all_ts = pd.concat(chunks) if chunks else pd.Series([], dtype="object")
    for ts in all_ts.sort_values():
        t = ts.timestamp()
        if last is None:
            start, cnt, last = t, 1, t
        elif t - last >= SESSION_GAP_SECONDS:
            closed.append(
                (key[0], dt.datetime.utcfromtimestamp(start), cnt)
            )
            start, cnt, last = t, 1, t
        else:
            cnt += 1
            last = t
    if last is not None:
        state.update((start, cnt, last))
    yield pd.DataFrame(closed, columns=["user_id", "session_start", "cnt"])


def sessionize(events: DataFrame) -> DataFrame:
    """events(user_id, ts) → closed sessions, state carried across batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register(
    "st7_stateful_sessionize",
    oracle="WITH m AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL "
    "OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s "
    "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
    "s AS (SELECT user_id, ts, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts "
    "ROWS UNBOUNDED PRECEDING) AS sid FROM m), "
    "g AS (SELECT user_id, sid, MIN(ts) AS session_start, COUNT(*) AS cnt, "
    "MAX(sid) OVER (PARTITION BY user_id) AS max_sid FROM s GROUP BY user_id, sid) "
    "SELECT user_id, session_start, cnt FROM g WHERE sid < max_sid "
    "ORDER BY user_id, session_start",
    tags=("streaming", "stateful", "pandas-udf"),
    bench=False,
    doc="Custom stateful sessionization via applyInPandasWithState "
    "(explicit per-user GroupState, closure on the next out-of-gap event). "
    "Oracle: gaps-and-islands sessions minus each user's final (never-"
    "closed) session.",
)
def st7_stateful_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = stream_table(spark, sf_dir, "events").select("user_id", "ts")
    result = run_available_now(sessionize(events), output_mode="append")
    return result.orderBy("user_id", "session_start")
