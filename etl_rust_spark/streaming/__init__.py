"""Structured Streaming surface (SURVEY §5.4 / build plan P4).

``windows`` — event-time tumbling/sliding/session aggregations shared by
batch and streaming; ``subscription`` — the reference's
``index-subscription`` work-queue pipeline re-expressed as a streaming
source + ``foreachBatch`` with checkpoint-based exactly-once.

``entry_queries`` / ``entry_oracle_sql`` expose the window operators in
batch mode for the DuckDB correctness gate: Spark runs the *real*
``window()`` / ``session_window()`` functions, the oracle reproduces
their epoch-aligned / gaps-and-islands semantics in portable SQL, and
the streaming tests then assert stream == batch — chaining the gate
through to the streaming path.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_rust_spark.catalog import register_views
from etl_rust_spark.streaming.subscription import (
    WORK_ITEM_SCHEMA,
    run_subscription,
    work_stream,
)
from etl_rust_spark.streaming.stateful import running_user_totals
from etl_rust_spark.streaming.joins import stream_dedupe, stream_interval_join
from etl_rust_spark.streaming.windows import (
    events_stream,
    session_window_agg,
    sliding_window,
    tumbling_window,
)

__all__ = [
    "WORK_ITEM_SCHEMA",
    "events_stream",
    "tumbling_window",
    "sliding_window",
    "session_window_agg",
    "running_user_totals",
    "stream_dedupe",
    "stream_interval_join",
    "work_stream",
    "run_subscription",
    "entry_queries",
    "entry_oracle_sql",
]


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # register_views (not a bare load_table) so the nanos/UTC session
    # confs are self-asserted on foreign sessions like the grader's.
    register_views(spark, sf_dir)
    return spark.table("events")


def _op_time_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Tumbling + sliding + session windows in one tagged-union entry
    # (aligned on src/user_id/ws/we/n/v_c) — keeps the total queries()
    # count within the driver's 50-entry gate while gating all three
    # window operators (see operators/__init__ docstring).  Session rows
    # carry their user and NULL v_c; global windows carry NULL user.
    ev = _events(spark, sf_dir)
    nouser = F.lit(None).cast("long").alias("user_id")
    # r12 optimization: the tumble rows are EXACTLY the slide rows whose
    # window start is 600 s-aligned.  slide = window(ts, 600s, 300s), so
    # every event lands in two windows with starts ≡ 0 and ≡ 300
    # (mod 600); the ≡ 0 one is precisely its tumbling window(ts, 600s),
    # and the per-window aggregates (n, v_c) over an identical event set
    # are identical.  Deriving tumble as a filter of the SAME sliding
    # aggregation DataFrame lets one scan + one shuffle of events serve
    # both branches (guide §2.4) — at 100 TB this removes a full events
    # pass.  tumbling_window() itself is unchanged (streaming consumers
    # still use it); only this batch entry composes the two.
    # The lazy localCheckpoint is load-bearing: without it Catalyst
    # pushes the ws-alignment filter below the aggregation, and the
    # tumble branch re-scans AND re-Expands (2× rows) the corpus —
    # worse than two independent passes.  The barrier materializes the
    # sliding aggregate once (O(windows) rows, tiny next to events) and
    # both union branches read it.
    s_agg = sliding_window(ev).localCheckpoint(eager=False)
    t = s_agg.filter(
        F.expr("(minute(ws) * 60 + second(ws)) % 600 = 0")
    ).select(F.lit("tumble").alias("src"), nouser, "ws", "we", "n", "v_c")
    s = s_agg.select(
        F.lit("slide").alias("src"), nouser, "ws", "we", "n", "v_c"
    )
    sess = session_window_agg(ev).select(
        F.lit("session").alias("src"),
        "user_id",
        F.col("session_start").alias("ws"),
        F.col("session_end").alias("we"),
        F.col("n_events").alias("n"),
        F.lit(None).cast("long").alias("v_c"),
    )
    return t.unionByName(s).unionByName(sess).orderBy("src", "ws", "user_id")


def entry_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "op_time_windows": _op_time_windows,
    }


# DuckDB reproductions of Spark's window semantics.  window() starts are
# epoch-aligned → integer epoch arithmetic; session_window merges events
# exactly `gap` apart → strict `> INTERVAL` gaps-and-islands (DQ-35's
# convention, verified by tests/test_streaming.py boundary test).
_TUMBLING_DUCK = """
SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 600) AS BIGINT) * 600) AS TIMESTAMP) AS ws,
  CAST(to_timestamp(CAST(floor(epoch(ts) / 600) AS BIGINT) * 600 + 600) AS TIMESTAMP) AS we,
  COUNT(*) AS n, CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v_c
FROM events GROUP BY 1, 2 ORDER BY 1
"""

_SLIDING_DUCK = """
SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 - o.k) AS TIMESTAMP) AS ws,
  CAST(to_timestamp(CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 - o.k + 600) AS TIMESTAMP) AS we,
  COUNT(*) AS n, CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS v_c
FROM events CROSS JOIN (VALUES (0), (300)) AS o(k)
GROUP BY 1, 2 ORDER BY 1
"""

_SESSION_DUCK = """
WITH ordered AS (
  SELECT user_id, ts, event_id,
    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events),
marks AS (
  SELECT user_id, ts, event_id,
    CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM ordered),
grp AS (
  SELECT user_id, ts,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marks)
SELECT user_id, MIN(ts) AS session_start,
  MAX(ts) + INTERVAL 30 MINUTE AS session_end, COUNT(*) AS n_events
FROM grp GROUP BY user_id, sid ORDER BY user_id, session_start
"""


def entry_oracle_sql() -> dict[str, str]:
    time_windows = (
        "SELECT 'tumble' AS src, CAST(NULL AS BIGINT) AS user_id, ws, we, n, v_c "
        f"FROM ({_TUMBLING_DUCK.strip()})\n"
        "UNION ALL\nSELECT 'slide' AS src, CAST(NULL AS BIGINT) AS user_id, ws, we, n, v_c "
        f"FROM ({_SLIDING_DUCK.strip()})\n"
        "UNION ALL\nSELECT 'session' AS src, user_id, session_start AS ws, "
        "session_end AS we, n_events AS n, CAST(NULL AS BIGINT) AS v_c "
        f"FROM ({_SESSION_DUCK.strip()})\n"
        "ORDER BY src, ws, user_id NULLS FIRST"
    )
    return {
        "op_time_windows": time_windows,
    }
