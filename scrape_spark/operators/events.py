"""Event-log operators: gap-based sessionization.

The events table is the engine's stand-in for crawl/telemetry logs (the
reference has no event processing at all; its only time columns are the
page timestamps, models.py). Sessionization — splitting each user's event
stream into visits separated by an inactivity gap — is the canonical
stateful log transform, and the batch form is pure relational algebra:

    new_session = (ts − lag(ts) over (user ORDER BY ts, id)) > gap
    session_idx = running sum of new_session per user

Scale shape: both windows partition by ``user_id`` — the natural log key —
so the single shuffle is the user repartition; each task holds one user's
ordered slice. Per-user event counts in real logs are Zipf but bounded
(a browser session cap, a crawler's per-host fetch cap); a truly
adversarial key would use the salted two-stage pattern from
politeness.per_host_take. Timestamp arithmetic is integer microseconds
(``unix_micros`` / ``epoch_us``) — no float time, no second-truncation —
so the DuckDB oracle matches exactly.

The streaming twin of this operator is
streaming/frontier_stream.py's applyInPandasWithState scheduler; batch
sessionize is the replay/backfill path over the same log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: default inactivity gap: 30 minutes, in microseconds
SESSION_GAP_US = 30 * 60 * 1_000_000


def sessionize(
    events: DataFrame,
    gap_us: int = SESSION_GAP_US,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Assign (session_idx, session stats) per user from an event log.

    Returns one row per session: (user_id, session_idx 1-based,
    n_events, start_us, end_us, span_us). Event order within a user is
    (ts, event_id) — the id tiebreak makes simultaneous events
    deterministic. A session CONTAINS its first event; gaps strictly
    greater than ``gap_us`` split.
    """
    # CAST handles TIMESTAMP_NTZ parquet columns; the engine session pins
    # spark.sql.session.timeZone=UTC (session.py), so NTZ→TZ is identity
    # and matches DuckDB's epoch_us on naive timestamps
    us = F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP))")
    w = Window.partitionBy(user_col).orderBy("_us", id_col)
    marked = events.select(
        F.col(user_col),
        F.col(id_col),
        us.alias("_us"),
    ).withColumn(
        "_new",
        F.when(
            F.col("_us") - F.lag("_us").over(w) > int(gap_us), F.lit(1)
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )
    w_cum = (
        Window.partitionBy(user_col)
        .orderBy("_us", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_idx = marked.withColumn(
        "session_idx", (F.sum("_new").over(w_cum) + 1).cast("long")
    )
    return (
        with_idx.groupBy(user_col, "session_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("_us").cast("long").alias("start_us"),
            F.max("_us").cast("long").alias("end_us"),
        )
        .withColumn("span_us", (F.col("end_us") - F.col("start_us")).cast("long"))
    )


def sessionize_sql(
    events_sql: str,
    gap_us: int = SESSION_GAP_US,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> str:
    """The identical sessionization as portable SQL (DuckDB oracle)."""
    return f"""WITH _ev AS ({events_sql}),
_us AS (SELECT {user_col}, {id_col}, epoch_us({ts_col}) AS _us FROM _ev),
_mark AS (SELECT {user_col}, {id_col}, _us,
    CASE WHEN _us - lag(_us) OVER
           (PARTITION BY {user_col} ORDER BY _us, {id_col}) > {int(gap_us)}
         THEN 1 ELSE 0 END AS _new
  FROM _us),
_idx AS (SELECT {user_col}, _us,
    CAST(sum(_new) OVER (PARTITION BY {user_col} ORDER BY _us, {id_col}
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1 AS BIGINT)
      AS session_idx
  FROM _mark)
SELECT {user_col}, session_idx,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(min(_us) AS BIGINT) AS start_us,
  CAST(max(_us) AS BIGINT) AS end_us,
  CAST(max(_us) - min(_us) AS BIGINT) AS span_us
FROM _idx GROUP BY {user_col}, session_idx"""
