"""Streaming sessionization — native ``session_window`` aggregation
(§2.10 extension; the streaming face of plans/analytics.py's
``w2_sessionize`` gaps-and-islands query).

Batch sessionization needs two window passes and a per-key sort;
Structured Streaming has a PURPOSE-BUILT operator: ``F.session_window``
grows a per-key session while events keep arriving within the gap and
the state store merges overlapping sessions across micro-batches — no
window function, no sort, state bounded by the watermark. This is the
one place the streaming engine's operator vocabulary is *richer* than
the batch DataFrame API's.

BOUNDARY SEMANTICS, pinned by tests (measured, not assumed):
``session_window`` merges an event into a session while
``ts_next − ts_prev <= gap`` — INCLUSIVE, exactly the batch query's
``lag``-based flag. An event at precisely the gap boundary continues
the session; one microsecond past it starts a new one. Streaming and
batch sessionization therefore agree event-for-event, which is what
lets the drained stream hash-match the gaps-and-islands oracle.

EMISSION CONTRACT (append mode): a session only reaches the sink once
the watermark passes its window end (``max event ts + gap``) — the
engine must know no future event can still merge into it. A drained
bounded stream therefore emits exactly the sessions that CLOSED
before the final watermark (max event time − delay); the still-open
tail stays in state. That is correct streaming behavior, not data
loss — the daily-drain deployment picks the tail up in the next run,
and the test pins the partition of batch sessions into
emitted/withheld exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensorstream_scalable_sensor_data_pipeline_spark.streaming.pipeline import (
    drain_to_memory,
    stream_events,
)

SESSION_GAP_MIN = 30


def sessionized_agg(ev: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """The session aggregate shared by both drain modes: per
    (user_id, session) start/end/count. ``session_start``/``session_end``
    are min/max EVENT time (comparable with the batch query);
    ``window_end`` additionally exposes the engine's half-open session
    end (max ts + gap) — what the watermark is compared against."""
    return (
        ev.groupBy(
            F.col("user_id"),
            F.session_window(F.col("ts"), f"{gap_minutes} minutes").alias("sw"),
        )
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            "session_start",
            "session_end",
            "n_events",
            F.col("sw.end").alias("window_end"),
        )
    )


def stream_sessionize(
    spark: SparkSession,
    sf_dir: str,
    gap_minutes: int = SESSION_GAP_MIN,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Drain the bounded event stream into per-user sessions.

    ``watermark_delay=None`` → complete-mode drain: every session,
    open or closed (the oracle-comparable shape; complete mode holds
    all session state, so it is the harness path — production bounds
    state with a watermark). A delay string → the PRODUCTION shape:
    append mode, state evicted as sessions close; the drained result
    is the closed-session subset per the module's emission contract.
    """
    ev = stream_events(spark, sf_dir).select("user_id", "ts")
    if watermark_delay is None:
        return drain_to_memory(
            sessionized_agg(ev, gap_minutes), output_mode="complete"
        )
    agg = sessionized_agg(
        ev.withWatermark("ts", watermark_delay), gap_minutes
    )
    return drain_to_memory(agg, output_mode="append")


def stream_sessionize_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench head: drain the full event stream into sessions (the
    complete-mode oracle shape — state for every session, the
    worst-case path) and summarize per user so session bounds and
    counts are consumed."""
    sessions = stream_sessionize(spark, sf_dir)
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.avg(
            F.unix_micros(F.col("session_end"))
            - F.unix_micros(F.col("session_start"))
        ).alias("avg_session_us"),
    )
