"""Event-time streaming operators: watermarked windowed aggregation and
streaming deduplication.

The reference is strictly batch; these are the Structured-Streaming pieces a
live training-data pipeline needs around the incremental indexer
(streaming/incremental.py):

  * ``windowed_doc_stats``  — docs/sec + byte volume per event-time window,
    tolerant of late arrivals up to the watermark (the ingestion-health
    signal a 10^12-file crawl monitors);
  * ``streaming_exact_dedup`` — drop exact-duplicate payloads (sha256) across
    micro-batches with bounded state: the watermark ages duplicate keys out
    of the state store, so state is O(docs per watermark horizon), not
    O(corpus) — the streaming twin of operators/dedup.exact_dedup;
  * ``sessionized_user_counts`` — applyInPandasWithState custom stateful
    operator: per-user event counting with an inactivity-gap session close
    (the streaming twin of contract `sessionize`).

All three are plain declarative Structured Streaming — they run identically
on a real cluster with kafka/file sources; tests drive them with file
sources + availableNow triggers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_doc_stats(
    stream: DataFrame,
    ts_col: str = "ts",
    content_col: str = "content",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling-window ingestion stats:
    (window, n_docs, n_bytes, avg_len). Late rows within the watermark still
    update their window; older ones are dropped (bounded state)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.octet_length(content_col)).alias("n_bytes"),
            F.round(F.avg(F.octet_length(content_col)), 2).alias("avg_len"),
        )
        .select(F.col("win.start").alias("win_start"), "n_docs", "n_bytes", "avg_len")
    )


def streaming_exact_dedup(
    stream: DataFrame,
    ts_col: str = "ts",
    content_col: str = "content",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact dedup across micro-batches with bounded state: key = sha256 of
    the payload; ``dropDuplicatesWithinWatermark`` keeps a key only until the
    watermark passes it, so the state store holds one row per distinct doc
    per horizon — never the whole corpus."""
    keyed = stream.withColumn("__sha", F.sha2(F.col(content_col), 256))
    return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(["__sha"]).drop("__sha")


def sessionized_user_counts(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user session
    aggregation with an inactivity gap. State per user is two timestamps +
    a count (the open session's interval).

    Semantics (batch `sessionize` twin):
      * every batch's events are SORTED by event time and gap-split — two
        true sessions separated by > gap inside one micro-batch (the normal
        availableNow/catch-up shape) emit as two sessions, not one lump;
      * the stored open session merges as an interval: an in-watermark late
        event with ts < stored start extends the session BACKWARD
        (min(start, lo)), and the gap test is per-event-order, not
        batch-min vs stored-last;
      * only the newest session stays open; everything older emits in-batch;
      * idle close tracks EVENT time: timeout = last event + gap (clamped
        just past the current watermark), not watermark + gap — emission no
        longer drifts by however far the watermark lags the session."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, session_start timestamp, session_end timestamp, n_events long"
    state_schema = "start long, last long, n long"
    gap_us = gap_seconds * 1_000_000

    def emit(key, sessions):
        return pd.DataFrame(
            {
                "user_id": [key[0]] * len(sessions),
                "session_start": [pd.Timestamp(s[0], unit="us") for s in sessions],
                "session_end": [pd.Timestamp(s[1], unit="us") for s in sessions],
                "n_events": [s[2] for s in sessions],
            }
        )

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield emit(key, [(start, last, n)])
            return
        # intervals: the stored open session + each batch event as a point,
        # time-ordered, then merged on gap ≤ gap_us (a classic interval
        # sweep — in-batch gap splits and backward extension both fall out)
        intervals: list[tuple[int, int, int]] = []
        if state.exists:
            intervals.append(tuple(state.get))
        for pdf in pdfs:
            ts = pd.to_datetime(pdf[ts_col]).astype("int64") // 1000  # µs
            intervals.extend((int(t), int(t), 1) for t in ts)
        if not intervals:
            return
        intervals.sort()
        merged = [intervals[0]]
        for lo, hi, n in intervals[1:]:
            plo, phi, pn = merged[-1]
            if lo - phi <= gap_us:
                merged[-1] = (plo, max(phi, hi), pn + n)
            else:
                merged.append((lo, hi, n))
        open_s = merged[-1]
        state.update(open_s)
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(open_s[1] // 1000 + gap_seconds * 1000, wm_ms + 1))
        if len(merged) > 1:
            yield emit(key, merged[:-1])

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )
