"""Event-time streaming operators: watermarked windows, streaming dedup with
bounded state, applyInPandasWithState sessionization. File sources +
availableNow drive the exact same plans a kafka-fed cluster runs."""

import datetime as dt
import time

import pytest

from edgesearch_spark.streaming.windowed import (
    sessionized_user_counts,
    streaming_exact_dedup,
    windowed_doc_stats,
)

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _write_drop(spark, path, rows):
    spark.createDataFrame(rows, "ts timestamp, user_id long, content string") \
        .coalesce(1).write.mode("append").parquet(path)


def _run_stream(spark, src, build, out_name, mode):
    stream = spark.readStream.schema("ts timestamp, user_id long, content string") \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = (build(stream).writeStream.format("memory").queryName(out_name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {out_name}")


def test_windowed_doc_stats_matches_batch(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("win_src"))
    rows = []
    for m, n in ((0, 3), (1, 5), (2, 2)):
        for i in range(n):
            rows.append((T0 + dt.timedelta(minutes=m, seconds=10 * i), 1, f"doc-{m}-{i}" * (m + 1)))
    _write_drop(spark, src, rows[:4])
    _write_drop(spark, src, rows[4:])
    out = _run_stream(spark, src, lambda s: windowed_doc_stats(s), "win_stats", "complete")
    got = {r["win_start"].minute: (r["n_docs"], r["n_bytes"]) for r in out.collect()}
    batch = spark.read.parquet(src)
    from pyspark.sql import functions as F

    want = {
        r["w"].minute: (r["n"], r["b"])
        for r in batch.groupBy(F.window("ts", "1 minute").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.octet_length("content")).alias("b"))
        .select(F.col("win.start").alias("w"), "n", "b").collect()
    }
    assert got == want and set(got) == {0, 1, 2}


def test_streaming_dedup_across_batches(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("dedup_src"))
    _write_drop(spark, src, [(T0, 1, "same payload"), (T0 + dt.timedelta(seconds=5), 2, "unique a")])
    _write_drop(spark, src, [(T0 + dt.timedelta(seconds=20), 3, "same payload"),  # dup of batch 1
                             (T0 + dt.timedelta(seconds=30), 4, "unique b")])
    out = _run_stream(spark, src, lambda s: streaming_exact_dedup(s), "dedup_out", "append")
    users = sorted(r["user_id"] for r in out.collect())
    assert users == [1, 2, 4], users  # user 3's duplicate payload dropped


def test_stateful_sessionization_emits_closed_sessions(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("sess_src"))
    # user 7: two events 10 min apart (one session, gap 30 min)
    _write_drop(spark, src, [(T0, 7, "a"), (T0 + dt.timedelta(minutes=10), 7, "b")])
    # user 8 arrives 3 hours later: watermark sails past user 7's timeout
    _write_drop(spark, src, [(T0 + dt.timedelta(hours=3), 8, "c")])
    _write_drop(spark, src, [(T0 + dt.timedelta(hours=6), 9, "d")])
    out = _run_stream(
        spark, src, lambda s: sessionized_user_counts(s, gap_seconds=1800), "sess_out", "append"
    )
    rows = {r["user_id"]: r for r in out.collect()}
    assert 7 in rows, rows
    assert rows[7]["n_events"] == 2
    assert rows[7]["session_start"] == T0
    assert rows[7]["session_end"] == T0 + dt.timedelta(minutes=10)


def test_sessionization_splits_in_batch_gaps(spark, tmp_path_factory):
    """Two true sessions separated by more than the gap INSIDE one
    micro-batch (the availableNow catch-up shape) emit as two sessions."""
    src = str(tmp_path_factory.mktemp("sess_gap_src"))
    _write_drop(spark, src, [
        (T0, 5, "a"),
        (T0 + dt.timedelta(minutes=5), 5, "b"),
        (T0 + dt.timedelta(hours=2), 5, "c"),           # > 30-min gap, same batch
        (T0 + dt.timedelta(hours=2, minutes=1), 5, "d"),
    ])
    _write_drop(spark, src, [(T0 + dt.timedelta(hours=9), 6, "z")])  # watermark push
    out = _run_stream(
        spark, src, lambda s: sessionized_user_counts(s, gap_seconds=1800), "sess_gap", "append"
    )
    got = sorted(
        ((r["session_start"], r["session_end"], r["n_events"]) for r in out.collect()
         if r["user_id"] == 5)
    )
    assert got == [
        (T0, T0 + dt.timedelta(minutes=5), 2),
        (T0 + dt.timedelta(hours=2), T0 + dt.timedelta(hours=2, minutes=1), 2),
    ], got


def test_sessionization_late_event_extends_backward(spark, tmp_path_factory):
    """An in-watermark late event older than the stored session start lowers
    session_start (interval merge), instead of corrupting the bounds."""
    src = str(tmp_path_factory.mktemp("sess_late_src"))
    _write_drop(spark, src, [(T0 + dt.timedelta(minutes=10), 11, "a")])
    # late but within the 30-min watermark: 10 min EARLIER than stored start
    _write_drop(spark, src, [(T0, 11, "late")])
    _write_drop(spark, src, [(T0 + dt.timedelta(hours=9), 12, "z")])  # close it out
    out = _run_stream(
        spark, src, lambda s: sessionized_user_counts(s, gap_seconds=1800), "sess_late", "append"
    )
    rows = {r["user_id"]: r for r in out.collect()}
    assert rows[11]["session_start"] == T0
    assert rows[11]["session_end"] == T0 + dt.timedelta(minutes=10)
    assert rows[11]["n_events"] == 2
