"""Custom stateful streaming operator (applyInPandasWithState) tests."""

import os
import time

import pytest
from pyspark.sql import functions as F

from jsonld_rs_spark.streaming.sessionize import (
    GAP_US_DEFAULT,
    await_drained,
    sessionize,
    sessionize_batch_golden,
)


def test_sessionize_stream_matches_golden(spark, sf_dir, tmp_path_factory):
    in_dir = str(tmp_path_factory.mktemp("sess_in"))
    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("user_id") < 40)
        .select("user_id", "ts")
    )
    events.write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp").parquet(in_dir)
    )
    q = (
        sessionize(stream)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # availableNow + ProcessingTimeTimeout never self-terminates (it loops
    # empty cleanup batches) — drain and stop instead of a silent
    # awaitTermination timeout
    await_drained(q)
    got = {
        (
            r["user_id"],
            int(r["session_start"].timestamp() * 1_000_000),
            int(r["session_end"].timestamp() * 1_000_000),
            r["n_events"],
        )
        for r in spark.sql("select * from sessions").collect()
    }

    rows = [
        (r["user_id"], int(r["ts"].timestamp() * 1_000_000))
        for r in events.collect()
    ]
    golden = sessionize_batch_golden(rows)
    golden_closed = set(golden)

    # the stream emits only CLOSED sessions (trailing open session per user
    # stays in state at availableNow end) → got ⊆ golden, and every session
    # that is not a user's last one must have been emitted
    assert got <= golden_closed
    last_per_user = {}
    for user_id, s, e, n in sorted(golden):
        last_per_user[user_id] = (user_id, s, e, n)
    must_emit = golden_closed - set(last_per_user.values())
    assert must_emit <= got
    assert len(got) > 0


def test_flush_open_sessions_completes_available_now_replay(
    spark, sf_dir, tmp_path_factory
):
    """emitted ∪ flush_open_sessions == batch golden, exactly: the
    end-of-stream flush recovers every trailing open session an availableNow
    replay leaves in state (VERDICT r2 #7)."""
    from jsonld_rs_spark.streaming.sessionize import flush_open_sessions

    in_dir = str(tmp_path_factory.mktemp("flush_in"))
    ckpt = str(tmp_path_factory.mktemp("flush_ckpt"))
    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("user_id") < 40)
        .select("user_id", "ts")
    )
    events.write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(in_dir)
    q = (
        sessionize(stream)
        .writeStream.format("memory")
        .queryName("sessions_flush")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    await_drained(q)

    def as_tuples(rows):
        return {
            (
                r["user_id"],
                int(r["session_start"].timestamp() * 1_000_000),
                int(r["session_end"].timestamp() * 1_000_000),
                r["n_events"],
            )
            for r in rows
        }

    emitted = as_tuples(spark.sql("select * from sessions_flush").collect())
    flushed = as_tuples(flush_open_sessions(spark, ckpt).collect())
    golden = set(
        sessionize_batch_golden(
            [
                (r["user_id"], int(r["ts"].timestamp() * 1_000_000))
                for r in events.collect()
            ]
        )
    )
    assert flushed, "availableNow must leave trailing sessions in state"
    assert emitted | flushed == golden
    assert emitted.isdisjoint(flushed)
