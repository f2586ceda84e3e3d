"""Live multi-micro-batch streaming gates (round-4 verdict items #4/#7).

The catalog's streaming oracles drain a ONE-file availableNow source —
correct, but a single micro-batch never exercises cross-batch state: the
state store carrying per-user totals between commits, session windows
merging across batch boundaries, the watermark actually advancing. These
tests do:

- a file-split source (the events fixture written as 4 time-ordered
  parquet files, ``maxFilesPerTrigger=1``) → 4 deterministic micro-batches
  over the exact fixture rows, so final state must equal the batch twin
  bit-for-bit;
- a ``rate`` source driven by processing-time triggers — a genuinely
  continuous query (``isStreaming``, ≥3 commits, stopped by the test) with
  a closed-form ground truth (rate's value column is 0,1,2,...);
- the same stateful drains under the RocksDB state-store provider — what
  a real 100 TB deployment runs (DEPLOY.md) — asserting provider choice
  never changes results.
"""

import json
import tempfile
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T


def _split_events_by_ts(spark, sf_dir, n_files=4):
    """Write the events fixture as n time-ordered parquet files so a
    maxFilesPerTrigger=1 stream replays it in n micro-batches with the
    watermark advancing monotonically."""
    from pyspark.sql import Window

    from svdmovie_lens_parallel_apache_spark_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").orderBy("ts", "event_id").cache()
    n = ev.count()
    rows_per = (n + n_files - 1) // n_files
    ranked = ev.withColumn("__rk", F.row_number().over(Window.orderBy("ts", "event_id")))
    out_dir = tempfile.mkdtemp(prefix="svdml-evsplit-")
    for i in range(n_files):
        chunk = ranked.where(
            (F.col("__rk") > i * rows_per) & (F.col("__rk") <= (i + 1) * rows_per)
        ).drop("__rk")
        chunk.coalesce(1).write.mode("append").parquet(out_dir)
        time.sleep(0.05)  # distinct mtimes -> oldest-first file order
    ev.unpersist()
    return out_dir, n


def _stream_from_dir(spark, path):
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def _drain_with_progress(result, name, mode):
    assert result.isStreaming
    ckpt = tempfile.mkdtemp(prefix=f"svdml-ckpt-{name}-")
    spark = result.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progress = [p if isinstance(p, dict) else json.loads(p) for p in q.recentProgress]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return progress


def _batch_user_totals(spark, sf_dir):
    from svdmovie_lens_parallel_apache_spark_spark.sources.readers import load_table

    return {
        r.user_id: (r.n, r.s)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.floor(F.sum("value") * 1e4 + 0.5) / 1e4).alias("s"),
        )
        .collect()
    }


def test_stateful_totals_across_four_micro_batches(spark, sf_dir):
    from svdmovie_lens_parallel_apache_spark_spark.streaming.jobs import (
        latest_user_totals,
        user_totals_stateful_transform,
    )

    src_dir, n_rows = _split_events_by_ts(spark, sf_dir, n_files=4)
    agg = user_totals_stateful_transform(_stream_from_dir(spark, src_dir))
    progress = _drain_with_progress(agg, "live_stateful_totals", "update")

    data_batches = [p for p in progress if p.get("numInputRows", 0) > 0]
    assert len(data_batches) >= 3, (
        f"expected >=3 data micro-batches, got {len(data_batches)}: "
        f"{[p.get('numInputRows') for p in progress]}"
    )
    assert sum(p["numInputRows"] for p in data_batches) == n_rows

    final = {
        r.user_id: (r.n_events, r.sum_value)
        for r in latest_user_totals(spark.table("live_stateful_totals")).collect()
    }
    assert final == _batch_user_totals(spark, sf_dir)
    spark.catalog.dropTempView("live_stateful_totals")


def test_session_windows_merge_across_batches_with_watermark(spark, sf_dir):
    """Cross-batch session-state merging: a 4-batch replay must produce the
    SAME sessions as the 1-batch drain, and the watermark must actually
    advance between micro-batches (the state-eviction trigger at scale)."""
    from svdmovie_lens_parallel_apache_spark_spark.streaming.jobs import (
        session_window_transform,
        stream_session_window,
    )

    single = {
        (r.user_id, r.session_start_s, r.session_end_s, r.n_events)
        for r in stream_session_window(spark, sf_dir).collect()
    }
    spark.catalog.dropTempView("stream_session_window")

    src_dir, _ = _split_events_by_ts(spark, sf_dir, n_files=4)
    agg = session_window_transform(_stream_from_dir(spark, src_dir))
    progress = _drain_with_progress(agg, "live_session_window", "complete")

    data_batches = [p for p in progress if p.get("numInputRows", 0) > 0]
    assert len(data_batches) >= 3
    watermarks = [
        p["eventTime"]["watermark"]
        for p in progress
        if p.get("eventTime", {}).get("watermark")
    ]
    assert len(set(watermarks)) >= 2, f"watermark never advanced: {watermarks}"
    assert watermarks == sorted(watermarks)

    multi = {
        (r.user_id, r.session_start_s, r.session_end_s, r.n_events)
        for r in spark.table("live_session_window").collect()
    }
    assert multi == single
    spark.catalog.dropTempView("live_session_window")


def test_rate_source_continuous_query(spark):
    """A genuinely continuous query: rate source, processing-time triggers,
    stopped by the test after its bounded prefix (value < 120) is fully
    absorbed. Rate's value column is 0,1,2,..., so the expected final
    state is closed-form."""
    from svdmovie_lens_parallel_apache_spark_spark.streaming.jobs import (
        latest_user_totals,
        user_totals_stateful_transform,
    )

    # 12 rows/s over 10s of stream time: even a slow (~5s) query startup
    # leaves >=5s of live arrivals across >=10 half-second triggers, so the
    # >=3-commit assertion has wide margin on a loaded host
    n_vals, n_users = 120, 7
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 12)
        .load()
        .where(F.col("value") < n_vals)
        .select(
            (F.col("value") % n_users).cast("long").alias("user_id"),
            (F.col("value") * 0.5).alias("value"),
        )
    )
    agg = user_totals_stateful_transform(src)
    assert agg.isStreaming
    ckpt = tempfile.mkdtemp(prefix="svdml-ckpt-rate-")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    q = (
        agg.writeStream.format("memory")
        .queryName("live_rate_totals")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        absorbed = 0
        while time.time() < deadline:
            row = (
                latest_user_totals(spark.table("live_rate_totals"))
                .agg(F.sum("n_events").alias("n"))
                .collect()[0]
            )
            absorbed = row.n or 0
            if absorbed == n_vals:
                break
            time.sleep(0.5)
        assert absorbed == n_vals, f"absorbed only {absorbed}/{n_vals} rows"
        commits = [p for p in q.recentProgress if p.get("numInputRows", 0) > 0]
        assert len(commits) >= 3, (
            f"expected >=3 non-empty commits, got {len(commits)}"
        )
    finally:
        q.stop()
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    final = {
        r.user_id: (r.n_events, r.sum_value)
        for r in latest_user_totals(spark.table("live_rate_totals")).collect()
    }
    expected = {}
    for u in range(n_users):
        vals = [v for v in range(n_vals) if v % n_users == u]
        s = sum(v * 0.5 for v in vals)
        import math

        expected[u] = (len(vals), math.floor(s * 1e4 + 0.5) / 1e4)
    assert final == expected
    spark.catalog.dropTempView("live_rate_totals")


def test_stateful_ops_under_rocksdb_state_store(spark, sf_dir):
    """Provider swap: the stateful totals and session windows must produce
    identical results under RocksDBStateStoreProvider — the state store
    every real 100 TB deployment runs (state spills to disk instead of
    living on the executor heap)."""
    from svdmovie_lens_parallel_apache_spark_spark.streaming.jobs import (
        latest_user_totals,
        session_window_transform,
        stream_session_window,
        user_totals_stateful_transform,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    prev = spark.conf.get(key, None)

    baseline_sessions = {
        (r.user_id, r.session_start_s, r.session_end_s, r.n_events)
        for r in stream_session_window(spark, sf_dir).collect()
    }
    spark.catalog.dropTempView("stream_session_window")

    src_dir, _ = _split_events_by_ts(spark, sf_dir, n_files=4)
    try:
        spark.conf.set(key, rocks)

        agg = user_totals_stateful_transform(_stream_from_dir(spark, src_dir))
        _drain_with_progress(agg, "rocks_stateful_totals", "update")
        final = {
            r.user_id: (r.n_events, r.sum_value)
            for r in latest_user_totals(spark.table("rocks_stateful_totals")).collect()
        }
        assert final == _batch_user_totals(spark, sf_dir)

        sess = session_window_transform(_stream_from_dir(spark, src_dir))
        _drain_with_progress(sess, "rocks_session_window", "complete")
        rocks_sessions = {
            (r.user_id, r.session_start_s, r.session_end_s, r.n_events)
            for r in spark.table("rocks_session_window").collect()
        }
        assert rocks_sessions == baseline_sessions
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
        for v in ("rocks_stateful_totals", "rocks_session_window"):
            try:
                spark.catalog.dropTempView(v)
            except Exception:
                pass
