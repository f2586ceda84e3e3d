"""Streaming jobs must agree with their batch twins — the unified-model
correctness gate for the streaming surface."""


def test_stream_tumbling_equals_batch(spark, sf_dir):
    from svdmovie_lens_parallel_apache_spark_spark.catalog import REGISTRY
    from svdmovie_lens_parallel_apache_spark_spark.streaming.jobs import (
        stream_tumbling_counts,
    )

    batch = {
        (r.bucket, r.event_type): (r.n_events, r.sum_value)
        for r in REGISTRY["event_tumbling_agg"].builder(spark, sf_dir).collect()
    }
    stream = {
        (r.bucket, r.event_type): (r.n_events, r.sum_value)
        for r in stream_tumbling_counts(spark, sf_dir).collect()
    }
    assert stream == batch


def test_stream_sessions_match_batch_session_count(spark, sf_dir):
    from svdmovie_lens_parallel_apache_spark_spark.operators.windows import sessionize
    from svdmovie_lens_parallel_apache_spark_spark.sources.readers import load_table
    from svdmovie_lens_parallel_apache_spark_spark.streaming.jobs import (
        stream_session_window,
    )

    ev = load_table(spark, sf_dir, "events")
    batch_sessions = sessionize(ev, gap_minutes=30).count()
    stream_sessions = stream_session_window(spark, sf_dir).count()
    assert stream_sessions == batch_sessions
