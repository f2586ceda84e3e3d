"""Catalog part 4: Structured Streaming + multimodal queries (rows-only).

Streaming results and pandas-UDF media extraction aren't ANSI-SQL
expressible, so these carry no oracle (driver records the weaker
rows-only check); their correctness gates live in tests instead:
streaming results are asserted equal to their batch twins
(tests/test_streaming.py), and media features are asserted deterministic
(tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .catalog import _t, register
from .operators.multimodal import attach_fake_media, extract_media_features, frame_sample
from .streaming.jobs import (
    stream_session_window,
    stream_tumbling_counts,
    stream_user_totals_stateful,
)


@register(
    "streaming_tumbling_counts",
    None,
    tags=("streaming", "window", "watermark"),
    description="Structured Streaming 1h tumbling window + watermark over the events "
    "file source (availableNow trigger → memory sink). Batch twin: event_tumbling_agg; "
    "equality asserted in tests/test_streaming.py.",
)
def q_streaming_tumbling(spark, sf_dir):
    return stream_tumbling_counts(spark, sf_dir)


@register(
    "streaming_session_window",
    None,
    tags=("streaming", "session", "stateful"),
    description="Native session_window stateful aggregation (30-min gap) on the event "
    "stream. Batch twin: sessionize; per-user session counts asserted equal in tests.",
)
def q_streaming_sessions(spark, sf_dir):
    return stream_session_window(spark, sf_dir)


@register(
    "streaming_stateful_user_totals",
    None,
    tags=("streaming", "stateful", "applyInPandasWithState"),
    description="Custom stateful streaming operator (applyInPandasWithState): per-user "
    "running totals with explicit state across micro-batches. Batch twin equality "
    "asserted in tests/test_streaming.py.",
)
def q_streaming_stateful(spark, sf_dir):
    return stream_user_totals_stateful(spark, sf_dir)


@register(
    "multimodal_features",
    None,
    tags=("multimodal", "mapInPandas", "binary"),
    description="Opaque-binary media column + Arrow-batched mapInPandas feature "
    "extraction (decode stubbed deterministically — real codecs not in container; "
    "schema/batching/UDF plumbing is real and deterministic).",
)
def q_multimodal_features(spark, sf_dir):
    media = attach_fake_media(_t(spark, sf_dir, "documents"))
    return extract_media_features(media)


@register(
    "multimodal_frame_sample",
    None,
    tags=("multimodal", "binary"),
    description="Frame sampling over the binary media column as pure JVM byte-slicing "
    "(every 2nd 16-byte frame) — no Python in the loop.",
)
def q_multimodal_frames(spark, sf_dir):
    media = attach_fake_media(_t(spark, sf_dir, "documents"))
    return frame_sample(media, every_k=2).select("doc_id", "n_sampled_frames")


@register(
    "streaming_sliding_counts",
    None,
    tags=("streaming", "window", "sliding"),
    description="Hopping-window (1h/30m) streaming aggregation with watermark; "
    "each event lands in two windows held in the state store. Batch twin: "
    "sliding_window_agg; equality asserted in tests/test_streaming.py.",
)
def q_streaming_sliding(spark, sf_dir):
    from .streaming.jobs import stream_sliding_counts

    return stream_sliding_counts(spark, sf_dir)


@register(
    "streaming_click_attribution",
    None,
    tags=("streaming", "join", "stream-stream"),
    description="Stream-stream inner join (clicks ⋈ purchases within 1h, both "
    "sides watermarked, event-time range constraint bounds join state). Batch "
    "twin with exact oracle: click_purchase_attribution; equality asserted in "
    "tests/test_streaming.py.",
)
def q_streaming_click_attribution(spark, sf_dir):
    from .streaming.jobs import stream_click_attribution

    return stream_click_attribution(spark, sf_dir)


@register(
    "streaming_dedup",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
    tags=("streaming", "dedup", "watermark"),
    description="Streaming exact dedup (dropDuplicatesWithinWatermark) on "
    "(user_id, event_type): watermark-bounded key state — the streaming twin of "
    "exact_dedup_groups. Key-projected output is deterministic, so this streaming "
    "query carries an EXACT oracle (batch DISTINCT).",
)
def q_streaming_dedup(spark, sf_dir):
    from .streaming.jobs import stream_dedup_keys

    return stream_dedup_keys(spark, sf_dir)


@register(
    "streaming_incremental_rollup",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           floor((CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)) * 1e3 + 0.5) / 1e3
             AS total_value,
           CAST(max(floor(epoch(ts))) AS BIGINT) AS last_epoch_s
    FROM events GROUP BY user_id
    """,
    tags=("streaming", "incremental", "foreachBatch"),
    description="Streaming materialized-view maintenance: foreachBatch merges "
    "each micro-batch's per-user partial aggregate into a versioned parquet "
    "rollup via the commutative-monoid combine (count add, DECIMAL sum add, "
    "max of maxes) — the MERGE-into-warehouse deploy pattern. DECIMAL "
    "accumulation makes the maintained state EXACTLY equal the one-shot batch "
    "aggregate, so this streaming query carries an exact oracle; the "
    "multi-micro-batch merge path is exercised in tests/test_streaming.py "
    "with a two-file split source.",
)
def q_streaming_incremental_rollup(spark, sf_dir):
    import tempfile

    from pyspark.sql import functions as F

    from .functions.scalar import portable_round as _r
    from .streaming.jobs import stream_incremental_rollup

    state = tempfile.mkdtemp(prefix="svdml-incr-rollup-")
    final = stream_incremental_rollup(
        spark, sf_dir, state, glob="events.parquet", raw_nanos=True
    )
    return final.select(
        "user_id",
        "n_events",
        _r(F.col("tot").cast("double"), 3).alias("total_value"),
        "last_epoch_s",
    )
