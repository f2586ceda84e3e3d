from .jobs import (  # noqa: F401
    events_stream,
    run_available_now,
    stream_session_window,
    stream_tumbling_counts,
)
