from .windows import tumbling_agg, sliding_agg, session_agg, streaming_events_source, windowed_stream

__all__ = [
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "streaming_events_source",
    "windowed_stream",
]
