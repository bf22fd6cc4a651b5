from .windows import windowed_event_stats, stream_events_dir, run_to_memory
from .sessions import sessionize_batch, session_stats, session_window_stats_stream

__all__ = [
    "windowed_event_stats",
    "stream_events_dir",
    "run_to_memory",
    "sessionize_batch",
    "session_stats",
    "session_window_stats_stream",
]
