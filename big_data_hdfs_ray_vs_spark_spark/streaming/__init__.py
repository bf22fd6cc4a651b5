from .windows import (
    windowed_event_stats,
    windowed_value_histogram,
    stream_events_dir,
    run_to_memory,
)
from .sessions import sessionize_batch, session_stats, session_window_stats_stream
from .stateful import anomaly_flags_stream, anomaly_flags_batch, anomaly_flags_prefix
from .dedup import dedup_stream
from .enrich import enrich_stream, user_profile_dim
from .joins import interval_join_batch, interval_join_stream
from .drift import reference_shares, windowed_psi

__all__ = [
    "dedup_stream",
    "enrich_stream",
    "interval_join_batch",
    "interval_join_stream",
    "user_profile_dim",
    "windowed_event_stats",
    "windowed_value_histogram",
    "stream_events_dir",
    "run_to_memory",
    "sessionize_batch",
    "session_stats",
    "session_window_stats_stream",
    "anomaly_flags_stream",
    "anomaly_flags_batch",
    "anomaly_flags_prefix",
    "reference_shares",
    "windowed_psi",
]
