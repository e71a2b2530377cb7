from .ingest import (
    drain_available_now,
    stream_etl_available_now,
    windowed_event_counts,
)

__all__ = [
    "drain_available_now",
    "stream_etl_available_now",
    "windowed_event_counts",
]
