from .event_windows import (  # noqa: F401
    streaming_tumbling_hourly,
    streaming_session_windows,
    streaming_dedup,
)
