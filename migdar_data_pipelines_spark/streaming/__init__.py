from .stateful import (  # noqa: F401
    streaming_cdc,
    streaming_ewma,
    streaming_first_seen,
)
from .windows import (  # noqa: F401
    tumbling_agg,
    sliding_agg,
    sessionize,
    session_window_agg,
    read_events_stream,
    run_available_now,
)
from .sinks import stream_merge_into_lakehouse  # noqa: F401
from .windows import dedup_within_watermark  # noqa: F401
