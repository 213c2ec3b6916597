from .stateful import (  # noqa: F401
    streaming_cdc,
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
