from .events import (  # noqa: F401
    run_available_now,
    stream_session_windows,
    stream_tumbling_counts,
)
from .ingest import stream_ingest_cards  # noqa: F401
from .stateful import stream_dedup_events  # noqa: F401
