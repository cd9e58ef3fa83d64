from .ingest import stream_load_hhs  # noqa: F401
from .sketch import stream_count_min_cells  # noqa: F401
from .stateful import stateful_user_totals  # noqa: F401
from .windows import (  # noqa: F401
    stream_dedup_events,
    stream_dedup_ingest,
    stream_session_windows,
    stream_window_counts,
)
