from .windows import stream_window_counts  # noqa: F401
