from .monitor import (  # noqa: F401
    process_directory,
    start_monitor_stream,
    stop_on_signal,
)
