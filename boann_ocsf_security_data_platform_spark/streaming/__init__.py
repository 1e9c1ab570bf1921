from .monitor import (  # noqa: F401
    make_subprocess_validator,
    process_directory,
    start_monitor_stream,
    stop_on_signal,
)
