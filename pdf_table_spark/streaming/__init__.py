from .incremental import extract_stream, run_incremental  # noqa: F401
