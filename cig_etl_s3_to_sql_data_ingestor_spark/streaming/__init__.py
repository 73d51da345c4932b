from . import ingest_stream  # noqa: F401
