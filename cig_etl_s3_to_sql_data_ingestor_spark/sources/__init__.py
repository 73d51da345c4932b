from . import jdbc, parquet_tree  # noqa: F401
