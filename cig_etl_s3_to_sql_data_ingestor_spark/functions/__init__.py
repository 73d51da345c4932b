from . import exact, vectors  # noqa: F401
