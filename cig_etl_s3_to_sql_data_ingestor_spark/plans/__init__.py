from . import worklist  # noqa: F401
