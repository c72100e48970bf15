from . import alloc, tracing  # noqa: F401
