from . import checkpoint, curves, io, profiling  # noqa: F401
