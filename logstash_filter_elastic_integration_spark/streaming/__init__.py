from .stream import stream_pipeline  # noqa: F401
