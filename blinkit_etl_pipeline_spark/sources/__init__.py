from . import readers, sinks, testdata  # noqa: F401
