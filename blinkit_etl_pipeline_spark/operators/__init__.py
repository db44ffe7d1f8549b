from . import agg, clean, derive, joins  # noqa: F401
