from . import sharded_ba  # noqa: F401
