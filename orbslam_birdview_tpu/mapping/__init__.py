from . import mapstore  # noqa: F401
