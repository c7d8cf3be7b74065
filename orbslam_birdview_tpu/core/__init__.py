from . import camera, lie, robust  # noqa: F401
