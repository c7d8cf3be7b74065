from . import device_ops, frame, local_mapping, tracking  # noqa: F401
