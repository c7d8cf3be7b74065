from . import ba, pose_opt, residuals  # noqa: F401
