from . import ba, ba_large, pose_opt, residuals  # noqa: F401
