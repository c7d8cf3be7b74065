from . import keypoints, matcher, orb  # noqa: F401
