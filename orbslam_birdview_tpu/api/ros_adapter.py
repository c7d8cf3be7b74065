"""ROS adapter: image-callback wrappers around `System`.

Capability-equivalent of the reference's ROS nodes
(`/root/reference/Examples/ROS/ORB_SLAM2/src/ros_mono.cc`, `ros_stereo.cc`,
`ros_rgbd.cc`): a callback object per sensor mode that a rospy/rclpy
subscriber can call with decoded images. ROS itself is not imported — the
adapter is transport-agnostic (wire it to cv_bridge outputs); this keeps it
importable and testable in any environment.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from .system import System


class MonoNode:
    """`ImageGrabber::GrabImage` (ros_mono.cc)."""

    def __init__(self, system: System,
                 on_pose: Optional[Callable] = None):
        self.system = system
        self.on_pose = on_pose

    def callback(self, img: np.ndarray, stamp: float):
        fd = self.system.track_monocular(img, stamp)
        if self.on_pose is not None and fd.pose_ok:
            self.on_pose(stamp, fd.Tcw())
        return fd


class StereoNode:
    """`ImageGrabber::GrabStereo` (ros_stereo.cc) — synchronized pairs.

    With `do_rectify`, raw pairs are rectified before tracking, exactly
    the reference node's `cv::remap` path (`ros_stereo.cc:main` builds
    initUndistortRectifyMap maps from the LEFT./RIGHT. YAML blocks and
    `GrabStereo` remaps both images when `do_rectify` is set). Pass either
    a ready `StereoRectifier` or a config path containing the blocks."""

    def __init__(self, system: System, on_pose: Optional[Callable] = None,
                 rectifier=None, config_path: Optional[str] = None):
        self.system = system
        self.on_pose = on_pose
        if rectifier is None and config_path is not None:
            from ..cli.datasets import parse_rectification

            rectifier = parse_rectification(config_path)
        self.rectifier = rectifier

    def callback(self, img_left: np.ndarray, img_right: np.ndarray,
                 stamp: float):
        if self.rectifier is not None:
            img_left, img_right = self.rectifier(img_left, img_right)
        fd = self.system.track_stereo(img_left, img_right, stamp)
        if self.on_pose is not None and fd.pose_ok:
            self.on_pose(stamp, fd.Tcw())
        return fd


class RGBDNode:
    """`ImageGrabber::GrabRGBD` (ros_rgbd.cc)."""

    def __init__(self, system: System, on_pose: Optional[Callable] = None):
        self.system = system
        self.on_pose = on_pose

    def callback(self, img: np.ndarray, depth: np.ndarray, stamp: float):
        fd = self.system.track_rgbd(img, depth, stamp)
        if self.on_pose is not None and fd.pose_ok:
            self.on_pose(stamp, fd.Tcw())
        return fd


class BirdviewNode:
    """Birdview-fused callback (no reference ROS analogue — the fork's
    `mono_fisheye` driver as a node)."""

    def __init__(self, system: System, on_pose: Optional[Callable] = None):
        self.system = system
        self.on_pose = on_pose

    def callback(self, img: np.ndarray, bird: np.ndarray,
                 mask: Optional[np.ndarray], stamp: float):
        fd = self.system.track_monocular_with_birdview(img, bird, mask, stamp)
        if self.on_pose is not None and fd.pose_ok:
            self.on_pose(stamp, fd.Tcw())
        return fd
