"""ROS1 transport wiring tests (api/ros_adapter.run_ros1) with injected
fake ROS modules — the container has no ROS, so the wiring contract
(subscription topology, message decode, synchronizer fan-in, pose
publication) is verified against lightweight fakes. Reference surface:
`Examples/ROS/ORB_SLAM2/src/ros_mono.cc` / `ros_stereo.cc` mains."""
import types

import numpy as np

from orbslam_birdview_tpu.api import ros_adapter as ra


class FakeStamp:
    def __init__(self, t):
        self.secs = int(t)
        self.nsecs = int((t - int(t)) * 1e9)


class FakeImageMsg:
    def __init__(self, arr, encoding, stamp=0.0):
        arr = np.asarray(arr)
        self.height, self.width = arr.shape[:2]
        if encoding in ("bgr8", "rgb8"):
            self.step = self.width * 3
        elif encoding in ("mono16", "16uc1"):
            self.step = self.width * 2
        elif encoding == "32fc1":
            self.step = self.width * 4
        else:
            self.step = self.width
        self.encoding = encoding
        self.data = arr.tobytes()
        self.header = types.SimpleNamespace(stamp=FakeStamp(stamp))


class FakeRospy:
    def __init__(self):
        self.subs = []
        self.pubs = []

    def Publisher(self, topic, msg_type, queue_size=5):
        pub = types.SimpleNamespace(topic=topic, msgs=[],
                                    publish=None)
        pub.publish = pub.msgs.append
        self.pubs.append(pub)
        return pub

    def Subscriber(self, topic, msg_type, cb, queue_size=5):
        self.subs.append((topic, cb))

    def spin(self):
        raise AssertionError("tests pass spin=False")


class FakeMFSubscriber:
    def __init__(self, topic, msg_type):
        self.topic = topic


class FakeSynchronizer:
    last = None

    def __init__(self, subs, queue_size, slop):
        self.subs = subs
        self.cb = None
        FakeSynchronizer.last = self

    def registerCallback(self, cb):
        self.cb = cb


def make_fake_ros():
    class _PoseStamped:
        def __init__(self):
            self.header = types.SimpleNamespace(stamp=None)
            self.pose = types.SimpleNamespace(
                position=types.SimpleNamespace(x=0, y=0, z=0),
                orientation=types.SimpleNamespace(w=1, x=0, y=0, z=0))

    ros = types.SimpleNamespace(
        rospy=FakeRospy(),
        message_filters=types.SimpleNamespace(
            Subscriber=FakeMFSubscriber,
            ApproximateTimeSynchronizer=FakeSynchronizer),
        geometry_msgs=types.SimpleNamespace(PoseStamped=_PoseStamped),
        sensor_msgs=types.SimpleNamespace(Image=object),
    )
    return ros


def test_decode_image_msg_encodings():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert np.array_equal(ra.decode_image_msg(FakeImageMsg(g, "mono8")), g)
    d = (np.arange(12, dtype=np.uint16) * 100).reshape(3, 4)
    assert np.array_equal(
        ra.decode_image_msg(FakeImageMsg(d, "16uc1")), d)
    f = np.linspace(0, 1, 12, dtype=np.float32).reshape(3, 4)
    assert np.allclose(ra.decode_image_msg(FakeImageMsg(f, "32fc1")), f)
    bgr = np.zeros((2, 2, 3), np.uint8)
    bgr[..., 2] = 100  # red channel in BGR order
    gray = ra.decode_image_msg(FakeImageMsg(bgr, "bgr8"))
    assert abs(float(gray[0, 0]) - 29.9) < 0.5  # 0.299 * 100


class RecordingSystem:
    """System stand-in recording callback invocations."""

    def __init__(self):
        self.calls = []

    def _fd(self):
        fd = types.SimpleNamespace(pose_ok=True)
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [1.0, 2.0, 3.0]
        fd.Tcw = lambda: T
        return fd

    def track_monocular(self, img, stamp):
        self.calls.append(("mono", img.shape, stamp))
        return self._fd()

    def track_stereo(self, l, r, stamp):
        self.calls.append(("stereo", l.shape, r.shape, stamp))
        return self._fd()

    def track_rgbd(self, img, depth, stamp):
        self.calls.append(("rgbd", img.shape, depth.dtype, stamp))
        return self._fd()


def test_run_ros1_mono_subscribes_and_publishes():
    ros = make_fake_ros()
    sysr = RecordingSystem()
    pub = ra.run_ros1(ra.MonoNode(sysr), "/camera/image_raw",
                      ros=ros, spin=False)
    assert len(ros.rospy.subs) == 1
    topic, cb = ros.rospy.subs[0]
    assert topic == "/camera/image_raw"
    cb(FakeImageMsg(np.zeros((48, 64), np.uint8), "mono8", stamp=1.5))
    assert sysr.calls[0][0] == "mono"
    assert abs(sysr.calls[0][2] - 1.5) < 1e-9
    assert len(pub.msgs) == 1
    # published pose is Twc: twc = -R^T t = -t for identity R
    p = pub.msgs[0].pose.position
    assert (p.x, p.y, p.z) == (-1.0, -2.0, -3.0)


def test_run_ros1_stereo_synchronized():
    ros = make_fake_ros()
    sysr = RecordingSystem()
    pub = ra.run_ros1(ra.StereoNode(sysr),
                      ("/cam0/image_raw", "/cam1/image_raw"),
                      ros=ros, spin=False)
    sync = FakeSynchronizer.last
    assert [s.topic for s in sync.subs] == ["/cam0/image_raw",
                                            "/cam1/image_raw"]
    left = FakeImageMsg(np.zeros((48, 64), np.uint8), "mono8", stamp=2.0)
    right = FakeImageMsg(np.zeros((48, 64), np.uint8), "mono8", stamp=2.0)
    sync.cb(left, right)
    assert sysr.calls[0][0] == "stereo"
    assert len(pub.msgs) == 1


def test_run_ros1_rgbd_depth_passthrough():
    ros = make_fake_ros()
    sysr = RecordingSystem()
    ra.run_ros1(ra.RGBDNode(sysr),
                ("/camera/rgb", "/camera/depth"), ros=ros, spin=False)
    sync = FakeSynchronizer.last
    rgb = FakeImageMsg(np.zeros((48, 64), np.uint8), "mono8", stamp=3.0)
    depth = FakeImageMsg(np.full((48, 64), 5000, np.uint16), "16uc1",
                         stamp=3.0)
    sync.cb(rgb, depth)
    assert sysr.calls[0][0] == "rgbd"
    assert sysr.calls[0][2] == np.uint16
