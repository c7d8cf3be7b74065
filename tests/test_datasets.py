"""Dataset-loader tests (cli/datasets.py): EuRoC stereo pairing and the
LEFT./RIGHT. rectification parser (both the reference's opencv-matrix YAML
form and this repo's flat list form)."""
import os

import cv2
import numpy as np

from orbslam_birdview_tpu.cli import datasets

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

OPENCV_MATRIX_YAML = """%YAML:1.0
LEFT.height: 480
LEFT.width: 752
LEFT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data:[-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0]
LEFT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [458.654, 0.0, 367.215, 0.0, 457.296, 248.375, 0.0, 0.0, 1.0]
LEFT.R:  !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
LEFT.P:  !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [435.2, 0, 367.45, 0,  0, 435.2, 252.2, 0,  0, 0, 1, 0]
RIGHT.height: 480
RIGHT.width: 752
RIGHT.D: !!opencv-matrix
   rows: 1
   cols: 5
   dt: d
   data:[-0.28368365, 0.07451284, -0.00010473, -3.555907e-05, 0.0]
RIGHT.K: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [457.587, 0.0, 379.999, 0.0, 456.134, 255.238, 0.0, 0.0, 1]
RIGHT.R:  !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
RIGHT.P:  !!opencv-matrix
   rows: 3
   cols: 4
   dt: d
   data: [435.2, 0, 367.45, -47.9, 0, 435.2, 252.2, 0, 0, 0, 1, 0]
"""


def test_parse_rectification_flat_form():
    rect = datasets.parse_rectification(
        os.path.join(REPO, "configs", "euroc_stereo.yaml"))
    assert rect is not None
    left = np.full((480, 752), 100, np.float32)
    right = np.full((480, 752), 50, np.float32)
    rl, rr = rect(left, right)
    assert rl.shape == (480, 752) and rr.shape == (480, 752)
    # interior of the rectified image keeps the constant intensity
    assert abs(float(rl[240, 376]) - 100.0) < 1e-3
    assert abs(float(rr[240, 376]) - 50.0) < 1e-3


def test_parse_rectification_opencv_matrix_form(tmp_path):
    p = tmp_path / "euroc_ref_style.yaml"
    p.write_text(OPENCV_MATRIX_YAML)
    rect = datasets.parse_rectification(str(p))
    assert rect is not None
    rl, rr = rect(np.zeros((480, 752), np.float32),
                  np.zeros((480, 752), np.float32))
    assert np.isfinite(rl).all() and np.isfinite(rr).all()


def test_parse_rectification_absent(tmp_path):
    p = tmp_path / "mono.yaml"
    p.write_text("Camera.fx: 500.0\nCamera.fy: 500.0\n")
    assert datasets.parse_rectification(str(p)) is None


def test_load_euroc_stereo_pairs(tmp_path):
    for cam in ("cam0", "cam1"):
        d = tmp_path / "mav0" / cam / "data"
        d.mkdir(parents=True)
        lines = ["#timestamp [ns],filename"]
        for i in range(3):
            name = f"{1403636579763555584 + i * 50000000}.png"
            val = 10 * (i + 1) + (0 if cam == "cam0" else 1)
            cv2.imwrite(str(d / name), np.full((48, 64), val, np.uint8))
            lines.append(f"{1403636579763555584 + i * 50000000},{name}")
        (tmp_path / "mav0" / cam / "data.csv").write_text("\n".join(lines))
    # cam1 misses the last frame -> that pair is skipped
    os.remove(str(tmp_path / "mav0" / "cam1" / "data" /
                  f"{1403636579763555584 + 2 * 50000000}.png"))
    recs = list(datasets.load_euroc(str(tmp_path), stereo=True))
    assert len(recs) == 2
    for i, r in enumerate(recs):
        assert r.right is not None
        assert float(r.img[0, 0]) == 10 * (i + 1)
        assert float(r.right[0, 0]) == 10 * (i + 1) + 1
    mono = list(datasets.load_euroc(str(tmp_path)))
    assert len(mono) == 3 and mono[0].right is None


def test_stereo_node_rectifies(monkeypatch):
    """StereoNode with a config path rectifies raw pairs before tracking
    (the reference `ros_stereo.cc` do_rectify path)."""
    from orbslam_birdview_tpu.api.ros_adapter import StereoNode

    calls = {}

    class FakeSystem:
        def track_stereo(self, left, right, stamp):
            calls["shapes"] = (left.shape, right.shape)
            calls["vals"] = (float(left[240, 376]), float(right[240, 376]))

            class FD:
                pose_ok = False
            return FD()

    node = StereoNode(FakeSystem(), config_path=os.path.join(
        REPO, "configs", "euroc_stereo.yaml"))
    assert node.rectifier is not None
    node.callback(np.full((480, 752), 100, np.float32),
                  np.full((480, 752), 50, np.float32), 0.0)
    assert calls["shapes"] == ((480, 752), (480, 752))
    assert abs(calls["vals"][0] - 100.0) < 1e-3
    assert abs(calls["vals"][1] - 50.0) < 1e-3
