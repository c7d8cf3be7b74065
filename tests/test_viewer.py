"""Live viewer side-car: HTTP endpoints, menu actions, non-draining reads.

The reference's viewer is an interactive Pangolin thread
(`/root/reference/src/Viewer.cc:54-169`) with menu toggles for follow
camera / show points / show graph / localization mode / reset; here the
same surface is an HTTP side-car (`utils/live_viewer.py`) and these tests
drive it headlessly with urllib — including the Viewer::Run menu actions
(localization mode switch, reset) against a live System.
"""
import json
import urllib.request

import numpy as np
import pytest

from orbslam_birdview_tpu.api import SlamConfig
from orbslam_birdview_tpu.api.system import System
from orbslam_birdview_tpu.core.camera import PinholeCamera
from orbslam_birdview_tpu.frontend.orb import ORBConfig
from orbslam_birdview_tpu.utils.live_viewer import LiveViewer
from orbslam_birdview_tpu.utils.synth import WallSequence

CAM = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                    width=640, height=480)


def _get(url, timeout=10):
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:  # non-2xx still carries a body
        return e.code, e.read()


def _post(url, timeout=10):
    req = urllib.request.Request(url, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


@pytest.mark.slow
def test_live_viewer_endpoints():
    cfg = SlamConfig(camera=CAM, orb=ORBConfig(n_features=800),
                     sensor="mono")
    seq = WallSequence(CAM, n_frames=14, step=0.03)
    sys_ = System(cfg)
    viewer = LiveViewer(sys_).start()
    try:
        # page + empty-state snapshot respond before any frame
        st, body = _get(viewer.url)
        assert st == 200 and b"Follow Camera" in body
        st, body = _get(viewer.url + "state")
        snap = json.loads(body)
        assert snap["n_kf"] == 0

        # /frame before any client fetch: update_frame must be a no-op
        # (no PNG encode on the frame path with no browser attached), so
        # the endpoint 404s until a fetch-then-update cycle happens
        st, _ = _get(viewer.url + "frame")
        assert st == 404

        for i in range(14):
            img, _ = seq.frame(i)
            fd = sys_.track_monocular(
                np.clip(img, 0, 255).astype(np.uint8), i / 30.0)
            viewer.update_frame(img, fd)
        sys_._flush()

        st, body = _get(viewer.url + "state")
        snap = json.loads(body)
        assert st == 200
        assert snap["state"] == 1          # OK
        assert snap["n_kf"] >= 2
        assert len(snap["pts"]) == 3 * min(snap["n_mp"], 20000) \
            or len(snap["pts"]) > 0        # downsampled triplets
        assert len(snap["kfs"]) == 3 * snap["n_kf"]
        assert "cam" in snap and len(snap["cam"]) == 3
        assert "traj" in snap and len(snap["traj"]) % 3 == 0

        # frame overlay: a client fetch marks the viewer active for ~5 s
        # (the tracking loop above can outlast the first fetch's window),
        # after which update_frame encodes and the endpoint serves PNG
        _get(viewer.url + "frame")
        img, _ = seq.frame(13)
        viewer.update_frame(img, sys_.tracker.last_frame)
        st, body = _get(viewer.url + "frame")
        assert st == 200 and body[:4] == b"\x89PNG"

        def drive_one(i):
            """POSTed menu actions are DEFERRED flags consumed at the next
            track_* call on the tracking thread (System.cc:140-208
            protocol) — drive one frame to apply them."""
            img, _ = seq.frame(i)
            sys_.track_monocular(np.clip(img, 0, 255).astype(np.uint8),
                                 (20 + i) / 30.0)

        # menu actions (Viewer::Run): localization mode toggle + reset
        st, body = _post(viewer.url + "cmd?action=localization_on")
        assert st == 200 and json.loads(body)["ok"]
        # snapshot reflects the pending request immediately (UI checkbox)
        st, body = _get(viewer.url + "state")
        assert json.loads(body)["localization"] is True
        drive_one(0)
        assert sys_.localization_only is True
        st, _ = _post(viewer.url + "cmd?action=localization_off")
        assert st == 200
        drive_one(1)
        assert sys_.localization_only is False
        st, body = _get(viewer.url + "state")
        assert json.loads(body)["localization"] is False

        st, _ = _post(viewer.url + "cmd?action=reset")
        assert st == 200
        drive_one(2)
        st, body = _get(viewer.url + "state")
        assert json.loads(body)["n_kf"] == 0   # map cleared

        # unknown action rejected
        st, body = _post(viewer.url + "cmd?action=nonsense")
        assert st == 400
    finally:
        viewer.stop()
