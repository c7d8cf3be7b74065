"""Negative loop-closing tests (VERDICT r4 item 7).

The reference's main defense against perceptual aliasing is layered
(`src/LoopClosing.cc:103-400`): a BoW candidate must (a) be re-detected
with covisibility-consistent groups on 3 CONSECUTIVE keyframes
(`mnCovisibilityConsistencyTh=3`), then (b) survive Sim3 RANSAC +
reprojection gating on actual map geometry. These tests prove both
layers reject false candidates in this engine; the positive path is
covered by tests/test_loop_closing.py.
"""
import numpy as np
import pytest

from orbslam_birdview_tpu.api import SlamConfig
from orbslam_birdview_tpu.api.system import System
from orbslam_birdview_tpu.core.camera import PinholeCamera
from orbslam_birdview_tpu.frontend.orb import ORBConfig
from orbslam_birdview_tpu.utils.synth import WallSequence

CAM = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                    width=640, height=480)


@pytest.fixture(scope="module")
def slam_map():
    """A real map from a short monocular run (shared by the tests — they
    only read/stub, never mutate the store)."""
    cfg = SlamConfig(camera=CAM, orb=ORBConfig(n_features=800),
                     sensor="mono")
    cfg.tracking.max_frames_between_kf = 4  # dense mints -> enough KFs
    seq = WallSequence(CAM, n_frames=70, step=0.02, push=0.003)
    sys_ = System(cfg)
    for i in range(70):
        img, _ = seq.frame(i)
        sys_.track_monocular(np.clip(img, 0, 255).astype(np.uint8),
                             i / 30.0)
    sys_._flush()
    assert sys_.loop_closer is not None
    assert sys_.loop_closer.voc is not None, "vocabulary never installed"
    return sys_


def test_transient_alias_rejected_by_consistency(slam_map):
    """A candidate that appears ONCE (a transient BoW aliasing hit) must
    never pass the 3-consecutive-consistent-groups gate, and a detection
    gap must reset the accumulated consistency."""
    sys_ = slam_map
    lc = sys_.loop_closer
    store = sys_.store
    valid = store.valid_kf_ids()
    assert len(valid) >= 8
    kf_new = int(valid[-1])
    kf_far = int(valid[0])
    orig = lc.kfdb.detect_loop_candidates
    calls = {"n": 0}

    def fake(kf, min_score):
        calls["n"] += 1
        return np.array([kf_far]) if calls["n"] == 1 else np.array([])

    lc.kfdb.detect_loop_candidates = fake
    lc.consistent_groups = []
    try:
        # first sighting: consistency 0 < 3 -> rejected, group remembered
        assert lc._detect_loop(kf_new) == []
        assert len(lc.consistent_groups) == 1
        # detection gap: groups reset (the reference clears
        # mvConsistentGroups when the database returns nothing)
        assert lc._detect_loop(kf_new) == []
        assert lc.consistent_groups == []
    finally:
        lc.kfdb.detect_loop_candidates = orig


def test_persistent_alias_needs_three_consecutive(slam_map):
    """A persistently re-detected candidate passes the consistency gate
    only after 3 consecutive covisibility-consistent sightings — never
    earlier (the reference's mnCovisibilityConsistencyTh=3 semantics)."""
    sys_ = slam_map
    lc = sys_.loop_closer
    store = sys_.store
    valid = store.valid_kf_ids()
    kf_new = int(valid[-1])
    kf_far = int(valid[0])
    orig = lc.kfdb.detect_loop_candidates
    lc.kfdb.detect_loop_candidates = \
        lambda kf, min_score: np.array([kf_far])
    lc.consistent_groups = []
    try:
        assert lc._detect_loop(kf_new) == []       # consistency 0
        assert lc._detect_loop(kf_new) == []       # 1
        assert lc._detect_loop(kf_new) == []       # 2
        assert lc._detect_loop(kf_new) == [kf_far]  # 3 -> accepted
    finally:
        lc.kfdb.detect_loop_candidates = orig


def test_aliased_descriptors_rejected_by_geometry(slam_map):
    """Perceptual aliasing injected at the DESCRIPTOR level: an old,
    non-covisible keyframe gets the newest keyframe's descriptors
    verbatim, so descriptor matching produces abundant candidate pairs —
    but the matched landmark pairs are geometrically unrelated (the kp
    orderings index different 3D points), so Sim3 RANSAC + the
    reprojection gates must reject the candidate
    (`LoopClosing::ComputeSim3` semantics, src/LoopClosing.cc:231-400)."""
    sys_ = slam_map
    lc = sys_.loop_closer
    store = sys_.store
    valid = store.valid_kf_ids()
    kf_new = int(valid[-1])
    kf_far = int(valid[0])
    desc_backup = store.kf_desc[kf_far].copy()
    store.kf_desc[kf_far] = store.kf_desc[kf_new].copy()
    try:
        res = lc._compute_sim3(kf_new, kf_far)
        assert res is None, "geometric gates accepted an aliased non-loop"
    finally:
        store.kf_desc[kf_far] = desc_backup
