"""E2E at the REFERENCE'S feature budget (VERDICT r3 item 1): the shipped
KITTI / fisheye-birdview configs specify 2000 ORB features per stream —
the settings of `/root/reference/Examples/Monocular/fisheye.yaml:28-41`
and `/root/reference/src/Frame.cc:329` — and round 3 crashed with an
IndexError the moment a keypoint index reached the hard-coded 1024-slot
store cap. These tests drive synthetic sequences THROUGH the repo's own
YAML configs to completion, asserting the store capacity follows the
extractor budget."""
import numpy as np
import pytest

from orbslam_birdview_tpu.api.config import SlamConfig
from orbslam_birdview_tpu.api.system import System
from orbslam_birdview_tpu.core.camera import BirdviewCamera, PinholeCamera
from orbslam_birdview_tpu.pipeline.tracking import OK
from orbslam_birdview_tpu.utils.synth import BirdSequence, WallSequence

CONFIGS = "configs"


def _repo_path(name):
    import os

    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), CONFIGS, name)


@pytest.mark.slow
def test_kitti_mono_config_runs_at_budget():
    cfg = SlamConfig.from_yaml(_repo_path("kitti00-02_mono.yaml"),
                               sensor="mono")
    assert cfg.orb.n_features == 2000
    sys_ = System(cfg)
    # store capacity must follow the extractor budget, not a constant
    assert sys_.store.kp_cap >= 2000
    # render at the config's own KITTI intrinsics; shorter + coarser than
    # the real sequence but the full feature budget
    seq = WallSequence(cfg.camera, n_frames=16, wall_z=12.0, step=0.25,
                      push=0.02)
    for i in range(16):
        img, _ = seq.frame(i)
        sys_.track_monocular(np.clip(img, 0, 255).astype(np.uint8), i / 10.0)
    sys_._flush()
    assert sys_.tracker.state == OK
    assert sys_.n_keyframes() >= 2
    # the budget actually materialized: keyframes carry >1024 valid slots
    used = sys_.store.kf_kp_valid[: sys_.store.n_kf].sum(1)
    assert used.max() > 1024, f"max keypoints/KF {used.max()}"


@pytest.mark.slow
def test_fisheye_birdview_config_runs_at_budget():
    """The fork's signature mode at its specified budget: 2000 front +
    2000 BEV features (`src/Frame.cc:329`)."""
    import jax.numpy as jnp

    from orbslam_birdview_tpu.core import lie

    cfg = SlamConfig.from_yaml(_repo_path("fisheye_birdview.yaml"),
                               sensor="mono_bird")
    assert cfg.orb.n_features == 2000
    # the YAML carries the front camera; BEV calibration is config-side
    # (SURVEY §5 — the reference hardcodes it in Frame.cc:39-44)
    bv = BirdviewCamera(width=384, height=384)
    cfg.birdview = bv
    # render smaller than the real 950x400 so the test fits the CPU
    # budget, but keep the FULL feature budget — the capacity bug this
    # guards against depends on n_features, not image size
    cfg.camera = PinholeCamera(fx=348.5, fy=347.0, cx=240.0, cy=151.0,
                               width=480, height=300)
    seq = BirdSequence(cfg.camera, bv, n_frames=14, speed=0.06,
                       yaw_rate=0.002)
    q = np.asarray(lie.rot_to_quat(jnp.asarray(seq.R_bc)))
    cfg.tbc_quat = tuple(q.tolist())
    cfg.tbc_t = tuple(seq.t_bc.tolist())
    sys_ = System(cfg)
    assert sys_.store.kp_cap >= 2000 and sys_.store.bird_cap >= 2000
    for i in range(14):
        img, bev, _ = seq.frame(i)
        sys_.track_monocular_with_birdview(
            np.clip(img, 0, 255).astype(np.uint8),
            np.clip(bev, 0, 255).astype(np.uint8), None, i / 25.0)
    sys_._flush()
    assert sys_.tracker.state == OK
    assert sys_.n_keyframes() >= 2
    assert sys_.store.n_bmp > 0, "no BEV landmarks minted"
