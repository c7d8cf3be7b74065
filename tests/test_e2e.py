"""End-to-end SLAM tests on synthetic sequences with exact ground truth —
the acceptance tests the reference never had (SURVEY §4): ATE RMSE under
threshold, metric scale recovery in birdview mode, RGB-D depth-assisted
tracking, trajectory export formats."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from orbslam_birdview_tpu.api import SlamConfig
from orbslam_birdview_tpu.api.system import System
from orbslam_birdview_tpu.core import lie
from orbslam_birdview_tpu.core.camera import BirdviewCamera, PinholeCamera
from orbslam_birdview_tpu.frontend.orb import ORBConfig
from orbslam_birdview_tpu.utils.synth import BirdSequence, WallSequence, ate_rmse

CAM = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0, width=640, height=480)


def run_sequence(sys_, frames, mode="mono"):
    gt, est = [], []
    for i, item in enumerate(frames):
        if mode == "mono":
            img, (R_cw, t_cw) = item
            fd = sys_.track_monocular(img, i / 30.0)
        elif mode == "rgbd":
            img, depth, (R_cw, t_cw) = item
            fd = sys_.track_rgbd(img, depth, i / 30.0)
        else:
            img, bev, (R_cw, t_cw) = item
            fd = sys_.track_monocular_with_birdview(img, bev, None, i / 25.0)
        if fd.pose_ok:
            est.append(-fd.R.T @ fd.t)
            gt.append(-R_cw.T @ t_cw)
    return np.array(gt), np.array(est)


@pytest.mark.slow
def test_monocular_wall_sequence():
    cfg = SlamConfig(camera=CAM, orb=ORBConfig(n_features=1000), sensor="mono")
    seq = WallSequence(CAM, n_frames=30, step=0.03)
    sys_ = System(cfg)
    gt, est = run_sequence(sys_, (seq.frame(i) for i in range(30)), "mono")
    assert len(est) >= 24, f"tracked only {len(est)} frames"
    ate = ate_rmse(est, gt, with_scale=True)  # mono scale is free
    assert ate < 0.02, f"ATE {ate}"
    assert sys_.n_keyframes() >= 3
    assert sys_.n_map_points() > 300


@pytest.mark.slow
def test_birdview_metric_scale():
    """The fork's core capability: BEV fusion must produce a METRIC
    trajectory (no scale alignment allowed in the ATE)."""
    bv = BirdviewCamera(width=384, height=384)
    seq = BirdSequence(CAM, bv, n_frames=35, speed=0.12, yaw_rate=0.004)
    cfg = SlamConfig(camera=CAM, orb=ORBConfig(n_features=1000),
                     sensor="mono_bird", birdview=bv)
    q = np.asarray(lie.rot_to_quat(jnp.asarray(seq.R_bc)))
    cfg.tbc_quat = tuple(q.tolist())
    cfg.tbc_t = tuple(seq.t_bc.tolist())
    sys_ = System(cfg)
    gt, est = run_sequence(
        sys_, (seq.frame(i) for i in range(35)), "bird")
    assert len(est) >= 28, f"tracked only {len(est)} frames"
    ate = ate_rmse(est, gt, with_scale=False)
    assert ate < 0.05, f"metric ATE {ate}"
    # scale recovered within 2%
    d_est = np.linalg.norm(np.diff(est, axis=0), axis=1).sum()
    d_gt = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    assert abs(d_est / d_gt - 1.0) < 0.02, d_est / d_gt
    assert int(sys_.store.bmp_valid.sum()) > 200, "no bird landmarks created"


@pytest.mark.slow
def test_rgbd_wall_sequence():
    cam = CAM._replace(bf=CAM.fx * 0.08)
    cfg = SlamConfig(camera=cam, orb=ORBConfig(n_features=1000), sensor="rgbd",
                     depth_threshold=40.0)
    seq = WallSequence(cam, n_frames=25, step=0.03)
    sys_ = System(cfg)
    frames = ((seq.frame(i)[0], seq.depth(i), seq.frame(i)[1]) for i in range(25))
    gt, est = run_sequence(sys_, frames, "rgbd")
    assert len(est) >= 20, f"tracked only {len(est)} frames"
    # depth makes the trajectory metric — no scale alignment
    ate = ate_rmse(est, gt, with_scale=False)
    assert ate < 0.03, f"metric ATE {ate}"


@pytest.mark.slow
def test_trajectory_savers(tmp_path):
    cfg = SlamConfig(camera=CAM, orb=ORBConfig(n_features=800), sensor="mono")
    seq = WallSequence(CAM, n_frames=15, step=0.03)
    sys_ = System(cfg)
    run_sequence(sys_, (seq.frame(i) for i in range(15)), "mono")
    p1 = tmp_path / "traj.txt"
    p2 = tmp_path / "kf.txt"
    p3 = tmp_path / "kitti.txt"
    p4 = tmp_path / "odom.txt"
    sys_.save_trajectory_tum(str(p1))
    sys_.save_keyframe_trajectory_tum(str(p2))
    sys_.save_trajectory_kitti(str(p3))
    sys_.save_keyframe_trajectory_odom_tum(str(p4))
    lines = p1.read_text().strip().split("\n")
    assert len(lines) >= 10
    assert all(len(l.split()) == 8 for l in lines)  # TUM format
    klines = p3.read_text().strip().split("\n")
    assert all(len(l.split()) == 12 for l in klines)  # KITTI format
    # quaternions normalized
    q = np.array([float(x) for x in lines[0].split()[4:8]])
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-5)


@pytest.mark.slow
def test_stereo_wall_sequence():
    """Stereo tracking end-to-end: right view rendered at a 8 cm baseline;
    disparity depth (incl. subpixel refinement) must give a metric
    trajectory."""
    from orbslam_birdview_tpu.utils.synth import render_wall_view

    b = 0.08
    cam = CAM._replace(bf=CAM.fx * b)
    cfg = SlamConfig(camera=cam, orb=ORBConfig(n_features=1000),
                     sensor="stereo", depth_threshold=40.0)
    seq = WallSequence(cam, n_frames=18, step=0.03)
    sys_ = System(cfg)
    gt, est = [], []
    off = np.array([b, 0.0, 0.0])
    for i in range(18):
        img_l, (R_cw, t_cw) = seq.frame(i)
        img_r = render_wall_view(cam, seq.tex, R_cw.astype(np.float64),
                                 t_cw.astype(np.float64) - off, seq.wall_z)
        fd = sys_.track_stereo(img_l, img_r, i / 30.0)
        if fd.pose_ok:
            est.append(-fd.R.T @ fd.t)
            gt.append(-R_cw.T @ t_cw)
    assert len(est) >= 14, f"tracked only {len(est)} frames"
    ate = ate_rmse(np.array(est), np.array(gt), with_scale=False)
    assert ate < 0.03, f"metric ATE {ate}"


@pytest.mark.slow
def test_localization_mode_vo_fallback():
    """Localization mode with an RGB-D sensor must keep tracking via
    temporal visual-odometry points when the camera leaves the mapped
    region (mbVO protocol, src/Tracking.cc:451-521, 1136-1188)."""
    cam = CAM._replace(bf=CAM.fx * 0.08)
    cfg = SlamConfig(camera=cam, orb=ORBConfig(n_features=1000), sensor="rgbd",
                     depth_threshold=40.0)
    n_map, n_total = 12, 30
    seq = WallSequence(cam, n_frames=n_total, step=0.03)
    sys_ = System(cfg)
    frames = ((seq.frame(i)[0], seq.depth(i), seq.frame(i)[1])
              for i in range(n_map))
    run_sequence(sys_, frames, "rgbd")
    assert sys_.get_tracking_state() == 1
    n_kf = sys_.n_keyframes()
    sys_.activate_localization_mode()
    gt, est = [], []
    for i in range(n_map, n_total):
        img, (R_cw, t_cw) = seq.frame(i)
        fd = sys_.track_rgbd(img, seq.depth(i), i / 30.0)
        if fd.pose_ok:
            est.append(-fd.R.T @ fd.t)
            gt.append(-R_cw.T @ t_cw)
    # no keyframes were added, yet tracking survived past the mapped region
    assert sys_.n_keyframes() == n_kf
    assert len(est) >= (n_total - n_map) - 2, f"tracked only {len(est)}"
    ate = ate_rmse(np.array(est), np.array(gt), with_scale=False)
    assert ate < 0.05, f"metric ATE {ate}"
    # the VO fallback actually engaged at some point
    fd = sys_.tracker.last_frame
    assert fd.kp_vo is not None


def test_eval_traj_tool(tmp_path):
    """The shipped TUM ATE/RPE scorer recovers a known similarity transform
    and reports the injected noise level (replaces the reference's reliance
    on the external TUM benchmark scripts, SURVEY §4)."""
    from orbslam_birdview_tpu.cli.eval_traj import evaluate

    rng = np.random.default_rng(3)
    n = 120
    t = np.arange(n) / 30.0
    gt = np.stack([np.cos(t), np.sin(t), 0.1 * t], 1)
    # a known Sim3: rotate 30 deg about z, scale 2.5, translate
    th = np.radians(30)
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    est = 2.5 * gt @ R.T + np.array([1.0, -2.0, 0.5])
    est = est + rng.normal(0, 0.001, est.shape)
    qid = "0 0 0 1"

    def write(path, ts, pos):
        with open(path, "w") as f:
            f.write("# ts x y z qx qy qz qw\n")
            for k in range(len(ts)):
                f.write(f"{ts[k]:.6f} {pos[k,0]:.6f} {pos[k,1]:.6f} "
                        f"{pos[k,2]:.6f} {qid}\n")

    write(tmp_path / "gt.txt", t, gt)
    write(tmp_path / "est.txt", t + 0.004, est)  # timestamp jitter
    m = evaluate(str(tmp_path / "gt.txt"), str(tmp_path / "est.txt"),
                 with_scale=True)
    assert m["n_pairs"] == n
    assert abs(m["scale"] - 1 / 2.5) < 1e-3
    assert m["ate_rmse"] < 0.002
    # without scale alignment the 2.5x trajectory is way off
    m2 = evaluate(str(tmp_path / "gt.txt"), str(tmp_path / "est.txt"),
                  with_scale=False)
    assert m2["ate_rmse"] > 0.5


@pytest.mark.slow
def test_relocalization_after_lost():
    """Tracking lost on featureless frames must recover via EPnP-RANSAC
    relocalization against the keyframe database when a mapped view
    reappears (`Tracking::Relocalization`, src/Tracking.cc:1902-2063)."""
    cam = CAM._replace(bf=CAM.fx * 0.08)
    cfg = SlamConfig(camera=cam, orb=ORBConfig(n_features=1000), sensor="rgbd",
                     depth_threshold=40.0)
    cfg.tracking.max_frames_between_kf = 2  # densify KFs past the reset gate
    # the deterministic schedule bounds mint cadence at ~1 per
    # (KF_MINT_LAG+1) frames, so 30 frames guarantees comfortably >5
    # keyframes (the lost-reset gate fires at <=5)
    n = 30
    seq = WallSequence(cam, n_frames=n, step=0.03)
    sys_ = System(cfg)
    first_pass = {}
    for i in range(n):
        img, _ = seq.frame(i)
        fd = sys_.track_rgbd(img, seq.depth(i), i / 30.0)
        if fd.pose_ok:
            first_pass[i] = (np.array(fd.R), np.array(fd.t))
    assert sys_.n_keyframes() > 5  # enough map to survive getting lost
    # blind the camera: featureless frames -> LOST
    blank = np.zeros((cam.height, cam.width), np.float32)
    fardep = np.full((cam.height, cam.width), 5.0, np.float32)
    for j in range(3):
        fd = sys_.track_rgbd(blank, fardep, (n + j) / 30.0)
        assert not fd.pose_ok
    assert sys_.get_tracking_state() == 2  # LOST
    # revisit a mapped view: relocalization must recover the pose
    fid = 5
    img, _ = seq.frame(fid)
    fd = sys_.track_rgbd(img, seq.depth(fid), (n + 5) / 30.0)
    assert fd.pose_ok, "relocalization failed"
    assert sys_.tracker.last_reloc_frame_id == fd.frame_id
    R1, t1 = first_pass[fid]
    c_reloc = -np.array(fd.R).T @ np.array(fd.t)
    c_ref = -R1.T @ t1
    assert np.linalg.norm(c_reloc - c_ref) < 0.02, np.linalg.norm(c_reloc - c_ref)


@pytest.mark.slow
def test_reset_and_localization_mode():
    cfg = SlamConfig(camera=CAM, orb=ORBConfig(n_features=800), sensor="mono")
    seq = WallSequence(CAM, n_frames=20, step=0.03)
    sys_ = System(cfg)
    run_sequence(sys_, (seq.frame(i) for i in range(20)), "mono")
    sys_._flush()   # settle any in-flight deferred keyframe mint
    n_kf = sys_.n_keyframes()
    assert n_kf >= 2
    # localization-only: no new keyframes
    sys_.activate_localization_mode()
    for i in range(20, 25):
        img, _ = seq.frame(i)
        sys_.track_monocular(img, i / 30.0)
    assert sys_.n_keyframes() == n_kf
    sys_.deactivate_localization_mode()
    # reset clears everything
    sys_.reset()
    assert sys_.n_keyframes() == 0
    assert sys_.get_tracking_state() == 0


def test_ar_plane_and_cube():
    """AR demo analog (`Examples/ROS/ORB_SLAM2/src/AR/ViewerAR.cc`): RANSAC
    plane detection from map points and virtual-cube projection."""
    from orbslam_birdview_tpu.utils import ar

    rng = np.random.default_rng(0)
    n_pl, n_out = 150, 30
    # plane y = 1.5 (normal -y), plus outliers
    pts = np.concatenate([
        np.stack([rng.uniform(-2, 2, n_pl), np.full(n_pl, 1.5)
                  + rng.normal(0, 0.002, n_pl), rng.uniform(2, 6, n_pl)], 1),
        rng.uniform(-2, 6, (n_out, 3)),
    ])
    plane = ar.detect_plane(pts, seed=1)
    assert plane is not None
    assert abs(abs(plane.normal[1]) - 1.0) < 0.01
    assert plane.inliers.sum() >= n_pl * 0.9
    assert plane.inliers[:n_pl].mean() > 0.9
    img = np.zeros((480, 640), np.float32)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    out = ar.draw_virtual_cube(img, np.eye(3), np.zeros(3), K, plane, 0.2)
    assert out.shape == (480, 640, 3)
    assert out.max() > 0  # something was drawn
