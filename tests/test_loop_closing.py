"""End-to-end loop closing on a circular birdview sequence: BoW detection
with consistency groups, Sim3 RANSAC + reprojection refinement, covisible
group correction, Sim3 essential-graph optimization, global BA."""
import jax.numpy as jnp
import numpy as np
import pytest

import orbslam_birdview_tpu.core.lie as lie
from orbslam_birdview_tpu.api import SlamConfig
from orbslam_birdview_tpu.api.system import System
from orbslam_birdview_tpu.core.camera import BirdviewCamera, PinholeCamera
from orbslam_birdview_tpu.frontend.orb import ORBConfig
from orbslam_birdview_tpu.utils.synth import BirdSequence, ate_rmse

CAM = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0, width=640, height=480)


@pytest.mark.slow
def test_circular_loop_closure():
    bv = BirdviewCamera(width=384, height=384)
    N = 142
    seq = BirdSequence(CAM, bv, n_frames=N, speed=0.1,
                       yaw_rate=2 * np.pi / 120, wall_x=8.0)
    cfg = SlamConfig(camera=CAM, orb=ORBConfig(n_features=1000),
                     sensor="mono_bird", birdview=bv)
    # the ASYNC pipeline is exercised here: its deterministic schedule
    # (fixed frame-indexed landing ticks) makes the dynamics (keyframe
    # cadence -> map coverage -> loop detection) load-invariant, so no
    # synchronous fallback is needed for reproducibility
    q = np.asarray(lie.rot_to_quat(jnp.asarray(seq.R_bc)))
    cfg.tbc_quat = tuple(q.tolist())
    cfg.tbc_t = tuple(seq.t_bc.tolist())
    sys_ = System(cfg)
    GT = {i: seq.gt_cam_pose(i) for i in range(N)}
    for i in range(N):
        img, bev, _ = seq.frame(i)
        sys_.track_monocular_with_birdview(img, bev, None, i / 25.0)
    # drain the overlapped pipeline: the final mints' loop-closing checks
    # land a few frames after their dispatch under the async schedule
    sys_._flush()
    assert sys_.loop_closer.n_loops_closed >= 1, "no loop closed"
    store = sys_.store
    est, gt = [], []
    for k in store.valid_kf_ids():
        fid = int(store.kf_frame_id[k])
        Rg, tg = GT[fid]
        est.append(-store.kf_R[k].T @ store.kf_t[k])
        gt.append(-Rg.T @ tg)
    ate = ate_rmse(np.array(est), np.array(gt), with_scale=False)
    # full circle ~12 m; loop closure + GBA must keep metric ATE small
    assert ate < 0.05, f"post-loop metric ATE {ate}"
