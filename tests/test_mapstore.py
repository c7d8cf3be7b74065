"""Map store unit tests: observation bookkeeping, covisibility, culling,
save/load roundtrip, and save-map → load-map → relocalize."""
import numpy as np
import jax.numpy as jnp
import pytest

from orbslam_birdview_tpu.frontend.keypoints import Keypoints
from orbslam_birdview_tpu.mapping.mapstore import INVALID, MapStore


def mk_kp(rng, n=64, cap=64):
    u8 = rng.integers(0, 256, (cap, 32)).astype(np.uint8)
    from orbslam_birdview_tpu.frontend.keypoints import unpack_bits_to_pm1

    return Keypoints(
        xy=jnp.asarray(rng.uniform(0, 640, (cap, 2)).astype(np.float32)),
        response=jnp.ones(cap),
        angle=jnp.zeros(cap),
        octave=jnp.zeros(cap, jnp.int32),
        valid=jnp.asarray(np.arange(cap) < n),
        desc_u8=jnp.asarray(u8),
        desc_pm1=unpack_bits_to_pm1(jnp.asarray(u8)),
    )


@pytest.fixture
def store3(rng):
    """3 KFs sharing landmarks."""
    store = MapStore(max_kf=8, max_mp=256, max_bmp=64, kp_cap=64, bird_cap=16)
    for i in range(3):
        store.alloc_keyframe(np.eye(3, dtype=np.float32),
                             np.array([0.1 * i, 0, 0], np.float32),
                             i, float(i), mk_kp(rng))
    pos = rng.uniform(-3, 3, (30, 3)).astype(np.float32)
    desc = rng.integers(0, 256, (30, 32)).astype(np.uint8)
    ids = store.alloc_points(pos, desc, 0, 0)
    # kf0 sees points 0..29 at kps 0..29; kf1 sees 10..29; kf2 sees 20..29
    store.add_observations(0, np.arange(30), ids)
    store.add_observations(1, np.arange(20), ids[10:])
    store.add_observations(2, np.arange(10), ids[20:])
    for i in range(3):
        store.update_covisibility(i)
    return store, ids


def test_covisibility_counts(store3):
    store, ids = store3
    assert store.covis[0, 1] == 20
    assert store.covis[0, 2] == 10
    assert store.covis[1, 2] == 10
    assert store.covisible_kfs(0, min_weight=15).tolist() == [1]
    assert set(store.covisible_kfs(0, min_weight=5).tolist()) == {1, 2}


def test_observation_counts(store3):
    store, ids = store3
    assert store.mp_n_obs[ids[0]] == 1
    assert store.mp_n_obs[ids[15]] == 2
    assert store.mp_n_obs[ids[25]] == 3


def test_erase_point(store3):
    store, ids = store3
    store.erase_point(int(ids[25]))
    assert not store.mp_valid[ids[25]]
    assert (store.kf_kp_mp[:3] == ids[25]).sum() == 0


def test_replace_point(store3):
    store, ids = store3
    a, b = int(ids[0]), int(ids[1])  # both only in kf0
    store.replace_point(a, b)
    assert not store.mp_valid[a]
    assert store.mp_valid[b]
    # kf0 already observes b: the old observation is erased, not re-pointed
    # (MapPoint::Replace semantics — one observation per landmark per KF)
    assert (store.kf_kp_mp[0] == b).sum() == 1
    assert store.kf_kp_mp[0, 0] == INVALID


def test_erase_keyframe_reparents(store3):
    store, ids = store3
    store.kf_parent[1] = 0
    store.kf_parent[2] = 1
    store.erase_keyframe(1)
    assert not store.kf_valid[1]
    assert store.kf_parent[2] == 0
    assert store.mp_n_obs[ids[15]] == 1  # lost kf1's observation


def test_save_load_roundtrip(tmp_path, store3):
    store, ids = store3
    store.loop_edges.append((0, 2))
    p = str(tmp_path / "map.npz")
    store.save(p)
    s2 = MapStore.load(p)
    assert s2.n_kf == store.n_kf and s2.n_mp == store.n_mp
    np.testing.assert_array_equal(s2.kf_kp_mp, store.kf_kp_mp)
    np.testing.assert_array_equal(s2.mp_pos, store.mp_pos)
    np.testing.assert_array_equal(s2.covis, store.covis)
    assert s2.loop_edges == [(0, 2)]


@pytest.mark.slow
def test_save_map_relocalize(tmp_path):
    """Build a map, save, load into a fresh System, relocalize against it."""
    from orbslam_birdview_tpu.api import SlamConfig
    from orbslam_birdview_tpu.api.system import System
    from orbslam_birdview_tpu.core.camera import PinholeCamera
    from orbslam_birdview_tpu.frontend.orb import ORBConfig
    from orbslam_birdview_tpu.utils.synth import WallSequence

    cam = PinholeCamera(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                        width=640, height=480)
    cfg = SlamConfig(camera=cam, orb=ORBConfig(n_features=800), sensor="mono")
    seq = WallSequence(cam, n_frames=25, step=0.03)
    sys_ = System(cfg, enable_loop_closing=False)
    for i in range(25):
        img, _ = seq.frame(i)
        sys_.track_monocular(img, i / 30.0)
    assert sys_.n_keyframes() >= 2
    p = str(tmp_path / "map.npz")
    sys_.save_map(p)

    sys2 = System(cfg, enable_loop_closing=False)
    sys2.load_map(p)
    assert sys2.n_keyframes() == sys_.n_keyframes()
    sys2.activate_localization_mode()
    ok = 0
    for i in range(10, 22):
        img, (R_cw, t_cw) = seq.frame(i)
        fd = sys2.track_monocular(img, 100 + i / 30.0)
        if fd.pose_ok:
            ok += 1
            err = np.linalg.norm((-fd.R.T @ fd.t) - (-R_cw.T @ t_cw))
    assert ok >= 6, f"relocalized+tracked only {ok} frames"
