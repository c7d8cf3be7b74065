"""System facade — the public API, mirroring the reference's `System` class
surface (`/root/reference/include/System.h:63-133`): per-frame entry points
for every sensor mode, localization-mode switch, reset, trajectory savers in
TUM/KITTI/odometry formats, state queries. Single-process, explicitly
scheduled (no threads — SURVEY §2.3/§7 design stance).
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..core import lie
from ..mapping.mapstore import INVALID, MapStore
from ..pipeline.local_mapping import LocalMapper
from ..pipeline.tracking import LOST, NOT_INITIALIZED, OK, Tracker
from .config import SlamConfig


def _load_default_vocabulary(cfg: SlamConfig):
    """Load the production vocabulary up front, like the reference's
    `System` constructor (`src/System.cc:70-83`, ~1M-word DBoW2 load).

    cfg.vocab_path: "auto" -> the packaged 100k-word artifact (trained by
    tools/train_vocab.py); an explicit path -> that file (.npz native or
    DBoW2 .txt/.bin); None -> skip (the loop closer then bootstraps a
    10^4-word vocabulary from map descriptors mid-run, the pre-r5
    behavior, kept for minimal test fixtures)."""
    import os

    from ..mapping import vocab as vocab_mod

    path = cfg.vocab_path
    if path is None:
        return None
    if path == "auto":
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "data", "vocab_100k.npz")
        if not os.path.exists(path):
            return None          # artifact absent: bootstrap fallback
    if path.endswith(".npz"):
        return vocab_mod.Vocabulary.load(path)
    return vocab_mod.load_dbow2(path)


class System:
    def __init__(self, cfg: SlamConfig, vocabulary=None,
                 enable_loop_closing: bool = True):
        self.cfg = cfg
        self.store = self._make_store(cfg)
        self.mapper = LocalMapper(cfg, self.store)
        self.tracker = Tracker(cfg, self.store, self.mapper)
        self.loop_closer = None
        if enable_loop_closing:
            from ..pipeline.loop_closing import LoopCloser

            if vocabulary is None:
                vocabulary = _load_default_vocabulary(cfg)
            self.loop_closer = LoopCloser(cfg, self.store, self.mapper,
                                          vocabulary=vocabulary)
            self.mapper.loop_closer = self.loop_closer
            self.tracker.loop_closer = self.loop_closer
        self.localization_only = False
        # deferred mode-switch requests from other threads (viewer HTTP
        # handlers): applied at the start of the next track_* call on the
        # tracking thread — the reference's mbReset /
        # mbActivateLocalizationMode protocol (src/System.cc:140-208).
        # Direct reset()/activate_* from a foreign thread while tracking
        # is mid-frame would corrupt the lag pipeline.
        self._reset_requested = False
        self._loc_mode_requested: Optional[bool] = None

    @staticmethod
    def _make_store(cfg: SlamConfig) -> MapStore:
        """Per-KF feature capacities MUST track the extractor's padded
        output size — the reference runs 2000 features front + BEV
        (`Examples/Monocular/fisheye.yaml:28-41`, `src/Frame.cc:329`), and a
        store sized below that rejects raw keypoint indices (round-3's
        IndexError at ≥1024)."""
        kp_cap = cfg.orb.padded_capacity()
        bird_cap = cfg.effective_bird_orb().padded_capacity()
        return MapStore(max_kf=cfg.max_keyframes, kp_cap=kp_cap,
                        bird_cap=bird_cap)

    # ------------------------------------------------------------------
    # per-frame entry points (System::Track*, src/System.cc:129-335)
    # ------------------------------------------------------------------
    def track_monocular(self, img, timestamp: float):
        fd = self._track(img, timestamp)
        return fd

    def track_monocular_with_birdview(self, img, bird_img, bird_mask,
                                      timestamp: float):
        fd = self._track(img, timestamp, bird_img=bird_img,
                         bird_mask=bird_mask)
        return fd

    def track_rgbd(self, img, depth, timestamp: float):
        fd = self._track(img, timestamp, depth_img=depth)
        return fd

    def track_stereo(self, img_left, img_right, timestamp: float):
        """Stereo: the right image rides into the tracker — the fused path
        extracts + row-matches it INSIDE the per-frame device program; the
        slow path computes a splatted depth map first."""
        fd = self._track(img_left, timestamp,
                         right_img=np.asarray(img_right))
        return fd

    def request_reset(self):
        """Thread-safe deferred reset (viewer menu): takes effect at the
        next track_* call on the tracking thread."""
        self._reset_requested = True

    def request_localization_mode(self, on: bool):
        """Thread-safe deferred localization-mode switch (viewer menu)."""
        self._loc_mode_requested = bool(on)

    def _apply_deferred_requests(self):
        if self._reset_requested:
            self._reset_requested = False
            self._loc_mode_requested = None
            self.reset()
            return
        req = self._loc_mode_requested
        if req is not None:
            self._loc_mode_requested = None
            if req:
                self.activate_localization_mode()
            else:
                self.deactivate_localization_mode()

    def _track(self, img, timestamp, **kw):
        self._apply_deferred_requests()
        self.tracker.only_tracking = self.localization_only
        fd = self.tracker.process(np.asarray(img), timestamp, **kw)
        if self.tracker.reset_requested and not self.localization_only:
            # lost right after init — wipe and start over (src/Tracking.cc:600-609)
            self.reset()
        return fd

    def _flush(self):
        """Drain the tracker's lag-1 pipeline and any overlapped local BA so
        queries/exports see every frame against the settled map."""
        self.tracker.flush()
        if self.mapper is not None:
            self.mapper.drain_background()

    # ------------------------------------------------------------------
    # mode switches (System.h:84-90)
    # ------------------------------------------------------------------
    def activate_localization_mode(self):
        self._flush()
        self.localization_only = True

    def deactivate_localization_mode(self):
        self._flush()
        self.localization_only = False
        self.tracker.vo_mode = False

    def reset(self):
        self._flush()
        cfg = self.cfg
        voc = self.loop_closer.voc if self.loop_closer is not None else None
        self.store = self._make_store(cfg)
        self.mapper = LocalMapper(cfg, self.store)
        self.tracker = Tracker(cfg, self.store, self.mapper)
        if self.loop_closer is not None:
            from ..pipeline.loop_closing import LoopCloser

            self.loop_closer = LoopCloser(cfg, self.store, self.mapper,
                                          vocabulary=voc)
            self.mapper.loop_closer = self.loop_closer
            self.tracker.loop_closer = self.loop_closer

    def shutdown(self):
        pass  # no threads to join — kept for API parity

    def prewarm(self) -> int:
        """Compile the shape-specialized device programs this run will
        need (local-BA bucket ladder) before the first frame. One-time
        cost that otherwise lands inside the frame stream at keyframe
        events (~0.3-8 s per shape on a remote-compile backend); results
        persist in the JAX compile cache for later processes. Returns
        the number of programs warmed."""
        return self.mapper.prewarm(bird=self.cfg.sensor == "mono_bird")

    # ------------------------------------------------------------------
    # map checkpoint / resume (reference TODO, System.h:125-127)
    # ------------------------------------------------------------------
    def save_map(self, path: str):
        self._flush()
        self.store.save(path)

    def load_map(self, path: str):
        """Load a saved map and switch to localization against it."""
        self.store = MapStore.load(path)
        self.mapper = LocalMapper(self.cfg, self.store)
        self.tracker = Tracker(self.cfg, self.store, self.mapper)
        if self.loop_closer is not None:
            from ..pipeline.loop_closing import LoopCloser

            voc = self.loop_closer.voc
            self.loop_closer = LoopCloser(self.cfg, self.store, self.mapper,
                                          vocabulary=voc)
            self.mapper.loop_closer = self.loop_closer
            self.tracker.loop_closer = self.loop_closer
            if self.loop_closer.kfdb is not None:
                for kf in self.store.valid_kf_ids():
                    self.loop_closer.kfdb.add_keyframe(
                        int(kf), self.loop_closer._kp_of(int(kf)))
        # a loaded map means we must relocalize
        from ..pipeline.tracking import LOST

        self.tracker.state = LOST

    # ------------------------------------------------------------------
    # state queries
    # ------------------------------------------------------------------
    def get_tracking_state(self) -> int:
        self._flush()
        return self.tracker.state

    def peek_tracking_state(self) -> int:
        """Tracker state WITHOUT draining the lag pipeline or background
        BA — for progress reporting inside the frame loop. `get_tracking_
        state` flushes everything, so calling it mid-run destroys the
        overlap it is reporting on (a dataset driver polling it every 50
        frames measured ~0 pipeline benefit)."""
        return self.tracker.state

    def map_changed(self) -> int:
        return self.store.big_change_idx

    def n_map_points(self) -> int:
        return int(self.store.mp_valid.sum())

    def n_keyframes(self) -> int:
        return int(self.store.kf_valid.sum())

    def get_tracked_map_points(self):
        """Landmark ids associated to the last frame's keypoints
        (`System::GetTrackedMapPoints`, System.h:129-133); −1 where none."""
        self._flush()
        fd = self.tracker.last_frame
        if fd is None:
            return np.zeros(0, np.int64)
        self.tracker.resolve_associations(fd)
        return fd.kp_mp.copy()

    def get_tracked_keypoints(self):
        self._flush()
        fd = self.tracker.last_frame
        if fd is None:
            return None
        return np.asarray(fd.kp.xy), np.asarray(fd.kp.valid)

    # ------------------------------------------------------------------
    # trajectory export (System.cc:389-584)
    # ------------------------------------------------------------------
    def _frame_poses(self):
        """Recover per-frame poses as Tcw = T_rel · Tcw_refkf with the
        *current* (optimized) keyframe poses (`SaveTrajectoryTUM`)."""
        self._flush()
        store = self.store
        out = []
        for e in self.tracker.trajectory:
            if e.lost:
                out.append((e.timestamp, None))
                continue
            ref = e.ref_kf
            T_ref = np.eye(4, dtype=np.float32)
            T_ref[:3, :3] = store.kf_R[ref]
            T_ref[:3, 3] = store.kf_t[ref]
            out.append((e.timestamp, e.T_rel @ T_ref))
        return out

    @staticmethod
    def _tum_line(ts, Twc):
        import jax.numpy as jnp

        q = np.asarray(lie.rot_to_quat(jnp.asarray(Twc[:3, :3])))
        t = Twc[:3, 3]
        # TUM: tx ty tz qx qy qz qw
        return (f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}")

    def save_trajectory_tum(self, path: str):
        with open(path, "w") as f:
            for ts, Tcw in self._frame_poses():
                if Tcw is None:
                    continue
                Twc = np.linalg.inv(Tcw)
                f.write(self._tum_line(ts, Twc) + "\n")

    def save_keyframe_trajectory_tum(self, path: str):
        self._flush()
        store = self.store
        with open(path, "w") as f:
            for kf in store.valid_kf_ids():
                Tcw = np.eye(4, dtype=np.float32)
                Tcw[:3, :3] = store.kf_R[kf]
                Tcw[:3, 3] = store.kf_t[kf]
                f.write(self._tum_line(store.kf_timestamp[kf],
                                       np.linalg.inv(Tcw)) + "\n")

    def save_keyframe_trajectory_odom_tum(self, path: str):
        """Fork-added saver expressing keyframe poses in the vehicle base
        frame: Twb = Twc · Tcb (`SaveKeyFrameTrajectoryOdomTUM`,
        src/System.cc:542-584)."""
        self._flush()
        store = self.store
        tr = self.tracker
        Tcb = np.eye(4, dtype=np.float32)
        Tcb[:3, :3] = tr.R_cb
        Tcb[:3, 3] = tr.t_cb
        with open(path, "w") as f:
            for kf in store.valid_kf_ids():
                Tcw = np.eye(4, dtype=np.float32)
                Tcw[:3, :3] = store.kf_R[kf]
                Tcw[:3, 3] = store.kf_t[kf]
                Twb = np.linalg.inv(Tcw) @ Tcb
                f.write(self._tum_line(store.kf_timestamp[kf], Twb) + "\n")

    def save_trajectory_kitti(self, path: str):
        with open(path, "w") as f:
            for ts, Tcw in self._frame_poses():
                if Tcw is None:
                    continue
                Twc = np.linalg.inv(Tcw)
                row = Twc[:3, :4].reshape(-1)
                f.write(" ".join(f"{v:.9e}" for v in row) + "\n")
