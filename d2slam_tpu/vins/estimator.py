"""Sliding-window visual-inertial estimator (single-robot core).

TPU-native re-design of the reference D2Estimator
(reference: d2vins/src/estimator/d2estimator.cpp): all data-dependent
control flow — keyframe/window management, landmark bookkeeping,
triangulation, outlier decisions — lives on the host in this class;
the numeric hot path (preintegration, factor linearization, LM solve,
marginalization) is jitted fixed-shape device code from
``d2slam_tpu.solver``.

Window semantics follow the reference:
  * frames append until ``max_sld_win_size``; then either the
    second-newest non-keyframe is dropped (its IMU merges into the next
    interval — here simply re-sliced from the raw buffer), or the oldest
    keyframe is marginalized into the dense prior
    (reference: d2vins/src/estimator/d2vinsstate.cpp:294-320
    clearUselessFrames).
  * the first frame carries a stiff pose prior as the gauge anchor
    (reference: d2vinsstate.cpp:503-555).
  * first-pose initialization aligns attitude with the mean IMU
    acceleration and seeds the gyro bias
    (reference: d2estimator.cpp:74-121 tryinitFirstPose).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from d2slam_tpu.config import D2Config
from d2slam_tpu.utils import np_lie
from d2slam_tpu.imu.buffer import IMUBuffer
from d2slam_tpu.imu.preintegration import (
    default_noise_matrix,
    imu_propagate_pose,
    preintegrate,
)
from d2slam_tpu.factors.residuals import imu_sqrt_info
from d2slam_tpu.solver.layout import VIOLayout
from d2slam_tpu.solver.lm import lm_solve_vio
from d2slam_tpu.solver.marginalization import (
    make_pose_prior,
    marginalize,
    permute_prior_frames,
    solve_and_marginalize,
    solve_and_marginalize_carry,
    zero_prior,
)
from d2slam_tpu.solver.state import ImuMeas, PriorBlock, ProjMeas, VIOState
from d2slam_tpu.vins.landmark_manager import (
    ESTIMATED,
    INITIALIZED,
    LandmarkManager,
)
from d2slam_tpu.utils.perf import PerfTracker
from d2slam_tpu.vins.types import FrontendFrame, Odometry


class WindowFrame:
    __slots__ = ("frame_id", "stamp", "is_keyframe", "drone_id")

    def __init__(self, frame_id, stamp, is_keyframe, drone_id=-1):
        self.frame_id = frame_id
        self.stamp = stamp
        self.is_keyframe = is_keyframe
        self.drone_id = drone_id  # -1 = the estimator's own drone


class CamPoseTable:
    """Precomputed world_T_cam table for every (window slot, camera).

    Drop-in for the old per-call closure — callable as
    ``f(frame_id, cam_id) -> pose[7] | None`` — plus a vectorized
    ``lookup(frame_ids, cam_ids) -> (T [N, 7], ok [N])`` used by the
    batched sync-back / outlier-rejection host paths (reference
    syncFromState + outlierRejection walk landmarks one at a time,
    d2vinsstate.cpp:557-592; here the per-landmark math is one numpy
    batch)."""

    def __init__(self, slot_of: Dict[int, int], poses: np.ndarray,
                 ext: np.ndarray):
        self.slot_of = slot_of
        W, C = len(poses), len(ext)
        # compose all W*C pairs vectorized: t = p_t + R(p_q) e_t
        pq = np.repeat(poses[:, 3:], C, axis=0)              # [W*C, 4]
        R = np_lie.quat_to_rotmat_batch(pq)                  # [W*C, 3, 3]
        et = np.tile(ext[:, :3], (W, 1))
        t = np.repeat(poses[:, :3], C, axis=0) + \
            np.einsum("nij,nj->ni", R, et)
        x1, y1, z1, w1 = pq.T
        x2, y2, z2, w2 = np.tile(ext[:, 3:], (W, 1)).T
        q = np.stack([
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ], axis=1)
        self.table = np.concatenate([t, q], axis=1).reshape(W, C, 7)

    def __call__(self, frame_id, cam_id):
        w = self.slot_of.get(frame_id)
        if w is None:
            return None
        return self.table[w, cam_id]

    def lookup(self, frame_ids, cam_ids):
        idx = np.fromiter(
            (self.slot_of.get(int(f), -1) for f in frame_ids),
            np.int64, count=len(frame_ids),
        )
        ok = idx >= 0
        T = self.table[np.maximum(idx, 0), np.asarray(cam_ids)]
        return T, ok


class D2Estimator:
    def __init__(self, config: D2Config, extrinsics: np.ndarray):
        self.cfg = config
        e = config.estimator
        extrinsics = np.asarray(extrinsics)
        if len(extrinsics) != config.num_cams:
            # catch this here with a clear message — a mismatch
            # otherwise surfaces as an opaque broadcast error deep in
            # the jitted solver (state_boxminus ext slice)
            raise ValueError(
                f"extrinsics has {len(extrinsics)} cameras but "
                f"config.num_cams={config.num_cams}; set num_cams to "
                "match (e.g. 1 for MONOCULAR/PINHOLE_DEPTH rigs)"
            )
        self.dtype = jnp.float64 if config.dtype == "float64" else jnp.float32
        self.layout = VIOLayout(
            W=e.max_sld_win_size,
            C=config.num_cams,
            L=e.max_lm_slots,
            M=e.max_solve_measurements,
            N_IMU_SAMPLES=e.max_imu_samples,
        )
        self.gravity = jnp.asarray([0.0, 0.0, config.imu.g_norm], self.dtype)
        self.noise = default_noise_matrix(
            config.imu.acc_n, config.imu.gyr_n, config.imu.acc_w,
            config.imu.gyr_w, dtype=self.dtype,
        )
        self.imubuf = IMUBuffer()
        self.lmanager = LandmarkManager(
            min_depth=e.min_depth, max_depth=e.max_depth,
            min_baseline=e.min_triangulate_baseline,
            tri_max_err=e.triangulate_max_err,
        )
        self.frames: List[WindowFrame] = []
        self.state = VIOState.zeros(self.layout, self.dtype)
        self.state = self.state._replace(ext=jnp.asarray(extrinsics, self.dtype))
        self.fej_poses = np.zeros((self.layout.W, 7))
        self.fej_sb = np.zeros((self.layout.W, 9))
        self.prior = None  # routes through the prior property below
        self.initialized = False
        self.solve_count = 0
        self.margin_count = 0
        self.lm_slot_of: Dict[int, int] = {}
        self.perf = PerfTracker()

        psi = e.focal_length / 1.5
        # heavy programs ride the accelerator with PACKED transfers
        # (one upload per dtype class, one download — a tunneled TPU
        # pays 30-50 ms per crossing; see utils/placement.py). On
        # CPU-only hosts these degrade to plain jits.
        from d2slam_tpu.utils.placement import PackedAccelFn

        self._solve = PackedAccelFn(
            functools.partial(
                lm_solve_vio,
                self.layout,
                gravity=self.gravity,
                proj_sqrt_info=psi,
                dep_sqrt_info=e.depth_sqrt_inf,
                huber_delta=e.huber_delta,
                max_iters=e.max_solver_iters,
                landmark_param=e.landmark_param,
                method=e.solver_method,
                refine_steps=e.cholesky_refine_steps,
            )
        )
        self._marginalize = PackedAccelFn(
            functools.partial(
                marginalize,
                self.layout,
                gravity=self.gravity,
                proj_sqrt_info=psi,
                dep_sqrt_info=e.depth_sqrt_inf,
                huber_delta=e.huber_delta,
                landmark_param=e.landmark_param,
                remove_base_mode=e.remove_base_when_margin_remote,
            )
        )
        # fused solve + window-management marginalization: ONE packed
        # round trip per keyframe (the remote-link floor is per-call),
        # with the dense prior as a DEVICE-RESIDENT carry — its ~270 KB
        # J block stays in HBM across keyframes; window shifts ride as
        # a [W] slot permutation applied on device (CarryAccelFn)
        from d2slam_tpu.utils.placement import CarryAccelFn

        self._solve_marg = CarryAccelFn(
            functools.partial(
                solve_and_marginalize_carry,
                self.layout,
                gravity=self.gravity,
                proj_sqrt_info=psi,
                dep_sqrt_info=e.depth_sqrt_inf,
                huber_delta=e.huber_delta,
                max_iters=e.max_solver_iters,
                landmark_param=e.landmark_param,
                method=e.solver_method,
                refine_steps=e.cholesky_refine_steps,
                remove_base_mode=e.remove_base_when_margin_remote,
            )
        )
        self._fused_marg_slot = None
        # glue: preintegration is tiny — local CPU under the system
        # node's default-device flip
        self._preintegrate = jax.jit(
            jax.vmap(preintegrate, in_axes=(0, 0, 0, 0, 0, 0, None))
        )

    # ------------------------------------------------------------------
    # inputs
    # ------------------------------------------------------------------

    def input_imu(self, t: float, acc, gyr) -> None:
        self.imubuf.add(t, acc, gyr)

    def input_frame(self, frame: FrontendFrame) -> Optional[Odometry]:
        """Process one keyframe worth of landmark observations."""
        if not self.imubuf.available(frame.stamp):
            # reference spins waiting for IMU (d2estimator.cpp:338-342);
            # here the caller must feed IMU first
            raise ValueError(
                f"IMU not available up to t={frame.stamp:.3f} "
                f"(buffer ends {self.imubuf.t_last:.3f})"
            )
        if not self.initialized:
            if not self._try_init_first_pose(frame):
                return None
        else:
            self._add_frame(frame)

        self._ingest_observations(frame)

        if len(self.frames) >= self.cfg.estimator.min_solve_frames:
            self._solve_window()

        self._manage_window()
        w = self._last_self_slot()
        return Odometry(
            stamp=frame.stamp,
            pose=np.asarray(self.state.poses[w]),
            vel=np.asarray(self.state.sb[w, :3]),
        )

    # ------------------------------------------------------------------
    # initialization & frame addition
    # ------------------------------------------------------------------

    def _try_init_first_pose(self, frame: FrontendFrame) -> bool:
        if len(self.imubuf) < 10:
            return False
        acc = self.imubuf.mean_acc()
        gyr = self.imubuf.mean_gyro()
        # dynamic start? (specific force deviates from gravity —
        # centripetal/linear acceleration present). The static path's
        # gravity alignment would bake a tilted gauge; use the SFM
        # initialization instead (reference mono SFM path,
        # d2vinsstate.cpp:763-1040).
        g = self.cfg.imu.g_norm
        # |acc| alone misses centripetal acceleration (perpendicular to
        # gravity, so the norm barely changes) — also gate on body rate
        if (abs(np.linalg.norm(acc) - g) > 0.03 * g
                or np.linalg.norm(gyr) > 0.05):
            return self._try_init_sfm(frame)
        # attitude aligning measured specific force with world +z
        a = acc / np.linalg.norm(acc)
        up = np.array([0.0, 0.0, 1.0])
        v = np.cross(a, up)
        s = np.linalg.norm(v)
        c = float(a @ up)
        if s < 1e-9:
            R = np.eye(3) if c > 0 else -np.eye(3)
        else:
            vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
            R = np.eye(3) + vx + vx @ vx * ((1 - c) / (s * s))
        q0 = np_lie.rotmat_to_quat(R)
        pose0 = np.concatenate([[0.0, 0.0, 0.0], q0])
        sb0 = np.concatenate([[0.0, 0.0, 0.0], [0, 0, 0], gyr])

        self.frames.append(WindowFrame(frame.frame_id, frame.stamp, True))
        poses = np.asarray(self.state.poses).copy()
        sb = np.asarray(self.state.sb).copy()
        poses[0], sb[0] = pose0, sb0
        fv = np.zeros(self.layout.W, bool)
        fv[0] = True
        self.state = self.state._replace(
            poses=jnp.asarray(poses, self.dtype),
            sb=jnp.asarray(sb, self.dtype),
            frame_valid=jnp.asarray(fv),
        )
        self.fej_poses[0], self.fej_sb[0] = pose0, sb0
        self.prior = make_pose_prior(self.layout, self.state, frame=0)
        self.initialized = True
        return True

    def _try_init_sfm(self, frame: FrontendFrame) -> bool:
        """Dynamic-start initialization: buffer frames until the SFM +
        linear-alignment pipeline succeeds, then populate the window."""
        from d2slam_tpu.vins.initialization import linear_alignment
        from d2slam_tpu.vins.sfm_init import align_to_gravity, sfm_initialize

        buf = getattr(self, "_sfm_buffer", None)
        if buf is None:
            buf = self._sfm_buffer = []
        obs0 = {}
        for co in frame.observations:
            if co.cam_id == 0:
                for i, lid in enumerate(co.landmark_ids):
                    obs0[int(lid)] = np.asarray(co.rays[i], np.float64)
        buf.append((frame, obs0))
        if len(buf) > self.layout.W - 2:
            buf.pop(0)
        if len(buf) < 6:
            return False

        def preint(bg):
            pres = []
            for k in range(len(buf) - 1):
                d, a, g_, m = self.imubuf.period(
                    buf[k][0].stamp, buf[k + 1][0].stamp,
                    self.layout.N_IMU_SAMPLES
                )
                pres.append(preintegrate(
                    jnp.asarray(d), jnp.asarray(a), jnp.asarray(g_),
                    jnp.asarray(m), jnp.zeros(3), jnp.asarray(bg),
                    default_noise_matrix(
                        self.cfg.imu.acc_n, self.cfg.imu.gyr_n,
                        self.cfg.imu.acc_w, self.cfg.imu.gyr_w,
                        dtype=jnp.float64,
                    ),
                ))
            return pres

        ext0 = np.asarray(self.state.ext[0], np.float64)
        out = sfm_initialize([b[1] for b in buf], ext0, preint(np.zeros(3)))
        if out is None:
            return False
        la = linear_alignment(out["body_poses_visual"], preint(out["dbg"]))
        if la is None:
            return False
        vels_body, g_vis, scale = la
        poses_init, vels = align_to_gravity(
            out["body_poses_visual"], vels_body, g_vis, scale,
            g_norm=self.cfg.imu.g_norm,
        )

        S = len(buf)
        poses = np.asarray(self.state.poses).copy()
        sb = np.asarray(self.state.sb).copy()
        fv = np.zeros(self.layout.W, bool)
        for k, (bframe, _) in enumerate(buf):
            self.frames.append(
                WindowFrame(bframe.frame_id, bframe.stamp, True)
            )
            poses[k] = poses_init[k]
            sb[k] = np.concatenate([vels[k], np.zeros(3), out["dbg"]])
            fv[k] = True
            self.fej_poses[k], self.fej_sb[k] = poses[k], sb[k]
        self.state = self.state._replace(
            poses=jnp.asarray(poses, self.dtype),
            sb=jnp.asarray(sb, self.dtype),
            frame_valid=jnp.asarray(fv),
        )
        self.prior = make_pose_prior(self.layout, self.state, frame=0)
        self.initialized = True
        # the buffered frames' observations never reached the landmark
        # manager (ingestion happens post-init) — replay them, except
        # the current frame which input_frame ingests right after
        for (bframe, _) in buf[:-1]:
            self._ingest_observations(bframe)
        self._sfm_buffer = None
        return True

    def predict_odometry(self, t: Optional[float] = None
                         ) -> Optional[Odometry]:
        """IMU-rate odometry: the newest solved state propagated through
        the buffered IMU up to ``t`` (default: the latest IMU sample) —
        the reference publishes this on every IMU callback
        (d2estimator.cpp:57-72 inputImu → propagated odometry).
        Call at whatever rate the consumer needs; the window state is
        untouched."""
        if not self.initialized:
            return None
        w = self._last_self_slot()
        if w < 0:
            return None
        frame = self.frames[w]
        t_end = float(t) if t is not None else self.imubuf.t_last
        if t_end <= frame.stamp:
            return Odometry(
                stamp=frame.stamp,
                pose=np.asarray(self.state.poses[w]),
                vel=np.asarray(self.state.sb[w, :3]),
            )
        dts, accs, gyrs, mask = self.imubuf.period(
            frame.stamp, t_end, self.layout.N_IMU_SAMPLES
        )
        sb = np.asarray(self.state.sb[w])
        pose, vel = imu_propagate_pose(
            self.state.poses[w],
            jnp.asarray(sb[:3], self.dtype),
            jnp.asarray(sb[3:6], self.dtype),
            jnp.asarray(sb[6:9], self.dtype),
            jnp.asarray(dts, self.dtype), jnp.asarray(accs, self.dtype),
            jnp.asarray(gyrs, self.dtype), jnp.asarray(mask),
            -self.gravity,
        )
        return Odometry(stamp=t_end, pose=np.asarray(pose),
                        vel=np.asarray(vel))

    def _last_self_slot(self) -> int:
        """Slot of the newest own-drone frame (== last slot in the
        single-robot estimator; the SOLVE_ALL pool interleaves drones)."""
        for w in range(len(self.frames) - 1, -1, -1):
            if self.frames[w].drone_id < 0:
                return w
        return -1

    def _add_frame(self, frame: FrontendFrame) -> None:
        w_prev = self._last_self_slot()
        prev = self.frames[w_prev]
        assert len(self.frames) < self.layout.W, "window overflow"
        # motion prediction: propagate pose/vel through the interval
        dts, accs, gyrs, mask = self.imubuf.period(
            prev.stamp, frame.stamp, self.layout.N_IMU_SAMPLES
        )
        pose_prev = self.state.poses[w_prev]
        sb_prev = np.asarray(self.state.sb[w_prev])
        new_pose, new_vel = imu_propagate_pose(
            pose_prev,
            jnp.asarray(sb_prev[:3], self.dtype),
            jnp.asarray(sb_prev[3:6], self.dtype),
            jnp.asarray(sb_prev[6:9], self.dtype),
            jnp.asarray(dts, self.dtype), jnp.asarray(accs, self.dtype),
            jnp.asarray(gyrs, self.dtype), jnp.asarray(mask),
            -self.gravity,
        )
        w = len(self.frames)
        self.frames.append(
            WindowFrame(frame.frame_id, frame.stamp, frame.is_keyframe)
        )
        poses = np.asarray(self.state.poses).copy()
        sb = np.asarray(self.state.sb).copy()
        poses[w] = np.asarray(new_pose)
        sb[w] = np.concatenate([np.asarray(new_vel), sb_prev[3:9]])
        fv = np.asarray(self.state.frame_valid).copy()
        fv[w] = True
        self.state = self.state._replace(
            poses=jnp.asarray(poses, self.dtype),
            sb=jnp.asarray(sb, self.dtype),
            frame_valid=jnp.asarray(fv),
        )
        self.fej_poses[w], self.fej_sb[w] = poses[w], sb[w]

    def _ingest_observations(self, frame: FrontendFrame) -> None:
        for co in frame.observations:
            depths = co.depths if co.depths is not None else -np.ones(len(co.landmark_ids))
            for i, lid in enumerate(co.landmark_ids):
                self.lmanager.add_observation(
                    int(lid), frame.frame_id, co.cam_id,
                    co.rays[i], co.ray_vels[i], float(depths[i]),
                )

    # ------------------------------------------------------------------
    # measurement assembly
    # ------------------------------------------------------------------

    def _slot_of_frame(self) -> Dict[int, int]:
        return {f.frame_id: w for w, f in enumerate(self.frames)}

    def _cam_pose_of(self):
        return CamPoseTable(
            self._slot_of_frame(),
            np.asarray(self.state.poses), np.asarray(self.state.ext),
        )

    def _imu_chain(self):
        """Preintegration intervals as (slot_i, slot_j, imu_buffer)
        triples — one chain of consecutive frames per drone."""
        return [
            (w, w + 1, self.imubuf) for w in range(len(self.frames) - 1)
        ]

    def _build_measurements(self):
        e = self.cfg.estimator
        layout = self.layout
        slots = self._slot_of_frame()

        # ---------------- IMU intervals ----------------
        # chain topology comes from _imu_chain so the SOLVE_ALL pool can
        # run one preintegration chain per drone through the same
        # vmapped kernel (reference setupImuFactors includes remote
        # windows in SOLVE_ALL/SERVER modes, d2estimator.cpp:700-736)
        K = layout.W - 1
        n = layout.N_IMU_SAMPLES
        dts = np.zeros((K, n))
        accs = np.zeros((K, n, 3))
        gyrs = np.zeros((K, n, 3))
        mask = np.zeros((K, n), bool)
        valid = np.zeros(K, bool)
        fi = np.zeros(K, np.int32)
        fj = np.zeros(K, np.int32)
        for k, (si, sj, buf) in enumerate(self._imu_chain()[:K]):
            d, a, g, m = buf.period(
                self.frames[si].stamp, self.frames[sj].stamp, n
            )
            dts[k], accs[k], gyrs[k], mask[k] = d, a, g, m
            fi[k], fj[k] = si, sj
            valid[k] = m.any()
        sb = np.asarray(self.state.sb)
        ba = jnp.asarray(sb[fi, 3:6], self.dtype)
        bg = jnp.asarray(sb[fi, 6:9], self.dtype)
        pre = self._preintegrate(
            jnp.asarray(dts, self.dtype), jnp.asarray(accs, self.dtype),
            jnp.asarray(gyrs, self.dtype), jnp.asarray(mask), ba, bg, self.noise
        )
        sqrt_infos = jax.vmap(imu_sqrt_info)(pre.covariance)
        # belt-and-braces: zero (not just mask) invalid intervals so no
        # non-finite values can enter the row assembly
        sqrt_infos = jnp.where(
            jnp.asarray(valid)[:, None, None], sqrt_infos, 0.0
        )
        imu = ImuMeas(
            frame_i=jnp.asarray(fi),
            frame_j=jnp.asarray(fj),
            valid=jnp.asarray(valid),
            pre=pre,
            sqrt_info=sqrt_infos,
        )

        # ---------------- landmarks / projections ----------------
        self.lmanager.initial_landmarks(
            self._cam_pose_of(), e.landmark_estimate_tracks
        )
        usable = self.lmanager.estimated_landmarks(e.landmark_estimate_tracks)
        # keep in-window observations only; cap tau_l by track length
        usable = [
            lm for lm in usable if lm.anchor.frame_id in slots
        ]
        usable.sort(key=lambda lm: -lm.track_length())
        usable = usable[: min(e.max_solve_cnt, layout.L)]

        M = layout.M
        pm = {
            "frame_i": np.zeros(M, np.int32), "frame_j": np.zeros(M, np.int32),
            "cam_i": np.zeros(M, np.int32), "cam_j": np.zeros(M, np.int32),
            "lm": np.zeros(M, np.int32),
            "ray_i": np.tile([0.0, 0, 1], (M, 1)), "ray_j": np.tile([0.0, 0, 1], (M, 1)),
            "vel_i": np.zeros((M, 3)), "vel_j": np.zeros((M, 3)),
            "td_i": np.zeros(M), "td_j": np.zeros(M), "dep_j": np.zeros(M),
            "has_dep": np.zeros(M, bool), "valid": np.zeros(M, bool),
        }
        pos3d = e.landmark_param == "pos3d"
        inv_dep = np.asarray(self.state.inv_dep).copy()
        lm_pos = np.asarray(self.state.lm_pos).copy()
        lm_valid = np.zeros(layout.L, bool)
        self.lm_slot_of = {}
        m = 0
        for slot, lm in enumerate(usable):
            if m >= M:
                break
            a = lm.anchor
            fi = slots[a.frame_id]
            if pos3d and lm.position is None:
                continue
            self.lm_slot_of[lm.lm_id] = slot
            lm_valid[slot] = True
            inv_dep[slot] = lm.inv_dep
            if pos3d:
                lm_pos[slot] = lm.position
            # pos3d: every observation (incl. anchor) is an independent
            # single-frame residual of the world point (reference
            # reprojection3d.h); inv_dep: observations pair with anchor
            for o in (lm.obs if pos3d else lm.obs[1:]):
                if o.frame_id not in slots or m >= M:
                    continue
                pm["frame_i"][m] = fi
                pm["frame_j"][m] = slots[o.frame_id]
                pm["cam_i"][m] = a.cam_id
                pm["cam_j"][m] = o.cam_id
                pm["lm"][m] = slot
                pm["ray_i"][m] = a.ray
                pm["ray_j"][m] = o.ray
                pm["vel_i"][m] = a.ray_vel
                pm["vel_j"][m] = o.ray_vel
                if o.depth > 0:
                    pm["dep_j"][m] = o.depth
                    pm["has_dep"][m] = True
                pm["valid"][m] = True
                m += 1
        proj = ProjMeas(**{
            k: jnp.asarray(v, self.dtype) if v.dtype == np.float64 else jnp.asarray(v)
            for k, v in pm.items()
        })
        self.state = self.state._replace(
            inv_dep=jnp.asarray(inv_dep, self.dtype),
            lm_pos=jnp.asarray(lm_pos, self.dtype),
            lm_valid=jnp.asarray(lm_valid),
        )
        return imu, proj

    def _col_free(self) -> jnp.ndarray:
        e = self.cfg.estimator
        free = np.zeros(self.layout.D_pad, bool)
        for w in range(len(self.frames)):
            free[15 * w : 15 * w + 15] = True
        if e.estimate_extrinsic:
            free[15 * self.layout.W : 15 * self.layout.W + 6 * self.layout.C] = True
        if e.estimate_td:
            free[self.layout.td_col] = True
        return jnp.asarray(free)

    # ------------------------------------------------------------------
    # solve & window management
    # ------------------------------------------------------------------

    def attach_consensus(self, transport_consensus, expected_peers: int,
                         timeout_ms: int = 100) -> None:
        """Enable DISTRIBUTED_CAMERA_CONSENUS mode: every window solve
        becomes ADMM sub-steps exchanging shared poses with peers over
        the transport (reference solveinDistributedMode,
        d2estimator.cpp:502-602 — the sync-token handshake is the
        transport layer's iteration token).

        Shared poses are matched across robots by 64-bit
        (drone_id, frame_id) keys, never by window slot — robots whose
        keyframe decisions diverge still average exactly the frames
        they share (reference updateWithDistributedVinsData applies
        entries by frame id, VINSConsenusSolver.cpp:60-92). Duals are
        therefore keyed by frame id and survive window shifts."""
        self._consensus = transport_consensus
        self._consensus_peers = expected_peers
        self._consensus_timeout = timeout_ms
        self._consensus_token = 0
        self._consensus_tilde: Dict[int, np.ndarray] = {}

    def consensus_key(self, frame: "WindowFrame") -> int:
        """Swarm-wide identity of a window frame. Own frames fold our
        drone id in; remote frames (SOLVE_ALL pool) already carry the
        folded id as their frame_id."""
        from d2slam_tpu.vins.types import global_frame_id

        if frame.drone_id < 0:
            return global_frame_id(self.cfg.self_id, frame.frame_id)
        return int(frame.frame_id)

    # ------------------------------------------------------------------
    # dense prior residency
    # ------------------------------------------------------------------
    # On the fused-solve path the authoritative prior lives in the
    # _solve_marg device carry (pre-permutation by _pending_perm); the
    # host fetches it lazily. Every legacy read/write of `self.prior`
    # (subclasses, map merges, FEJ, consensus) goes through this
    # property, so those paths stay correct — they just pay one
    # explicit fetch when they actually touch it.

    @property
    def prior(self) -> Optional[PriorBlock]:
        if getattr(self, "_prior_dev", False):
            blk = self._solve_marg.get_carry()
            if self._pending_perm is not None:
                blk = permute_prior_frames(
                    self.layout, blk, self._pending_perm
                )
            self._pending_perm = None
            self._prior_dev = False
            self._prior_h = blk if self._prior_some else None
        return getattr(self, "_prior_h", None)

    @prior.setter
    def prior(self, value: Optional[PriorBlock]) -> None:
        self._prior_h = value
        self._prior_dev = False
        self._pending_perm = None
        self._prior_some = value is not None

    def _zero_prior(self) -> PriorBlock:
        if getattr(self, "_zero_prior_cache", None) is None:
            self._zero_prior_cache = zero_prior(self.layout, self.dtype)
        return self._zero_prior_cache

    def _plan_marg_slot(self) -> int:
        """Which slot _manage_window will marginalize after this solve
        (-1 = none) — the reference clearUselessFrames policy, decided
        from keyframe flags alone so it can fuse into the solve
        program. Pool-based subclasses return -1 (their per-drone
        window sync marginalizes through the standalone path)."""
        if (len(self.frames) >= self.layout.W
                and self.frames[-2].is_keyframe
                and self.solve_count > 0):
            return 0
        return -1

    def _solve_window(self):
        with self.perf.stage("build_measurements"):
            imu, proj = self._build_measurements()
        self._last_meas = (imu, proj)
        self._meas_stale = False
        e = self.cfg.estimator
        if getattr(self, "_consensus", None) is not None:
            n = len(self.frames)
            keys = np.array([self.consensus_key(f) for f in self.frames],
                            np.int64)
            for _ in range(max(e.consensus_max_steps, 1)):
                poses_np = np.asarray(self.state.poses, np.float64)
                mask = np.asarray(self.state.frame_valid)
                gp_n, tilde_n, _, _ = self._consensus.consensus_step(
                    self._consensus_token, keys, poses_np[:n],
                    self._consensus_tilde, self._consensus_peers,
                    self._consensus_timeout,
                )
                self._consensus_token += 1
                gp = poses_np.copy()
                gp[:n] = gp_n
                tilde = np.zeros((self.layout.W, 6))
                tilde[:n] = tilde_n
                cons = (
                    jnp.asarray(gp, self.dtype),
                    jnp.asarray(tilde, self.dtype),
                    jnp.asarray(mask),
                    e.rho_frame_T, e.rho_frame_theta,
                )
                new_state, report = self._solve(
                    self.state, imu, proj, self.prior,
                    col_free=self._col_free(), consensus=cons,
                )
                self.state = new_state
        else:
            # plan the window-management marginalization NOW so it fuses
            # into the same device program as the solve (one packed
            # round trip per keyframe instead of two — reference
            # clearUselessFrames decides from keyframe flags alone,
            # which are known pre-solve)
            marg_slot = self._plan_marg_slot()
            remove = np.zeros(self.layout.W, bool)
            if marg_slot >= 0:
                remove[marg_slot] = True
            if not getattr(self, "_prior_dev", False):
                # (re)commit the host prior to the device carry — only
                # after host-side mutations (init, map merge, FEJ
                # standalone path); the steady path never uploads it
                self._solve_marg.set_carry(
                    self._prior_h if self._prior_h is not None
                    else self._zero_prior()
                )
                self._prior_dev = True
                self._pending_perm = None
            perm = (self._pending_perm
                    if self._pending_perm is not None
                    else np.arange(self.layout.W, dtype=np.int32))
            self._pending_perm = None
            with self.perf.stage("lm_solve"):
                new_state, report = self._solve_marg(
                    self.state, imu, proj,
                    np.asarray(perm, np.int32),
                    remove, marg_slot >= 0,
                    bool(self.cfg.estimator.enable_fej
                         and self._prior_some),
                    col_free=self._col_free(),
                )
                jax.block_until_ready(new_state.poses)
            self.state = new_state
            if marg_slot >= 0:
                self._prior_some = True
                self.margin_count += 1
                self._fused_marg_slot = marg_slot
        self.solve_count += 1
        self.last_report = report
        with self.perf.stage("sync_back"):
            self._sync_back()

    def _sync_back(self):
        """Write solved landmark states back to the DB + outlier check
        (reference d2vinsstate.cpp:557-592 syncFromState)."""
        e = self.cfg.estimator
        pos3d = e.landmark_param == "pos3d"
        inv_dep = np.asarray(self.state.inv_dep)
        lm_pos = np.asarray(self.state.lm_pos)
        cam_pose = self._cam_pose_of()
        # batched: gather anchors, ONE vectorized pose/rotation pass,
        # then thin attribute write-back
        lms, slots, fids, cids, rays = [], [], [], [], []
        for lid, slot in self.lm_slot_of.items():
            lm = self.lmanager.db.get(lid)
            if lm is None:
                continue
            lms.append(lm)
            slots.append(slot)
            fids.append(lm.anchor.frame_id)
            cids.append(lm.anchor.cam_id)
            rays.append(lm.anchor.ray)
        if lms:
            slots = np.asarray(slots)
            T, ok = cam_pose.lookup(fids, np.asarray(cids))
            if pos3d:
                pos = lm_pos[slots].astype(np.float64)
                d = np.linalg.norm(pos - T[:, :3], axis=1)
                inv_d = 1.0 / np.maximum(d, 1e-6)
                for k, lm in enumerate(lms):
                    lm.position = pos[k]
                    lm.flag = ESTIMATED
                    if ok[k]:
                        lm.inv_dep = float(inv_d[k])
            else:
                invd = inv_dep[slots]
                R = np_lie.quat_to_rotmat_batch(T[:, 3:])
                pc = np.asarray(rays) / np.maximum(
                    invd[:, None], 1e-12
                )
                pos = T[:, :3] + np.einsum("nij,nj->ni", R, pc)
                good = ok & (invd > 1e-6)
                for k, lm in enumerate(lms):
                    lm.inv_dep = float(invd[k])
                    if good[k]:
                        lm.position = pos[k]
                        lm.flag = ESTIMATED
        self.lmanager.outlier_rejection(
            cam_pose, e.focal_length, e.outlier_reproject_px
        )

    def _manage_window(self):
        if len(self.frames) < self.layout.W:
            return
        # reference clearUselessFrames: drop second-newest non-keyframe,
        # else marginalize the oldest keyframe
        second_newest = self.frames[-2]
        if not second_newest.is_keyframe:
            self._drop_frame(len(self.frames) - 2, marginalize_it=False)
        else:
            self._drop_frame(0, marginalize_it=True)

    def _drop_frame(self, slot: int, marginalize_it: bool):
        frame = self.frames[slot]
        if marginalize_it and getattr(self, "_fused_marg_slot", None) == slot:
            # this slot was already marginalized inside the fused
            # solve+marg program; only the host bookkeeping remains
            self._fused_marg_slot = None
            marginalize_it = False
        if marginalize_it and self.solve_count > 0:
            remove = jnp.zeros(self.layout.W, bool).at[slot].set(True)
            if getattr(self, "_meas_stale", False):
                # slots moved since the cached measurements were built
                # (multiple drops per cycle in the SOLVE_ALL pool) —
                # rebuild so the marginalized rows index live slots
                self._last_meas = self._build_measurements()
                self._meas_stale = False
            imu, proj = getattr(self, "_last_meas", (None, None))
            if imu is not None:
                with self.perf.stage("marginalize"):
                    marg_state = self._fej_marg_state()
                    self.prior = self._marginalize(
                        marg_state, imu, proj, self.prior, remove
                    )
                self.margin_count += 1
        # host bookkeeping: landmarks & window shift
        self.lmanager.pop_frame(frame.frame_id, self._cam_pose_of())
        del self.frames[slot]
        slot_map = list(range(self.layout.W))
        del slot_map[slot]
        slot_map.append(-1)
        self._apply_slot_map(slot_map)

    def _fej_marg_state(self) -> VIOState:
        """State used for marginalization linearization: kept params at
        their first-estimate (FEJ) values when enabled."""
        if not self.cfg.estimator.enable_fej or self.prior is None:
            return self.state
        # reference replacetoPrevLinearizedPoints: params carried by the
        # prior linearize at the prior's stored points; everything else
        # (incl. the removed frame) at current values
        poses = np.asarray(self.state.poses).copy()
        sb = np.asarray(self.state.sb).copy()
        plin_valid = np.asarray(self.prior.lin.frame_valid)
        plin_poses = np.asarray(self.prior.lin.poses)
        plin_sb = np.asarray(self.prior.lin.sb)
        poses[plin_valid] = plin_poses[plin_valid]
        sb[plin_valid] = plin_sb[plin_valid]
        return self.state._replace(
            poses=jnp.asarray(poses, self.dtype), sb=jnp.asarray(sb, self.dtype)
        )

    def _apply_slot_map(self, slot_map):
        poses = np.asarray(self.state.poses)
        sb = np.asarray(self.state.sb)
        fv = np.asarray(self.state.frame_valid)
        new_poses, new_sb, new_fv = poses.copy(), sb.copy(), fv.copy()
        new_fej_p, new_fej_sb = self.fej_poses.copy(), self.fej_sb.copy()
        for new, old in enumerate(slot_map):
            if old < 0:
                new_poses[new] = [0, 0, 0, 0, 0, 0, 1]
                new_sb[new] = 0
                new_fv[new] = False
            else:
                new_poses[new] = poses[old]
                new_sb[new] = sb[old]
                new_fv[new] = fv[old]
                new_fej_p[new] = self.fej_poses[old]
                new_fej_sb[new] = self.fej_sb[old]
        self.state = self.state._replace(
            poses=jnp.asarray(new_poses, self.dtype),
            sb=jnp.asarray(new_sb, self.dtype),
            frame_valid=jnp.asarray(new_fv),
        )
        self.fej_poses, self.fej_sb = new_fej_p, new_fej_sb
        self._meas_stale = True
        if getattr(self, "_prior_dev", False):
            # prior is device-resident: COMPOSE the shift into the
            # pending permutation (applied on device at the next fused
            # solve) instead of fetching 270 KB of J both ways
            sm = np.asarray(slot_map, np.int32)
            if self._pending_perm is None:
                self._pending_perm = sm
            else:
                prev = self._pending_perm
                self._pending_perm = np.where(
                    sm >= 0, prev[np.clip(sm, 0, None)], -1
                ).astype(np.int32)
        elif getattr(self, "_prior_h", None) is not None:
            self.prior = permute_prior_frames(
                self.layout, self._prior_h, slot_map
            )
        # consensus duals are keyed by frame id (attach_consensus), so
        # window shifts need no dual bookkeeping here

    # ------------------------------------------------------------------
    # map merge
    # ------------------------------------------------------------------

    def move_all_poses(self, T: np.ndarray, drone_id: Optional[int] = None):
        """Left-compose rigid transform ``T`` [7] onto every window pose
        (of one drone in the SOLVE_ALL pool, or all frames when
        ``drone_id`` is None) — the reference-frame shift applied on map
        merge (reference D2State::moveAllPoses, d2state.hpp:8-125, and
        PriorFactor::moveByPose, prior_factor.cpp:92+).

        The dense prior moves exactly: rotation tangents are local
        (right-perturbation) and thus invariant; position/velocity
        differences are world-frame and rotate with T, so those prior
        columns are right-multiplied by R_T^T.

        T should be yaw-only (4-DoF) like the reference's map merge —
        a full 3D rotation would break the gravity alignment baked into
        the IMU factors.
        """
        R = np_lie.quat_to_rotmat(np.asarray(T[3:], np.float64))
        moved = [
            w for w, f in enumerate(self.frames)
            if drone_id is None or f.drone_id == drone_id
            or (f.drone_id < 0 and drone_id == self.cfg.self_id)
        ]
        if not moved:
            return

        def shift(poses, sb):
            for w in moved:
                poses[w] = np_lie.pose_compose(T, poses[w])
                sb[w, :3] = R @ sb[w, :3]

        poses = np.asarray(self.state.poses, np.float64).copy()
        sb = np.asarray(self.state.sb, np.float64).copy()
        shift(poses, sb)
        self.state = self.state._replace(
            poses=jnp.asarray(poses, self.dtype),
            sb=jnp.asarray(sb, self.dtype),
        )
        shift(self.fej_poses, self.fej_sb)

        if self.prior is not None:
            J = np.asarray(self.prior.J).copy()
            for w in moved:
                for c in (15 * w, 15 * w + 6):  # position, velocity cols
                    J[:, c : c + 3] = J[:, c : c + 3] @ R.T
            lp = np.asarray(self.prior.lin.poses, np.float64).copy()
            ls = np.asarray(self.prior.lin.sb, np.float64).copy()
            shift(lp, ls)
            self.prior = self.prior._replace(
                J=jnp.asarray(J, self.dtype),
                lin=self.prior.lin._replace(
                    poses=jnp.asarray(lp, self.dtype),
                    sb=jnp.asarray(ls, self.dtype),
                ),
            )

        # stored landmark positions anchored in moved frames
        moved_fids = {self.frames[w].frame_id for w in moved}
        for lm in self.lmanager.db.values():
            if lm.obs and lm.anchor.frame_id in moved_fids \
                    and lm.position is not None:
                lm.position = np_lie.pose_apply(T, lm.position)
        self._meas_stale = True

    # ------------------------------------------------------------------
    # outputs
    # ------------------------------------------------------------------

    def latest_odometry(self) -> Optional[Odometry]:
        if not self.frames:
            return None
        w = self._last_self_slot()
        return Odometry(
            stamp=self.frames[w].stamp,
            pose=np.asarray(self.state.poses[w]),
            vel=np.asarray(self.state.sb[w, :3]),
        )

    def imu_propagated_odometry(self, t: float) -> Optional[Odometry]:
        """IMU-rate odometry ahead of the last keyframe (reference
        inputImu publishing path, d2estimator.cpp:57-72)."""
        if not self.frames:
            return None
        w = self._last_self_slot()
        f = self.frames[w]
        dts, accs, gyrs, mask = self.imubuf.period(
            f.stamp, t, self.layout.N_IMU_SAMPLES
        )
        sb = np.asarray(self.state.sb[w])
        pose, vel = imu_propagate_pose(
            self.state.poses[w], jnp.asarray(sb[:3], self.dtype),
            jnp.asarray(sb[3:6], self.dtype), jnp.asarray(sb[6:9], self.dtype),
            jnp.asarray(dts, self.dtype), jnp.asarray(accs, self.dtype),
            jnp.asarray(gyrs, self.dtype), jnp.asarray(mask), -self.gravity,
        )
        return Odometry(stamp=t, pose=np.asarray(pose), vel=np.asarray(vel))
