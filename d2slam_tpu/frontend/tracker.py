"""Feature tracker: the host state machine turning images into
landmark-observation frames for the estimator.

TPU-native redesign of the reference D2FeatureTracker
(reference: d2frontend/src/d2featuretracker.cpp): SuperPoint extraction
and descriptor matching run as jitted batched device code; the
data-dependent bookkeeping — landmark id assignment, keyframe decision,
track carry-over — stays here. Covers the reference's local pipeline:

* descriptor match against the last keyframe with motion-predicted
  radius gating (matchLocalFeatures :1077-1294);
* an LK optical-flow layer that carries existing landmarks between
  frames (trackLK :472-621, ``sp_track_use_lk``);
* stereo left->right association (track(left,right) :658-753);
* keyframe decision on parallax / tracked-feature count
  (isKeyframe :754-775).
"""
from __future__ import annotations

import dataclasses
import itertools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from d2slam_tpu.frontend.lk import build_pyramid, lk_track_pyramidal
from d2slam_tpu.frontend.matching import match_descriptors, match_descriptors_radius
from d2slam_tpu.frontend.superpoint import (
    SuperPointConfig,
    superpoint_extract,
)
from d2slam_tpu.geometry.cameras import PinholeParams, pinhole_lift
from d2slam_tpu.vins.types import CameraObservations, FrontendFrame


@dataclasses.dataclass
class TrackerConfig:
    min_keyframe_parallax: float = 10.0       # px (reference kf gating)
    min_tracked_for_nonkf: int = 40           # below -> force keyframe
    match_ratio: float = 0.8
    search_radius: float = 40.0               # px, radius-gated matching
    stereo_ratio: float = 0.8
    use_lk: bool = True
    lk_levels: int = 3
    max_features: int = 200


class TrackedFeature:
    __slots__ = ("lm_id", "pt", "desc", "n_tracks")

    def __init__(self, lm_id, pt, desc):
        self.lm_id = lm_id
        self.pt = pt          # np [2] pixel in cam0
        self.desc = desc      # np [D]
        self.n_tracks = 1


class FeatureTracker:
    def __init__(
        self,
        sp_params,
        sp_cfg: SuperPointConfig,
        cam_params: List[PinholeParams],
        cfg: TrackerConfig = TrackerConfig(),
        frame_rate: float = 8.0,
        extract_fn=None,
    ):
        """extract_fn: optional override ``f(img, cam_id) ->
        SuperPointOutput`` (tests inject oracle extractors; production
        uses jitted SuperPoint)."""
        self.sp_params = sp_params
        self.sp_cfg = sp_cfg
        self.cams = cam_params  # PinholeParams or any object with .lift
        #                         (e.g. geometry.kalibr.KalibrCamera)
        self.cfg = cfg
        self.dt = 1.0 / frame_rate
        if extract_fn is None:
            jitted = jax.jit(
                lambda img: superpoint_extract(sp_params, img, sp_cfg)
            )
            self._extract = lambda img, cam_id: jitted(img)
        else:
            self._extract = extract_fn
        self._lm_ids = itertools.count(0)
        self.prev: Dict = {}          # last processed frame data
        self.last_kf: Dict = {}       # last keyframe data
        self.frame_count = 0
        self.landmark_count = 0

    def _lift(self, cam_idx: int, uv):
        """Pixels -> unit rays for camera ``cam_idx``; dispatches on the
        camera object so fisheye chains (KalibrCamera) work alongside
        bare PinholeParams (reference liftProjective polymorphism)."""
        cam = self.cams[cam_idx]
        uv = jnp.asarray(uv, jnp.float32)
        if hasattr(cam, "lift"):
            return cam.lift(uv)
        return pinhole_lift(uv, cam)

    # ------------------------------------------------------------------

    def process_stereo(self, stamp: float, frame_id: int,
                       img_left: np.ndarray, img_right: np.ndarray
                       ) -> Optional[FrontendFrame]:
        """Returns a FrontendFrame when this frame is a keyframe."""
        imgL = jnp.asarray(img_left, jnp.float32)
        imgR = jnp.asarray(img_right, jnp.float32)
        outL = self._extract(imgL, 0)
        outR = self._extract(imgR, 1)

        kptsL = np.asarray(outL.kpts)
        descL = np.asarray(outL.desc)
        validL = np.asarray(outL.valid)

        # ---- LK carry-over FIRST: geometric short-baseline tracking is
        # the trustworthy association layer (reference trackLK carries
        # SuperPoint landmarks between frames; descriptor matching then
        # only fills the gaps). Descriptor-first would let look-alike
        # features alias under wide radius gates.
        matched_ids = -np.ones(len(kptsL), np.int64)
        pyr_now = build_pyramid(imgL, self.cfg.lk_levels)
        if self.cfg.use_lk and self.prev:
            pyr_prev = self.prev["pyr"]
            prev_pts = self.prev["pts"]
            prev_ids = self.prev["ids"]
            live = np.asarray(self.prev["valid"])
            if live.any():
                new_pts, ok = lk_track_pyramidal(
                    pyr_prev, pyr_now,
                    jnp.asarray(prev_pts, jnp.float32),
                    jnp.asarray(live),
                )
                new_pts, ok = np.asarray(new_pts), np.asarray(ok)
                already: set = set()
                for i in np.flatnonzero(ok):
                    lid = prev_ids[i]
                    if lid < 0 or lid in already:
                        continue
                    d = np.linalg.norm(kptsL - new_pts[i], axis=1)
                    j = int(np.argmin(d))
                    if d[j] < 2.0 and matched_ids[j] < 0 and validL[j]:
                        matched_ids[j] = lid
                        already.add(lid)

        # ---- descriptor match vs last keyframe for remaining gaps ----
        if self.last_kf:
            kf = self.last_kf
            taken = set(matched_ids[matched_ids >= 0].tolist())
            kf_free = np.asarray([lid not in taken for lid in kf["ids"]])
            target_free = jnp.asarray(matched_ids < 0) & outL.valid
            idx, ok = match_descriptors_radius(
                jnp.asarray(kf["desc"]), outL.desc,
                jnp.asarray(kf["pts"], jnp.float32), outL.kpts,
                jnp.asarray(kf["valid"] & kf_free), target_free,
                radius=self.cfg.search_radius, ratio=self.cfg.match_ratio,
            )
            idx, ok = np.asarray(idx), np.asarray(ok)
            for a_i in np.flatnonzero(ok):
                if matched_ids[idx[a_i]] < 0:
                    matched_ids[idx[a_i]] = kf["ids"][a_i]

        # ---- new landmark ids ----
        for j in np.flatnonzero(validL):
            if matched_ids[j] < 0:
                matched_ids[j] = next(self._lm_ids)
                self.landmark_count += 1

        # ---- keyframe decision (reference isKeyframe) ----
        tracked = 0
        parallax = 0.0
        if self.last_kf:
            kf_pts_of = {lid: p for lid, p in
                         zip(self.last_kf["ids"], self.last_kf["pts"])}
            moves = []
            for j in np.flatnonzero(validL):
                lid = matched_ids[j]
                if lid in kf_pts_of:
                    tracked += 1
                    moves.append(np.linalg.norm(kptsL[j] - kf_pts_of[lid]))
            parallax = float(np.mean(moves)) if moves else 1e9
        is_keyframe = (
            not self.last_kf
            or parallax > self.cfg.min_keyframe_parallax
            or tracked < self.cfg.min_tracked_for_nonkf
        )

        # ---- stereo association (epipolar band gated) ----
        from d2slam_tpu.frontend.matching import match_stereo_epipolar

        idxR, okR = match_stereo_epipolar(
            outL.desc, outR.desc, outL.kpts, outR.kpts,
            outL.valid, outR.valid,
            ratio=self.cfg.stereo_ratio,
        )
        idxR, okR = np.asarray(idxR), np.asarray(okR)
        kptsR = np.asarray(outR.kpts)

        # ---- ray velocities from previous positions ----
        prev_pt_of = {}
        if self.prev:
            prev_pt_of = {lid: p for lid, p in
                          zip(self.prev["ids"], self.prev["pts"])}

        self.prev = dict(
            pyr=pyr_now, pts=kptsL, ids=matched_ids, valid=validL,
            desc=descL,
        )
        self.frame_count += 1

        if not is_keyframe:
            return None

        self.last_kf = dict(
            pts=kptsL, ids=matched_ids, valid=validL, desc=descL,
        )

        # ---- build FrontendFrame (unit rays via camera lift) ----
        obs = []
        selL = np.flatnonzero(validL)
        raysL = np.asarray(self._lift(0, kptsL[selL]))
        velL = np.zeros_like(raysL)
        for k, j in enumerate(selL):
            lid = matched_ids[j]
            if lid in prev_pt_of:
                prev_ray = np.asarray(
                    self._lift(0, prev_pt_of[lid][None])
                )[0]
                velL[k] = (raysL[k] - prev_ray) / self.dt
        obs.append(
            CameraObservations(
                cam_id=0,
                landmark_ids=matched_ids[selL],
                rays=raysL,
                ray_vels=velL,
            )
        )
        selR = np.flatnonzero(okR & validL)
        if len(selR):
            raysR = np.asarray(self._lift(1, kptsR[idxR[selR]]))
            obs.append(
                CameraObservations(
                    cam_id=1,
                    landmark_ids=matched_ids[selR],
                    rays=raysR,
                    ray_vels=np.zeros_like(raysR),
                )
            )
        return FrontendFrame(
            stamp=stamp, frame_id=frame_id, is_keyframe=True,
            observations=obs,
        )
