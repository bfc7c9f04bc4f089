"""Quadcam omnidirectional depth pipeline.

TPU-native equivalent of the reference's quadcam_depth_est node
(reference: quadcam_depth_est/src/quadcam_depth_est_trt.cpp 3-thread
pipeline + virtual_stereo.cpp): split the 4 fisheye views, undistort
each adjacent pair into co-facing virtual pinhole halves, run disparity
(Pallas fused block matching on TPU or the HitNet network when weights
are loaded), and assemble camera-frame point clouds. The whole
per-pair compute is one jitted function; the 4 virtual stereo pairs
batch naturally.
"""
from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from d2slam_tpu.depth.fisheye_undist import build_undistort_map, remap_bilinear
from d2slam_tpu.depth.stereo import disparity, points_from_disparity
from d2slam_tpu.geometry.cameras import KBParams
from d2slam_tpu.geometry.lie import so3_exp
from d2slam_tpu.utils import np_lie


@dataclasses.dataclass
class QuadcamConfig:
    out_hw: tuple = (240, 320)
    virtual_fov_deg: float = 90.0
    max_disp: int = 64
    block: int = 9
    min_z: float = 0.3
    max_z: float = 30.0


class VirtualStereoPair(NamedTuple):
    """Precomputed remap tables for one adjacent-camera pair."""
    map_left: jax.Array    # [H, W, 2] into the left fisheye image
    map_right: jax.Array   # [H, W, 2] into the right fisheye image
    cam_left: int
    cam_right: int
    baseline: float
    focal: float
    T_body_virtual: np.ndarray  # [7] pose of the virtual left camera


def build_virtual_stereo(
    fisheyes: List[KBParams],
    extrinsics: np.ndarray,     # [4, 7] body_T_cam, cameras at 90° yaw steps
    cfg: QuadcamConfig = QuadcamConfig(),
) -> List[VirtualStereoPair]:
    """For each adjacent camera pair (i, i+1 mod 4), build virtual
    pinhole half-views facing the direction BETWEEN the two cameras
    (reference VirtualStereo: left cam yaws +45°, right cam yaws -45°,
    so both virtual views are parallel -> rectified by construction)."""
    pairs = []
    for i in range(4):
        j = (i + 1) % 4
        # rotation from the virtual (forward) frame into each fisheye
        # camera frame: camera yaw ±45° about the vertical (camera y)
        R_li = np.asarray(so3_exp(jnp.asarray([0.0, np.deg2rad(45.0), 0.0],
                                              jnp.float64)))
        R_rj = np.asarray(so3_exp(jnp.asarray([0.0, np.deg2rad(-45.0), 0.0],
                                              jnp.float64)))
        map_l, f = build_undistort_map(
            fisheyes[i], jnp.asarray(R_li, jnp.float32), cfg.out_hw,
            cfg.virtual_fov_deg,
        )
        map_r, _ = build_undistort_map(
            fisheyes[j], jnp.asarray(R_rj, jnp.float32), cfg.out_hw,
            cfg.virtual_fov_deg,
        )
        # baseline = distance between the two camera centers
        baseline = float(
            np.linalg.norm(extrinsics[i][:3] - extrinsics[j][:3])
        )
        pairs.append(VirtualStereoPair(
            map_left=map_l, map_right=map_r, cam_left=i, cam_right=j,
            baseline=baseline, focal=float(f),
            T_body_virtual=extrinsics[i],
        ))
    return pairs


def quadcam_depth(
    images: List[jax.Array],          # 4 fisheye images [Hf, Wf]
    pairs: List[VirtualStereoPair],
    cfg: QuadcamConfig = QuadcamConfig(),
    hitnet=None,                      # optional (apply, params) from
                                      # depth.hitnet.load_trained_hitnet
    photometric: Optional[List[jax.Array]] = None,
    color_images: Optional[List[jax.Array]] = None,
):
    """Run all 4 virtual stereo pairs. Returns a list of
    (points [H, W, 3] in the virtual-left camera frame, valid [H, W]) —
    or, with ``color_images``, triples (points, valid, texture): each
    point carries its remapped left-view texture sample, the
    reference's RGB point-cloud path (quadcam_depth_est_trt.hpp:22-114
    publishThread textures clouds with the rectified left image).
    ``color_images`` entries are per-camera [Hf, Wf] gray or
    [Hf, Wf, 3] RGB (channels remap independently).

    With `hitnet`, disparity comes from the trained HitNet network (the
    reference's primary path, quadcam_depth_est_trt.cpp inferrenceThread);
    otherwise from the classical block matcher (the reference's SGBM
    fallback estimateDisparityOCV). `photometric` is an optional list of
    per-camera [Hf, Wf] vignette-correction gain maps
    (tools.calibrate_vignette), applied before remapping as the
    reference's photometric_calib images are."""
    H, W = cfg.out_hw
    out = []
    for p in pairs:
        ph_l = photometric[p.cam_left] if photometric is not None else None
        ph_r = photometric[p.cam_right] if photometric is not None else None
        left = remap_bilinear(images[p.cam_left], p.map_left, ph_l)
        right = remap_bilinear(images[p.cam_right], p.map_right, ph_r)
        if hitnet is not None:
            apply, params = hitnet
            disp = apply(params, left, right)
            valid = disp > 0.5
        else:
            disp, valid = disparity(
                left, right, max_disp=cfg.max_disp, block=cfg.block
            )
        pts, ok = points_from_disparity(
            disp, valid, fx=p.focal, baseline=p.baseline,
            cx=W / 2.0, cy=H / 2.0, min_z=cfg.min_z, max_z=cfg.max_z,
        )
        if color_images is None:
            out.append((pts, ok))
            continue
        ci = color_images[p.cam_left]
        if ci.ndim == 3:  # RGB: remap each channel through the same map
            tex = jnp.stack(
                [remap_bilinear(ci[..., c], p.map_left) for c in range(3)],
                axis=-1,
            )
        else:
            tex = remap_bilinear(ci, p.map_left)
        out.append((pts, ok, tex))
    return out


def cloud_in_body(pair: VirtualStereoPair, pts: jax.Array) -> jax.Array:
    """Transform a [H, W, 3] virtual-left-camera cloud into the body
    frame through the pair's extrinsic (the reference publishes clouds
    composed into a common frame, quadcam_depth_est_trt publishThread)."""
    from d2slam_tpu.utils import np_lie
    import numpy as np

    T = np.asarray(pair.T_body_virtual, np.float64)
    R = np_lie.quat_to_rotmat(T[3:])
    return pts @ jnp.asarray(R.T, pts.dtype) + jnp.asarray(T[:3], pts.dtype)
