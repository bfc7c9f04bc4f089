"""Kalibr camera-chain YAML loader.

The reference configures its cameras from kalibr-style ``camchain``
YAML files (one block per ``camN``: ``camera_model`` /
``distortion_model`` / ``intrinsics`` / ``distortion_coeffs`` /
``T_cam_imu`` / ``resolution`` / ``rostopic`` / ``cam_overlaps``),
parsed by ``D2FrontendParams::readCameraCalibrationfromFile``
(reference: d2frontend/src/d2frontend_params.cpp:376-462). This module
is the equivalent for this framework: it maps each camera block onto
the matching parameter struct in :mod:`d2slam_tpu.geometry.cameras`
and converts ``T_cam_imu`` to a body->camera extrinsic pose.

Supported model pairs (the reference supports the first two and exits
on anything else; we additionally accept kalibr's ``equidistant`` and
undistorted pinholes):

==============  ================  ==========================
camera_model    distortion_model  parameter struct
==============  ================  ==========================
omni            radtan / none     :class:`MEIParams`
pinhole         radtan / none     :class:`PinholeParams`
pinhole         equidistant       :class:`KBParams`
==============  ================  ==========================

Extrinsic conventions mirror the reference's
``extrinsic_parameter_type`` (d2frontend_params.cpp:450-457):

* type 0 (OmniNxt): ``T_cam_imu`` stores the body(imu)->cam transform
  of *points*; the extrinsic pose is its inverse
  (``R = R^T, t = -R^T t``).
* type 1: ``T_cam_imu`` already is the camera pose in the body frame
  and is taken verbatim.
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from d2slam_tpu.geometry import cameras as cam
from d2slam_tpu.geometry import lie


def _pose_from_matrix_np(T: np.ndarray) -> np.ndarray:
    """4x4 homogeneous matrix -> pose [p(3), q_xyzw(4)] (numpy)."""
    import jax.numpy as jnp

    pose = lie.pose_from_matrix(jnp.asarray(T, jnp.float64))
    return np.asarray(pose, np.float64)


@dataclasses.dataclass
class KalibrCamera:
    """One camera of a kalibr chain, in framework-native form."""

    name: str                      # "cam0", "cam1", ...
    model: str                     # "omni" | "pinhole" | "kb"
    params: object                 # MEIParams | PinholeParams | KBParams
    resolution: Tuple[int, int]    # (width, height)
    extrinsic: np.ndarray          # body->cam pose [p(3), q_xyzw(4)]
    T_cam_imu: Optional[np.ndarray] = None   # raw 4x4 from the file
    T_cn_cnm1: Optional[np.ndarray] = None   # raw 4x4 chain transform
    rostopic: Optional[str] = None
    overlaps: Tuple[int, ...] = ()

    def project(self, pts3):
        """Camera-frame 3D points -> ``(pixels, valid)``
        (dispatches on model; reference spaceToPlane)."""
        if self.model == "omni":
            return cam.mei_project(pts3, self.params)
        if self.model == "pinhole":
            return cam.pinhole_project(pts3, self.params)
        return cam.kb_project(pts3, self.params)

    def lift(self, uv):
        """Pixels -> unit-norm rays (reference liftProjective)."""
        if self.model == "omni":
            return cam.mei_lift(uv, self.params)
        if self.model == "pinhole":
            return cam.pinhole_lift(uv, self.params)
        return cam.kb_lift(uv, self.params)


def _parse_camera(name: str, node: dict, extrinsic_parameter_type: int,
                  dtype) -> KalibrCamera:
    model = str(node.get("camera_model", "pinhole"))
    dist_model = str(node.get("distortion_model", "none"))
    intr = [float(v) for v in node.get("intrinsics", [])]
    dist = [float(v) for v in node.get("distortion_coeffs", [])] + [0.0] * 4
    res = node.get("resolution", [0, 0])

    if model == "omni":
        # intrinsics = [xi, gamma1, gamma2, u0, v0]
        # (reference d2frontend_params.cpp:398-415)
        if dist_model not in ("radtan", "none"):
            raise ValueError(f"{name}: omni supports radtan/none, "
                             f"got {dist_model}")
        xi, fx, fy, cx, cy = intr[:5]
        params = cam.MEIParams.make(xi, fx, fy, cx, cy, *dist[:4],
                                    dtype=dtype)
        model_out = "omni"
    elif model == "pinhole" and dist_model in ("radtan", "none"):
        fx, fy, cx, cy = intr[:4]
        params = cam.PinholeParams.make(fx, fy, cx, cy, *dist[:4],
                                        dtype=dtype)
        model_out = "pinhole"
    elif model == "pinhole" and dist_model == "equidistant":
        # kalibr equidistant [k1..k4] == camodocal KB k2..k5
        fx, fy, cx, cy = intr[:4]
        params = cam.KBParams.make(fx, fy, cx, cy, *dist[:4], dtype=dtype)
        model_out = "kb"
    else:
        raise ValueError(
            f"{name}: unsupported camera_model/distortion_model "
            f"{model}/{dist_model}")

    T_cam_imu = None
    extrinsic = np.array([0, 0, 0, 0, 0, 0, 1.0])
    if "T_cam_imu" in node:
        T_cam_imu = np.asarray(node["T_cam_imu"], np.float64)
        if extrinsic_parameter_type == 0:
            # invert: points-map imu->cam stored; we want cam pose in body
            # (reference d2frontend_params.cpp:450-452)
            Tb = np.eye(4)
            R = T_cam_imu[:3, :3].T
            Tb[:3, :3] = R
            Tb[:3, 3] = -R @ T_cam_imu[:3, 3]
            extrinsic = _pose_from_matrix_np(Tb)
        else:
            extrinsic = _pose_from_matrix_np(T_cam_imu)

    T_cn_cnm1 = None
    if "T_cn_cnm1" in node:
        T_cn_cnm1 = np.asarray(node["T_cn_cnm1"], np.float64)

    return KalibrCamera(
        name=name,
        model=model_out,
        params=params,
        resolution=(int(res[0]), int(res[1])),
        extrinsic=extrinsic,
        T_cam_imu=T_cam_imu,
        T_cn_cnm1=T_cn_cnm1,
        rostopic=node.get("rostopic"),
        overlaps=tuple(node.get("cam_overlaps", []) or ()),
    )


def load_camchain(path: str, extrinsic_parameter_type: int = 0,
                  dtype=None) -> List[KalibrCamera]:
    """Load a kalibr camchain YAML into a list of :class:`KalibrCamera`,
    ordered ``cam0, cam1, ...`` (reference
    readCameraCalibrationfromFile, d2frontend_params.cpp:376-386)."""
    import jax.numpy as jnp
    import yaml

    if dtype is None:
        dtype = jnp.float32
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    names = sorted((k for k in raw if k.startswith("cam")),
                   key=lambda s: int(s[3:]))
    return [_parse_camera(n, raw[n], extrinsic_parameter_type, dtype)
            for n in names]


def chain_consistency_errors(chain: Sequence[KalibrCamera]) -> List[float]:
    """Max |T_cn_cnm1 @ T_{n-1}_imu - T_n_imu| per camera with a chain
    transform — a sanity check that the file's two extrinsic encodings
    agree (useful after hand-editing calibration files)."""
    errs = []
    for prev, cur in zip(chain[:-1], chain[1:]):
        if cur.T_cn_cnm1 is None or prev.T_cam_imu is None \
                or cur.T_cam_imu is None:
            continue
        errs.append(float(np.max(np.abs(
            cur.T_cn_cnm1 @ prev.T_cam_imu - cur.T_cam_imu))))
    return errs
