"""Kalibr camchain loading (reference
d2frontend_params.cpp:376-462 readCameraCalibrationfromFile)."""
import os
import textwrap

import numpy as np
import pytest

from d2slam_tpu.geometry import (
    chain_consistency_errors,
    load_camchain,
    pose_apply,
    pose_to_matrix,
)

import jax.numpy as jnp


def _write_chain(tmp_path):
    # cam1 sits 10 cm right of cam0, both tilted; T_cn_cnm1 consistent
    # with the two T_cam_imu blocks.
    from d2slam_tpu.geometry import lie
    import jax.numpy as jnp

    def T_of(rvec, t):
        pose = jnp.concatenate([jnp.asarray(t, jnp.float64),
                                lie.so3_exp_quat(jnp.asarray(rvec, jnp.float64))])
        return np.asarray(pose_to_matrix(pose), np.float64)

    T0 = T_of([0.02, -0.01, 0.03], [0.05, -0.06, 0.07])
    T1 = T_of([-0.01, 0.02, 0.025], [-0.05, -0.055, 0.071])
    T10 = T1 @ np.linalg.inv(T0)

    def rows(T):
        return "\n".join(
            "  - [" + ", ".join(f"{float(v)!r}" for v in r) + "]" for r in T)

    text = textwrap.dedent("""\
    cam0:
      T_cam_imu:
    {t0}
      cam_overlaps: [1]
      camera_model: omni
      distortion_coeffs: [-0.06, 0.17, 0.0007, 0.0005]
      distortion_model: radtan
      intrinsics: [1.79, 533.3, 533.2, 254.6, 256.5]
      resolution: [512, 512]
      rostopic: /cam0/image_raw
    cam1:
      T_cam_imu:
    {t1}
      T_cn_cnm1:
    {t10}
      cam_overlaps: [0]
      camera_model: pinhole
      distortion_coeffs: [-0.01, 0.005, 0.0001, -0.0002]
      distortion_model: equidistant
      intrinsics: [460.0, 461.0, 320.0, 240.0]
      resolution: [640, 480]
      rostopic: /cam1/image_raw
    """).format(t0=rows(T0).replace("  -", "    -"),
                t1=rows(T1).replace("  -", "    -"),
                t10=rows(T10).replace("  -", "    -"))
    p = tmp_path / "camchain.yaml"
    p.write_text(text)
    return str(p), T0, T1


def test_load_camchain_models_and_roundtrip(tmp_path):
    path, T0, T1 = _write_chain(tmp_path)
    chain = load_camchain(path, extrinsic_parameter_type=0,
                          dtype=jnp.float64)
    assert [c.name for c in chain] == ["cam0", "cam1"]
    assert chain[0].model == "omni" and chain[1].model == "kb"
    assert chain[0].resolution == (512, 512)
    assert chain[0].overlaps == (1,)
    assert chain[1].rostopic == "/cam1/image_raw"
    # intrinsics landed in the right slots
    assert float(chain[0].params.xi) == pytest.approx(1.79)
    assert float(chain[0].params.fx) == pytest.approx(533.3)
    assert float(chain[1].params.k2) == pytest.approx(-0.01)  # kalibr k1

    # project/lift round trip through the dispatched camera
    pts = np.array([[0.3, -0.2, 2.0], [-0.5, 0.4, 3.0]])
    for c in chain:
        uv, valid = c.project(jnp.asarray(pts))
        assert bool(np.all(np.asarray(valid)))
        rays = np.asarray(c.lift(uv))
        d = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
        assert np.allclose(rays / np.linalg.norm(rays, axis=-1,
                                                 keepdims=True), d, atol=1e-6)

    # chain transform consistent with per-camera extrinsics
    assert max(chain_consistency_errors(chain)) < 1e-9


def test_extrinsic_parameter_types(tmp_path):
    path, T0, _ = _write_chain(tmp_path)
    # type 0 (reference OmniNxt): extrinsic = T_cam_imu^{-1}
    c0 = load_camchain(path, extrinsic_parameter_type=0)[0]
    T_expect = np.linalg.inv(T0)
    assert np.allclose(np.asarray(pose_to_matrix(
        jnp.asarray(c0.extrinsic))), T_expect, atol=1e-6)
    # a body-frame point maps into cam0 pixels consistently:
    # x_cam = T_cam_imu @ x_body = extrinsic^{-1} applied
    xb = np.array([0.4, 0.1, 2.5])
    x_cam = (T0 @ np.r_[xb, 1.0])[:3]
    from d2slam_tpu.geometry import pose_inverse
    x_cam2 = np.asarray(pose_apply(pose_inverse(
        jnp.asarray(c0.extrinsic)), jnp.asarray(xb)))
    assert np.allclose(x_cam, x_cam2, atol=1e-6)
    # type 1: taken verbatim
    c0v = load_camchain(path, extrinsic_parameter_type=1)[0]
    assert np.allclose(np.asarray(pose_to_matrix(
        jnp.asarray(c0v.extrinsic))), T0, atol=1e-6)


REF_QUADCAM = "/root/reference/config/quadcam/quad_cam_calib-camchain-imucam.yaml"
REF_TUM = "/root/reference/config/tum/camchain-imucam-imucalib.yaml"


@pytest.mark.skipif(not os.path.exists(REF_TUM),
                    reason="reference configs not present")
def test_load_reference_chains():
    # TUM-VI stereo chain: T_cn_cnm1 agrees with the absolute
    # extrinsics to machine precision (validates our convention).
    tum = load_camchain(REF_TUM, extrinsic_parameter_type=0)
    assert len(tum) == 2 and all(c.model == "omni" for c in tum)
    errs = chain_consistency_errors(tum)
    assert errs and max(errs) < 1e-12

    # Quadcam rig: 4 omni cameras; its T_cn_cnm1 blocks come from a
    # separate stereo calibration run and do NOT match the imu-cam
    # extrinsics — the diagnostic must surface that.
    quad = load_camchain(REF_QUADCAM, extrinsic_parameter_type=0)
    assert len(quad) == 4
    assert all(c.model == "omni" for c in quad)
    assert all(c.resolution == (1280, 800) for c in quad)
    assert max(chain_consistency_errors(quad)) > 0.5


def test_config_loads_camchain(tmp_path):
    path, _, _ = _write_chain(tmp_path)
    cfg_yaml = tmp_path / "dataset.yaml"
    cfg_yaml.write_text(
        "calib_file: camchain.yaml\nextrinsic_parameter_type: 0\n"
        "num_cams: 2\n")
    from d2slam_tpu.config import D2Config
    cfg = D2Config.from_yaml(str(cfg_yaml))
    cams = cfg.load_cameras()
    assert len(cams) == 2 and cams[0].model == "omni"
