"""Bag toolbox: quadcam split, multi-bag sync, filter, info."""
import numpy as np

from d2slam_tpu.datasets.rosbag import RosbagReader, RosbagWriter
from d2slam_tpu.tools.bag_tools import (
    bag_info,
    filter_bag,
    find_time0,
    split_composite,
    split_quadcam_bag,
    sync_bags,
)


def _write_quadcam_bag(path, t0=100.0, n_frames=6):
    rng = np.random.RandomState(1)
    composites = []
    with RosbagWriter(str(path)) as w:
        for i in range(n_frames * 5):
            w.write_imu("/imu", t0 + i * 0.01, acc=[0, 0, 9.8], gyr=[0, 0, 0])
        for i in range(n_frames):
            img = rng.randint(0, 256, (20, 4 * 32), np.uint8)
            composites.append(img)
            w.write_image("/arducam/image", t0 + i * 0.05, img)
    return composites


def test_split_composite():
    img = np.arange(8 * 16, dtype=np.uint8).reshape(8, 16)
    views = split_composite(img, 4)
    assert len(views) == 4 and all(v.shape == (8, 4) for v in views)
    np.testing.assert_array_equal(np.concatenate(views, axis=1), img)


def test_split_quadcam_bag(tmp_path):
    p = tmp_path / "quad.bag"
    composites = _write_quadcam_bag(p)
    out = split_quadcam_bag(str(p), keep_topics=["/imu"], step=2)
    r = RosbagReader(out)
    assert r.topics["/cam_0/image"] == "sensor_msgs/Image"
    cams = [[m["image"] for _, _, m in r.read_messages([f"/cam_{i}/image"])]
            for i in range(4)]
    assert all(len(c) == 3 for c in cams)  # step=2 over 6 frames
    # view i of frame 0 is the i-th horizontal quarter of composite 0
    for i in range(4):
        np.testing.assert_array_equal(
            cams[i][0], composites[0][:, i * 32:(i + 1) * 32])
    # IMU passed through
    assert len(list(r.read_messages(["/imu"]))) == 30


def test_sync_bags(tmp_path):
    pa = tmp_path / "droneA.bag"
    pb = tmp_path / "droneB.bag"
    _write_quadcam_bag(pa, t0=100.0)
    _write_quadcam_bag(pb, t0=250.5)
    assert abs(find_time0(str(pa)) - 100.0) < 1e-6
    outs = sync_bags([str(pa), str(pb)], out_dir=str(tmp_path), t_start=1.0)
    t0s = [find_time0(out) for out, _ in outs]
    assert all(abs(t - 1.0) < 1e-6 for t in t0s)
    # embedded header stamps were shifted along with record times
    ra = RosbagReader(outs[0][0])
    for _, t, m in ra.read_messages(["/imu"]):
        assert abs(m["stamp"] - t) < 1e-6
        break


def test_filter_and_info(tmp_path):
    p = tmp_path / "quad.bag"
    _write_quadcam_bag(p, t0=10.0)
    out = tmp_path / "cut.bag"
    n = filter_bag(str(p), str(out), topics=["/imu"],
                   t_start=10.05, t_end=10.15, step=1)
    assert n == 11  # 0.05..0.15 inclusive at 100 Hz
    info = bag_info(str(out))
    assert set(info) == {"/imu"}
    assert info["/imu"]["count"] == 11
    assert abs(info["/imu"]["t1"] - info["/imu"]["t0"] - 0.1) < 1e-6


def test_generate_stereo_bag(tmp_path):
    from d2slam_tpu.tools.bag_tools import generate_stereo_bag

    p = tmp_path / "quad.bag"
    rng = np.random.RandomState(2)
    with RosbagWriter(str(p)) as w:
        for i in range(3):
            # 4 fisheye views of 64x80 assembled horizontally
            img = rng.randint(0, 256, (64, 4 * 80), np.uint8)
            w.write_image("/oak_ffc_4p/assemble_image", 1.0 + i * 0.1, img)
    calib = {
        "cams": [dict(fx=40.0, fy=40.0, cx=40.0, cy=32.0, k2=0.01)] * 4,
        "baseline": 0.3,
        "out_hw": [48, 64],
    }
    out = tmp_path / "stereo.bag"
    n = generate_stereo_bag(str(p), str(out), calib, step=1)
    assert n == 3 * 4  # 4 virtual pairs per frame
    r = RosbagReader(str(out))
    topics = r.topics
    for k in range(4):
        assert topics[f"/virtual_stereo_{k}/left"] == "sensor_msgs/Image"
        assert topics[f"/virtual_stereo_{k}/right"] == "sensor_msgs/Image"
    msgs = [m for _, _, m in r.read_messages(["/virtual_stereo_0/left"])]
    assert len(msgs) == 3 and msgs[0]["image"].shape == (48, 64)
    # photometric alignment: left/right means match closely
    lefts = [m for _, _, m in r.read_messages(["/virtual_stereo_1/left"])]
    rights = [m for _, _, m in r.read_messages(["/virtual_stereo_1/right"])]
    ml = lefts[0]["image"].mean()
    mr = rights[0]["image"].mean()
    assert abs(ml - mr) < 0.05 * ml


def test_sync_drops_pre_anchor_messages(tmp_path):
    from d2slam_tpu.tools.bag_tools import shift_bag

    p = tmp_path / "warmup.bag"
    with RosbagWriter(str(p)) as w:
        # IMU starts 3 s before the first camera frame
        for i in range(400):
            w.write_imu("/imu", 100.0 + i * 0.01, [0, 0, 9.8], [0, 0, 0])
        w.write_image("/cam/image", 103.0,
                      np.zeros((8, 8), np.uint8))
    outs = sync_bags([str(p)], out_dir=str(tmp_path), t_start=1.0)
    r = RosbagReader(outs[0][0])
    ts = [t for _, t, _ in r.read_messages(["/imu"], raw=True)]
    # pre-anchor prefix dropped, not collapsed onto t=0
    assert min(ts) >= 0.0
    diffs = np.diff(sorted(ts))
    assert diffs.min() > 0.005  # no zero-dt IMU intervals
    n_all, dropped = shift_bag(str(p), str(tmp_path / "x.bag"), -102.0)
    assert dropped == 200  # exactly the first 2 s of IMU


def test_split_passthrough_is_lossless(tmp_path):
    p = tmp_path / "quad.bag"
    rng = np.random.RandomState(3)
    with RosbagWriter(str(p)) as w:
        for i in range(4):
            w.write_raw("/gt", "geometry_msgs/PoseStamped", 5.0 + i,
                        b"\x00" * 12 + b"\x00\x00\x00\x00" + b"\x01" * 56)
        w.write_image("/arducam/image", 5.0,
                      rng.randint(0, 256, (8, 4 * 8), np.uint8))
    out = split_quadcam_bag(str(p), composite_topic="/arducam/image",
                            keep_topics=["/gt"])
    r = RosbagReader(out)
    msgs = [(t, d) for _, t, d in r.read_messages(["/gt"], raw=True)]
    assert len(msgs) == 4  # PoseStamped kept (previously silently dropped)
    assert msgs[0][1].endswith(b"\x01" * 56)  # byte-for-byte copy


def test_shift_path_inner_stamps(tmp_path):
    import struct

    from d2slam_tpu.tools.bag_tools import _shift_stamp

    def header(t, fid=b""):
        secs, nsecs = int(t), int((t - int(t)) * 1e9)
        return struct.pack("<III", 0, secs, nsecs) + \
            struct.pack("<I", len(fid)) + fid

    pose = b"\x00" * 56
    path_msg = header(100.0, b"map") + struct.pack("<I", 2) + \
        header(100.5) + pose + header(101.0) + pose
    out = _shift_stamp("nav_msgs/Path", path_msg, -99.0)
    s, ns = struct.unpack_from("<II", out, 4)
    assert s + ns * 1e-9 == 1.0
    # first inner PoseStamped: after outer header (16 + 3) + count (4)
    pos = 16 + 3 + 4
    s, ns = struct.unpack_from("<II", out, pos + 4)
    assert abs(s + ns * 1e-9 - 1.5) < 1e-6
    pos2 = pos + 16 + 0 + 56
    s, ns = struct.unpack_from("<II", out, pos2 + 4)
    assert abs(s + ns * 1e-9 - 2.0) < 1e-6


def test_generate_stereo_with_extrinsics(tmp_path):
    from d2slam_tpu.tools.bag_tools import generate_stereo_bag

    p = tmp_path / "quad.bag"
    rng = np.random.RandomState(4)
    with RosbagWriter(str(p)) as w:
        w.write_image("/cam/image", 1.0,
                      rng.randint(0, 256, (64, 4 * 80), np.uint8))
    # calibrated rig: slight deviations from the ideal square
    import jax.numpy as jnp

    from d2slam_tpu.geometry.lie import so3_exp
    from d2slam_tpu.utils import np_lie

    ext = []
    for i in range(4):
        yaw = np.deg2rad(90.0 * i + 1.5)
        R = np.asarray(so3_exp(jnp.asarray([0.0, yaw, 0.01])))
        ext.append(np.concatenate(
            [R @ [0.151, 0.002, 0.149], np_lie.rotmat_to_quat(R)]).tolist())
    calib = {
        "cams": [dict(fx=40.0, fy=40.0, cx=40.0, cy=32.0)] * 4,
        "extrinsics": ext,
        "out_hw": [32, 48],
    }
    out = tmp_path / "stereo.bag"
    n = generate_stereo_bag(str(p), str(out), calib)
    assert n == 4
    r = RosbagReader(str(out))
    m = [m for _, _, m in r.read_messages(["/virtual_stereo_2/right"])]
    assert m[0]["image"].shape == (32, 48)
