"""LoopNet broadcast protocol (greedy vs lazy modes, nearby override)
and map-merge pose shifting (moveAllPoses equivalent)."""
from collections import deque

import numpy as np

from d2slam_tpu.comm.codec import RemoteKeyframePacket
from d2slam_tpu.comm.loopnet import (
    CH_KF_REQUEST,
    LoopNet,
    header_only,
    nearby_drones_from_pgo,
)
from d2slam_tpu.comm.transport import CH_VIOKF_HEADER, CH_VIOKF_LANDMARKS


class Hub:
    """In-memory multicast bus standing in for the UDP transport."""

    def __init__(self):
        self.ends = {}

    def endpoint(self, self_id):
        ep = _Endpoint(self, self_id)
        self.ends[self_id] = ep
        return ep


class _Endpoint:
    def __init__(self, hub, self_id):
        self.hub = hub
        self.self_id = self_id
        self.q = deque()

    def send(self, channel, data):
        for ep in self.hub.ends.values():
            ep.q.append((channel, self.self_id, bytes(data)))

    def recv(self, timeout_ms=0):
        return self.q.popleft() if self.q else None


def make_pkt(drone_id=1, frame_id=7, n=20):
    rng = np.random.default_rng(0)
    rays = rng.normal(size=(n, 3))
    rays /= np.linalg.norm(rays, axis=1, keepdims=True)
    return RemoteKeyframePacket(
        drone_id=drone_id, frame_id=frame_id, stamp=1.5, is_keyframe=True,
        pose=np.array([1, 2, 3, 0, 0, 0, 1], np.float32),
        gdesc=rng.normal(size=64).astype(np.float32),
        lm_ids=np.arange(n, dtype=np.int64),
        lm_cam=np.zeros(n, np.uint8),
        lm_rays=rays.astype(np.float32),
        lm_vels=np.zeros((n, 3), np.float32),
        lm_desc=rng.normal(size=(n, 32)).astype(np.float32),
    )


def test_greedy_mode_full_frame():
    hub = Hub()
    a = LoopNet(hub.endpoint(1), 1, lazy=False)
    b = LoopNet(hub.endpoint(2), 2, lazy=False)
    got = []
    b.on_keyframe = got.append
    a.broadcast_keyframe(make_pkt())
    b.poll(now=0.0)
    assert len(got) == 1 and len(got[0].lm_ids) == 20


def test_lazy_mode_pull_on_gate():
    hub = Hub()
    a = LoopNet(hub.endpoint(1), 1, lazy=True)
    b = LoopNet(hub.endpoint(2), 2, lazy=True)
    got = []
    b.on_keyframe = got.append
    b.want_full = lambda hdr: True  # place-recognition gate fires

    a.broadcast_keyframe(make_pkt())
    b.poll(now=0.0)        # header -> request
    assert not got
    # duplicate request suppressed while the first is outstanding
    b.request_frame(1, 7, now=0.1)
    assert sum(1 for (ch, _, _) in list(a.transport.q)
               if ch == CH_KF_REQUEST) == 1
    a.poll(now=0.0)        # request -> serve full
    b.poll(now=0.1)        # full frame arrives
    assert len(got) == 1 and len(got[0].lm_ids) == 20


def test_lazy_mode_header_passthrough_when_gate_off():
    hub = Hub()
    a = LoopNet(hub.endpoint(1), 1, lazy=True)
    b = LoopNet(hub.endpoint(2), 2, lazy=True)
    got = []
    b.on_keyframe = got.append
    b.want_full = lambda hdr: False
    a.broadcast_keyframe(make_pkt())
    b.poll(now=0.0)
    # header still delivered (pose/window status usable), no landmarks
    assert len(got) == 1 and len(got[0].lm_ids) == 0


def test_lazy_nearby_override_sends_full():
    hub = Hub()
    a = LoopNet(hub.endpoint(1), 1, lazy=True)
    b = LoopNet(hub.endpoint(2), 2, lazy=True)
    got = []
    b.on_keyframe = got.append
    a.broadcast_keyframe(make_pkt(), nearby_drones={2})
    b.poll(now=0.0)
    assert len(got) == 1 and len(got[0].lm_ids) == 20


def test_nearby_from_pgo_gates_distance_and_age():
    near = nearby_drones_from_pgo(
        np.zeros(3),
        {2: (np.array([1.0, 0, 0]), 9.0),     # near + fresh
         3: (np.array([50.0, 0, 0]), 9.0),    # far
         4: (np.array([1.0, 1, 0]), 0.0)},    # near but stale
        now=10.0, distance=5.0, max_age=5.0,
    )
    assert near == {2}


def test_header_only_strips_payload():
    h = header_only(make_pkt())
    assert len(h.lm_ids) == 0 and len(h.imu_t) == 0
    assert h.gdesc.shape == (64,)


def test_move_all_poses_map_merge():
    """Reference moveAllPoses: a yaw+translation gauge shift applied to
    the whole window (incl. the dense prior) must leave the estimator
    consistent — subsequent solves track the shifted trajectory."""
    from d2slam_tpu.utils import np_lie
    from tests.test_estimator import run_sequence

    est, errs, sim = run_sequence(n_frames=12)
    yaw = np.deg2rad(30.0)
    T = np.array([1.0, -2.0, 0.5, 0, 0, np.sin(yaw / 2), np.cos(yaw / 2)])
    poses_before = np.asarray(est.state.poses).copy()
    n = len(est.frames)
    est.move_all_poses(T)
    poses_after = np.asarray(est.state.poses)
    for w in range(n):
        expect = np_lie.pose_compose(T, poses_before[w])
        d = np.linalg.norm(poses_after[w][:3] - expect[:3])
        assert d < 1e-9, f"slot {w} moved wrong ({d})"

    # continue the sequence: the estimator must stay on the shifted GT
    t_prev = 11 / sim.frame_hz
    for k in range(12, 18):
        t = k / sim.frame_hz
        for (ts, a, g) in sim.imu_samples(t_prev + 1e-6, t + 1e-6):
            est.input_imu(ts, a, g)
        t_prev = t
        odom = est.input_frame(sim.frame(k))
    # errs[0] gives the original gauge: est0 = G * gt0
    est0, gt0 = errs[0][0], errs[0][1]
    G = np_lie.pose_compose(est0.astype(np.float64),
                            np_lie.pose_inverse(gt0.astype(np.float64)))
    gt_pose, _ = sim.gt_pose(t)
    expect = np_lie.pose_compose(T, np_lie.pose_compose(G, gt_pose))
    err = np.linalg.norm(odom.pose[:3] - expect[:3])
    assert err < 0.05, f"post-merge drift {err}"


def test_png_roundtrip():
    from d2slam_tpu.utils.pngio import png_decode_gray, png_encode_gray

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (48, 64), dtype=np.uint8)
    assert np.array_equal(png_decode_gray(png_encode_gray(img)), img)
    # float input in [0, 1] quantizes to u8
    f = rng.uniform(0, 1, (8, 8))
    dec = png_decode_gray(png_encode_gray(f))
    assert dec.shape == (8, 8)
    assert np.abs(dec.astype(np.float64) / 255.0 - f).max() < 1.0 / 255.0


def test_send_img_attachments():
    """send_img peers receive every view PNG-compressed on the image
    channel (reference send_img -> VIOKF_IMG_ARRAY)."""
    hub = Hub()
    a = LoopNet(hub.endpoint(1), 1, lazy=False, send_img=True)
    b = LoopNet(hub.endpoint(2), 2, lazy=False)
    got_imgs, got_kf = [], []
    b.on_image = got_imgs.append
    b.on_keyframe = got_kf.append
    rng = np.random.default_rng(4)
    views = [rng.integers(0, 256, (24, 32), dtype=np.uint8)
             for _ in range(2)]
    a.broadcast_keyframe(make_pkt(frame_id=9), images=views)
    b.poll(now=0.0)
    assert len(got_kf) == 1 and len(got_imgs) == 2
    for v, (did, fid, view, n_views, im) in enumerate(got_imgs):
        assert (did, fid, n_views) == (1, 9, 2) and view == v
        assert np.array_equal(im, views[v])


def test_send_img_off_by_default():
    hub = Hub()
    a = LoopNet(hub.endpoint(1), 1)
    b = LoopNet(hub.endpoint(2), 2)
    got = []
    b.on_image = got.append
    a.broadcast_keyframe(make_pkt(), images=[np.zeros((8, 8), np.uint8)])
    b.poll(now=0.0)
    assert got == []
