"""Headless visualization suite (ROS-free D2Visualization equivalent)."""
import numpy as np

from d2slam_tpu.utils.visualization import (
    disparity_to_rgb,
    draw_feature_tracks,
    draw_matches,
    plot_pose_graph,
    plot_sliding_window,
    plot_trajectories,
)


def _traj(n, phase=0.0):
    t = np.linspace(0, 2 * np.pi, n)
    p = np.stack([np.cos(t + phase), np.sin(t + phase), 0.1 * t], 1)
    q = np.tile([0.0, 0, 0, 1], (n, 1))
    return np.concatenate([p, q], axis=1)


def test_trajectory_and_graph_plots(tmp_path):
    trajs = {0: _traj(40), 1: _traj(40, 0.8)}
    gt = {0: _traj(40), 1: _traj(40, 0.8)}
    loops = [(0, 5, 1, 7), (0, 30, 1, 31)]
    f1 = tmp_path / "traj.png"
    plot_trajectories(trajs, gt, str(f1), loops=loops)
    assert f1.exists() and f1.stat().st_size > 5000
    f2 = tmp_path / "graph.png"
    plot_pose_graph(trajs, loop_edges=loops, path=str(f2))
    assert f2.exists() and f2.stat().st_size > 5000


def test_sliding_window_plot(tmp_path):
    poses = _traj(11)
    lms = np.random.RandomState(0).randn(64, 3) * 3
    valid = np.arange(64) % 2 == 0
    f = tmp_path / "win.png"
    plot_sliding_window(poses, lms, valid, str(f))
    assert f.exists() and f.stat().st_size > 5000


def test_track_and_match_overlays():
    rng = np.random.RandomState(1)
    img = rng.rand(120, 160)
    kp = rng.rand(30, 2) * [150, 110] + 5
    kc = kp + rng.randn(30, 2) * 3
    mask = np.ones(30, bool)
    mask[::3] = False
    rgb = draw_feature_tracks(img, kp, kc, mask)
    assert rgb.shape == (120, 160, 3) and rgb.dtype == np.uint8
    # green discs present at tracked keypoints
    greens = (rgb[..., 1] > 200) & (rgb[..., 0] < 50)
    assert greens.sum() >= mask.sum()

    img2 = rng.rand(120, 160)
    canvas = draw_matches(img, img2, kp, kc, mask)
    assert canvas.shape == (120, 320, 3)


def test_disparity_colormap():
    d = np.linspace(0, 32, 64).reshape(8, 8)
    rgb = disparity_to_rgb(d, 32.0)
    assert rgb.shape == (8, 8, 3) and rgb.dtype == np.uint8
    assert not np.array_equal(rgb[0, 0], rgb[-1, -1])
