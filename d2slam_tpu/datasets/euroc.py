"""EuRoC-ASL format dataset reader (EuRoC MAV, TUM-VI, and compatible).

Rosbag-free ingestion of the directory layout used by the reference's
evaluation datasets (TUM-VI room / EuRoC; the reference replays rosbags
through ROS, SURVEY.md §4 — here we read the ASL folder structure
directly):

    <root>/mav0/imu0/data.csv              t[ns], wx, wy, wz, ax, ay, az
    <root>/mav0/cam0/data.csv              t[ns], filename
    <root>/mav0/cam0/data/<filename>       grayscale images
    <root>/mav0/cam0/sensor.yaml           intrinsics + T_BS (optional)
    <root>/mav0/state_groundtruth_estimate0/data.csv   (optional)

``play()`` merges IMU and frames into one time-ordered event stream —
exactly what the estimator node's callbacks consume.
"""
from __future__ import annotations

import csv
import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np


class EuRoCDataset:
    def __init__(self, root: str, cams: Tuple[str, ...] = ("cam0", "cam1")):
        self.root = root
        mav = os.path.join(root, "mav0")
        self.cams = [c for c in cams
                     if os.path.exists(os.path.join(mav, c, "data.csv"))]
        self.imu = self._read_imu(os.path.join(mav, "imu0", "data.csv"))
        self.frames: List[Tuple[float, List[str]]] = self._read_frames(mav)
        self.ground_truth = self._read_gt(
            os.path.join(mav, "state_groundtruth_estimate0", "data.csv")
        )
        self.calib = {c: self._read_sensor_yaml(
            os.path.join(mav, c, "sensor.yaml")) for c in self.cams}

    @staticmethod
    def _read_imu(path):
        if not os.path.exists(path):
            return np.zeros((0, 7))
        rows = []
        with open(path) as f:
            for row in csv.reader(f):
                if not row or row[0].startswith("#"):
                    continue
                rows.append([float(x) for x in row[:7]])
        arr = np.asarray(rows)
        if len(arr):
            arr[:, 0] *= 1e-9  # ns -> s
        return arr  # [N, 7]: t, wx, wy, wz, ax, ay, az

    def _read_frames(self, mav):
        per_cam: Dict[str, Dict[int, str]] = {}
        for c in self.cams:
            per_cam[c] = {}
            with open(os.path.join(mav, c, "data.csv")) as f:
                for row in csv.reader(f):
                    if not row or row[0].startswith("#"):
                        continue
                    t_ns = int(row[0])
                    per_cam[c][t_ns] = os.path.join(
                        mav, c, "data", row[1].strip()
                    )
        if not self.cams:
            return []
        # frames synchronized on cam0 timestamps; other cams matched
        # within 1 ms (approx-time sync like the reference's
        # message_filters, d2frontend.cpp:354-389)
        base = sorted(per_cam[self.cams[0]].items())
        out = []
        for t_ns, path0 in base:
            paths = [path0]
            ok = True
            for c in self.cams[1:]:
                cand = min(per_cam[c].keys(),
                           key=lambda k: abs(k - t_ns), default=None)
                if cand is None or abs(cand - t_ns) > 1_000_000:
                    ok = False
                    break
                paths.append(per_cam[c][cand])
            if ok:
                out.append((t_ns * 1e-9, paths))
        return out

    @staticmethod
    def _read_gt(path):
        if not os.path.exists(path):
            return None
        rows = []
        with open(path) as f:
            for row in csv.reader(f):
                if not row or row[0].startswith("#"):
                    continue
                vals = [float(x) for x in row[:8]]
                rows.append(vals)
        arr = np.asarray(rows)
        if not len(arr):
            return None
        arr[:, 0] *= 1e-9
        # EuRoC order: t, px, py, pz, qw, qx, qy, qz -> our xyzw
        out = np.zeros((len(arr), 8))
        out[:, 0] = arr[:, 0]
        out[:, 1:4] = arr[:, 1:4]
        out[:, 4:7] = arr[:, 5:8]
        out[:, 7] = arr[:, 4]
        return out  # [N, 8]: t, p(3), q_xyzw(4)

    @staticmethod
    def _read_sensor_yaml(path) -> Optional[dict]:
        if not os.path.exists(path):
            return None
        try:
            import yaml

            with open(path) as f:
                return yaml.safe_load(f)
        except Exception:
            return None

    # ------------------------------------------------------------------

    def load_image(self, path: str) -> np.ndarray:
        from PIL import Image

        img = np.asarray(Image.open(path).convert("L"), np.float32) / 255.0
        return img

    def play(self, frame_stride: int = 1,
             prefetch: bool = False, prefetch_threads: int = 2,
             ) -> Iterator[tuple]:
        """Yield ('imu', t, acc, gyr) and ('frame', t, [images]) events
        in time order (acc/gyro in EuRoC convention: gyro then acc in
        the csv; we emit acc first).

        prefetch=True decodes PNGs ahead of time with the native C++
        loader (runtime.ImagePrefetcher) — the reference's threaded
        image ingestion (d2frontend.cpp raw-image callbacks feeding the
        processing thread)."""
        imu_idx = 0
        n_imu = len(self.imu)
        kept = [(t, paths) for k, (t, paths) in enumerate(self.frames)
                if k % frame_stride == 0]
        if prefetch:
            from d2slam_tpu.runtime import ImagePrefetcher

            flat = [p for _, paths in kept for p in paths]
            fetch = iter(ImagePrefetcher(flat, n_threads=prefetch_threads))

            def images_for(paths):
                out = []
                for p in paths:
                    a = next(fetch)
                    if (a is None or a.ndim != 2
                            or a.dtype != np.uint8):
                        # decoder error / 16-bit / RGB: use the PIL path
                        # so prefetch=True matches load_image exactly
                        out.append(self.load_image(p))
                    else:
                        out.append(np.asarray(a, np.float32) / 255.0)
                return out
        else:
            def images_for(paths):
                return [self.load_image(p) for p in paths]

        for (t, paths) in kept:
            while imu_idx < n_imu and self.imu[imu_idx, 0] <= t:
                row = self.imu[imu_idx]
                yield ("imu", row[0], row[4:7], row[1:4])
                imu_idx += 1
            yield ("frame", t, images_for(paths))
        while imu_idx < n_imu:
            row = self.imu[imu_idx]
            yield ("imu", row[0], row[4:7], row[1:4])
            imu_idx += 1

    def gt_pose_at(self, t: float) -> Optional[np.ndarray]:
        if self.ground_truth is None:
            return None
        i = int(np.searchsorted(self.ground_truth[:, 0], t))
        i = min(max(i, 0), len(self.ground_truth) - 1)
        return self.ground_truth[i, 1:8]
