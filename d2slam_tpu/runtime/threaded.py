"""Threaded frontend/backend pipeline around a D2SLAMSystem.

The reference runs the camera callback, the CNN+tracking thread
(processStereoFrameThread, 20 Hz) and the estimator thread
(processVIOKFThread) concurrently (reference:
d2frontend/src/d2frontend.cpp:155-198, d2vins/src/d2vins_node.cpp:
128-303, bounded queue that drops frames when >2 pending,
d2frontend.cpp:81-84). This wrapper reproduces that split:

  caller thread:  input_imu / input_stereo -> tracker (extraction +
                  association) -> keyframe queue
  backend thread: estimator solve + loop detection + PGO + broadcast

On an accelerator behind a high-latency link the two stages each cost
one packed round trip (fused extraction+NetVLAD, fused solve+marg);
overlapping them measured 1.45-1.77x serial keyframe throughput on a
~25-70 ms RTT tunnel (bench.py round 4: 2.2-2.6 kf/s serial -> 3.8-3.9
pipelined). The residual serializer is the GIL-held host association
(~200 ms/frame of numpy bookkeeping shared by both stages). On a local
chip it simply hides host association behind the solve, like the
reference's threads do.
"""
from __future__ import annotations

import queue
import threading
from typing import List, Optional

import numpy as np


class PipelinedSystem:
    """Wrap a D2SLAMSystem with the reference's two-thread pipeline.

    ``depth``: keyframe queue bound. With ``drop_oldest`` (the
    reference's behavior under load) the newest keyframe replaces the
    oldest queued one when the backend falls behind; otherwise the
    caller blocks (deterministic replay)."""

    def __init__(self, system, depth: int = 2, drop_oldest: bool = False):
        self.sys = system
        self.drop_oldest = drop_oldest
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._processed = 0
        self._submitted = 0
        self._lock = threading.Lock()
        self._stop = False
        # 1-frame extraction lookahead: frame k+1's upload+CNN flies
        # (PackedAccelFn.submit) while frame k's host association runs
        # on this thread — the reference's decoupled CNN stream
        self._pending_fe = None  # (stamp, imgL, imgR, resolver)
        self._thread = threading.Thread(target=self._backend, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------

    def input_imu(self, t: float, acc, gyr) -> None:
        # IMUBuffer.add is append-only; the backend reads completed
        # ranges — safe under the GIL for this producer/consumer pair
        self.sys.estimator.input_imu(t, acc, gyr)

    def input_stereo(self, t: float, img_left, img_right) -> None:
        """Frontend stage on the CALLER thread (reference camera-cb +
        CNN thread): extraction + association; keyframes queue for the
        backend. With the submit-capable tracker, this frame's
        extraction is dispatched immediately and the PREVIOUS frame is
        associated while it flies (one frame of extra latency, same
        ordering/keyframe decisions as serial)."""
        self._check()
        submit = getattr(self.sys.tracker, "submit_stereo_extraction",
                         None)
        resolver = submit(img_left, img_right) if submit else None
        if resolver is None:
            self._frontend(t, img_left, img_right, None)
            return
        prev, self._pending_fe = self._pending_fe, (
            t, np.asarray(img_left), np.asarray(img_right), resolver)
        if prev is not None:
            self._frontend(*prev)

    def _flush_pending(self) -> None:
        prev, self._pending_fe = self._pending_fe, None
        if prev is not None:
            self._frontend(*prev)

    def _frontend(self, t, img_left, img_right, resolver) -> None:
        if resolver is None:  # plain path (also: duck-typed trackers)
            ff = self.sys.tracker.process_stereo(
                t, self.sys._frame_id, img_left, img_right
            )
        else:
            ff = self.sys.tracker.process_stereo(
                t, self.sys._frame_id, img_left, img_right,
                extracted=resolver,
            )
        self.sys._frame_id += 1
        if ff is None:
            return
        item = (ff, [np.asarray(img_left), np.asarray(img_right)])
        if self.drop_oldest:
            while True:
                try:
                    self._q.put_nowait(item)
                    break
                except queue.Full:  # drop the oldest queued keyframe
                    try:
                        self._q.get_nowait()
                        self._q.task_done()
                        # the dropped item will never reach the backend
                        # — uncount it so drain()'s processed>=submitted
                        # invariant stays satisfiable
                        with self._lock:
                            self._submitted -= 1
                    except queue.Empty:
                        pass
        else:
            self._q.put(item)
        with self._lock:
            self._submitted += 1

    def drain(self, timeout: float = 600.0) -> None:
        """Block until every queued keyframe has been processed (the
        lookahead frame is associated first so nothing stays in
        flight)."""
        import time

        self._flush_pending()
        t0 = time.time()
        while time.time() - t0 < timeout:
            self._check()
            with self._lock:
                if self._processed >= self._submitted:
                    return
            threading.Event().wait(0.005)
        raise TimeoutError("pipeline drain timed out")

    def close(self) -> None:
        self._flush_pending()
        self._stop = True
        self._q.put(None)
        self._thread.join(timeout=30)
        self._check()

    # ------------------------------------------------------------------

    @property
    def odometry(self):
        return self.sys.odometry

    def _check(self) -> None:
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def _backend(self) -> None:
        while not self._stop:
            item = self._q.get()
            if item is None:
                break
            ff, imgs = item
            try:
                od = self.sys.estimator.input_frame(ff)
                if od is not None:
                    self.sys.odometry = od
                    self.sys._register_keyframe(ff, od, imgs)
            except BaseException as e:  # surface on the caller thread
                self._err = e
            finally:
                with self._lock:
                    self._processed += 1
                self._q.task_done()
