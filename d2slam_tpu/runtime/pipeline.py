"""Frame pipeline runtime: native bounded queues, PNG decode, ordered
image prefetch, and a threaded stage executor.

TPU-native counterpart of the reference's node runtime — the bounded
image queue that drops frames under load (reference:
d2frontend/src/d2frontend.cpp:70-153, drop when backlogged :81-84) and
the thread pipeline camera-cb -> CNN/tracker thread -> estimator thread
(d2frontend.cpp:155-198, d2vins/src/d2vins_node.cpp:128-303). Queues,
PNG decoding, and prefetch ordering live in C++
(runtime/native/pipeline.cpp, compiled on demand, ctypes-bound — no
pybind11 in this environment); stage bodies are Python callables (JAX
releases the GIL during device compute, so stages overlap for real).
"""
from __future__ import annotations

import ctypes
import os
import pickle
import subprocess
import threading
import time
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

_LIB = None


def _load_lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(__file__)
    src = os.path.join(here, "native", "pipeline.cpp")
    so = os.path.join(here, "native", "libpipeline.so")
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", "-o", so, src,
             "-lz", "-lpthread"],
            check=True,
        )
    lib = ctypes.CDLL(so)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.fq_create.restype = ctypes.c_void_p
    lib.fq_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.fq_destroy.argtypes = [ctypes.c_void_p]
    lib.fq_close.argtypes = [ctypes.c_void_p]
    lib.fq_push.restype = ctypes.c_int
    lib.fq_push.argtypes = [ctypes.c_void_p, u8p, ctypes.c_uint32,
                            ctypes.c_int]
    lib.fq_pop.restype = ctypes.c_int
    lib.fq_pop.argtypes = [ctypes.c_void_p, u8p, ctypes.c_uint32,
                           ctypes.c_int, u32p]
    lib.fq_size.restype = ctypes.c_int
    lib.fq_size.argtypes = [ctypes.c_void_p]
    lib.fq_stats.argtypes = [ctypes.c_void_p, u64p, u64p, u64p]
    lib.png_decode.restype = ctypes.c_int
    lib.png_decode.argtypes = [u8p, ctypes.c_uint32, u8p, ctypes.c_uint32,
                               u32p, u32p, u32p, u32p, u32p]
    lib.prefetch_create.restype = ctypes.c_void_p
    lib.prefetch_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                    ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.prefetch_next.restype = ctypes.c_int
    lib.prefetch_next.argtypes = [ctypes.c_void_p, u8p, ctypes.c_uint32,
                                  u32p, u32p, u32p, u32p, ctypes.c_int, u32p]
    lib.prefetch_destroy.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


class FrameQueue:
    """Bounded byte queue (C++). drop_oldest=True reproduces the
    reference's frame-drop-under-load policy with a dropped counter."""

    def __init__(self, capacity: int = 2, drop_oldest: bool = True):
        self._lib = _load_lib()
        self._h = self._lib.fq_create(capacity, int(drop_oldest))

    def push(self, data: bytes, block_ms: int = 0) -> int:
        buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
        return self._lib.fq_push(self._h, buf, len(data), block_ms)

    def push_obj(self, obj, block_ms: int = 0) -> int:
        return self.push(pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL),
                         block_ms)

    def pop(self, timeout_ms: int = 100) -> Optional[bytes]:
        cap = 1 << 16
        while True:
            buf = (ctypes.c_uint8 * cap)()
            need = ctypes.c_uint32(0)
            rc = self._lib.fq_pop(self._h, buf, cap, timeout_ms,
                                  ctypes.byref(need))
            if rc == -3:
                cap = max(need.value, cap * 2)
                continue
            if rc < 0:
                return None
            return bytes(bytearray(buf[:rc]))

    def pop_obj(self, timeout_ms: int = 100):
        b = self.pop(timeout_ms)
        return None if b is None else pickle.loads(b)

    def close(self) -> None:
        self._lib.fq_close(self._h)

    def __len__(self) -> int:
        return self._lib.fq_size(self._h)

    @property
    def stats(self) -> Dict[str, int]:
        p = ctypes.c_uint64(0)
        o = ctypes.c_uint64(0)
        d = ctypes.c_uint64(0)
        self._lib.fq_stats(self._h, ctypes.byref(p), ctypes.byref(o),
                           ctypes.byref(d))
        return {"pushed": p.value, "popped": o.value, "dropped": d.value}

    def __del__(self):
        try:
            self._lib.fq_destroy(self._h)
        except Exception:
            pass


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes with the native decoder. Returns [H, W] (gray)
    or [H, W, C]; dtype uint8 or uint16."""
    lib = _load_lib()
    src = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    w = ctypes.c_uint32(0)
    h = ctypes.c_uint32(0)
    ch = ctypes.c_uint32(0)
    depth = ctypes.c_uint32(0)
    need = ctypes.c_uint32(0)
    rc = lib.png_decode(src, len(data), None, 0, ctypes.byref(w),
                        ctypes.byref(h), ctypes.byref(ch),
                        ctypes.byref(depth), ctypes.byref(need))
    if rc != -3:
        raise ValueError(f"png_decode failed ({rc})")
    out = np.empty(need.value, np.uint8)
    rc = lib.png_decode(
        src, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        need.value, ctypes.byref(w), ctypes.byref(h), ctypes.byref(ch),
        ctypes.byref(depth), ctypes.byref(need))
    if rc != 0:
        raise ValueError(f"png_decode failed ({rc})")
    arr = out.view(np.uint16 if depth.value == 16 else np.uint8)
    arr = arr.reshape(h.value, w.value, ch.value)
    return arr[..., 0] if ch.value == 1 else arr


class ImagePrefetcher:
    """Ordered multi-threaded PNG loader (C++ worker threads decode
    ahead; images come out strictly in path order)."""

    def __init__(self, paths: Sequence[str], n_threads: int = 2,
                 window: int = 4):
        self._lib = _load_lib()
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._h = self._lib.prefetch_create(arr, len(self._paths),
                                            n_threads, window)
        self._n = len(paths)

    def __iter__(self):
        cap = 1 << 20
        buf = np.empty(cap, np.uint8)
        emitted = 0
        while emitted < self._n:
            w = ctypes.c_uint32(0)
            h = ctypes.c_uint32(0)
            ch = ctypes.c_uint32(0)
            depth = ctypes.c_uint32(0)
            need = ctypes.c_uint32(0)
            rc = self._lib.prefetch_next(
                self._h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                cap, ctypes.byref(w), ctypes.byref(h), ctypes.byref(ch),
                ctypes.byref(depth), 10000, ctypes.byref(need))
            if rc == -3:
                cap = max(need.value, cap * 2)
                buf = np.empty(cap, np.uint8)
                continue
            if rc == -2:
                return
            if rc == -4:
                yield None  # decode error for this index
                emitted += 1
                continue
            if rc < 0:
                raise TimeoutError("prefetch_next timed out")
            arr = buf[:rc].copy().view(
                np.uint16 if depth.value == 16 else np.uint8)
            arr = arr.reshape(h.value, w.value, ch.value)
            yield arr[..., 0] if ch.value == 1 else arr
            emitted += 1

    def __del__(self):
        try:
            self._lib.prefetch_destroy(self._h)
        except Exception:
            pass


class StageStats:
    """Rolling per-stage rate/latency (the reference's rolling averages,
    e.g. loop_cam.cpp:236-239)."""

    def __init__(self):
        self.count = 0
        self.total_s = 0.0
        self.last_s = 0.0

    def add(self, dt: float):
        self.count += 1
        self.total_s += dt
        self.last_s = dt

    @property
    def mean_ms(self) -> float:
        return self.total_s / max(self.count, 1) * 1e3


class FramePipeline:
    """Threaded stage executor: stage i pops from queue i, runs fn,
    pushes the result to queue i+1. Queue 0 is the ingress (camera
    callback side); the final stage's returns are collected in order.

    stages: [(name, fn, queue_capacity, drop_oldest)]. A stage fn
    returning None drops the item (not forwarded).
    """

    def __init__(self, stages: List[Tuple[str, Callable, int, bool]]):
        self.names = [s[0] for s in stages]
        self.fns = [s[1] for s in stages]
        self.queues = [FrameQueue(s[2], s[3]) for s in stages]
        self.out: List = []
        self.stats = {s[0]: StageStats() for s in stages}
        self._threads: List[threading.Thread] = []
        self._out_lock = threading.Lock()
        # items popped from queue i whose result has been forwarded (or
        # dropped); queue i's "popped" stat minus this = exactly the
        # in-flight count, with no pop-to-flag race (the C++ pop
        # increments "popped" atomically with removing the item)
        self._done = [0] * len(stages)

    def submit(self, item) -> int:
        """Ingress push (returns 1 if an old frame was dropped)."""
        return self.queues[0].push_obj(item)

    def _in_flight(self, i: int) -> int:
        return self.queues[i].stats["popped"] - self._done[i]

    def _upstream_done(self, i: int) -> bool:
        """No work can still reach stage i's queue."""
        return all(
            len(self.queues[k]) == 0 and self._in_flight(k) == 0
            for k in range(i)
        )

    def _worker(self, i: int):
        while True:
            item = self.queues[i].pop_obj(timeout_ms=200)
            if item is None:
                if (self._closing and len(self.queues[i]) == 0
                        and self._upstream_done(i)):
                    return
                continue
            t0 = time.perf_counter()
            try:
                res = self.fns[i](item)
            except Exception as e:  # stage failure drops the frame
                res = None
                self._errors.append((self.names[i], repr(e)))
            self.stats[self.names[i]].add(time.perf_counter() - t0)
            if res is not None:
                if i + 1 < len(self.queues):
                    self.queues[i + 1].push_obj(res, block_ms=1000)
                else:
                    with self._out_lock:
                        self.out.append(res)
            self._done[i] += 1

    def start(self):
        self._closing = False
        self._errors: List = []
        for i in range(len(self.fns)):
            t = threading.Thread(target=self._worker, args=(i,), daemon=True)
            t.start()
            self._threads.append(t)
        return self

    def drain(self, timeout_s: float = 30.0):
        """Wait until all queued AND in-flight work is processed, then
        stop workers. In-flight = a stage fn currently executing (its
        result hasn't been forwarded yet), tracked per stage so a slow
        stage (e.g. a first-call JAX compile) can't lose its output."""
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            if (all(len(q) == 0 for q in self.queues)
                    and all(self._in_flight(i) == 0
                            for i in range(len(self.fns)))):
                break
            time.sleep(0.01)
        self._closing = True
        for t in self._threads:
            t.join(timeout=timeout_s)
        self._threads.clear()
        return self.out

    @property
    def dropped(self) -> Dict[str, int]:
        return {n: q.stats["dropped"]
                for n, q in zip(self.names, self.queues)}
