"""ctypes bindings for the native UDP multicast transport.

Compiles ``native/udp_transport.cpp`` with g++ on first use (cached in
the package dir). Channel ids mirror the reference's LCM channels
(reference: loop_net.cpp:10-22, d2vins_net.cpp:8-27, d2comm.cpp:14-23).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

# channel ids (reference LCM channel names)
CH_VIOKF_HEADER = 1      # "VIOKF_HEADER"
CH_VIOKF_LANDMARKS = 2   # "VIOKF_LANDMARKS"
CH_SWARM_LOOP = 3        # "SWARM_LOOP_CONN"
CH_DISTRIB_VINS = 4      # "DISTRIB_VINS_DATA"
CH_SYNC_SIGNAL = 5       # "SYNC_SIGNAL"
CH_SYNC_SLDWIN = 6       # "SYNC_SLDWIN"
CH_PGO_DATA = 7          # "PGO_Sync_Data"
CH_VIOKF_IMG = 9         # "VIOKF_IMG_ARRAY" (optional send_img attachments)

_LIB = None


def _load_lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(__file__)
    src = os.path.join(here, "native", "udp_transport.cpp")
    so = os.path.join(here, "native", "libudp_transport.so")
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", "-o", so, src],
            check=True,
        )
    lib = ctypes.CDLL(so)
    lib.udp_transport_create.restype = ctypes.c_void_p
    lib.udp_transport_create.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_uint16, ctypes.c_int
    ]
    lib.udp_transport_destroy.argtypes = [ctypes.c_void_p]
    lib.udp_transport_send.restype = ctypes.c_int
    lib.udp_transport_send.argtypes = [
        ctypes.c_void_p, ctypes.c_uint16,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint32,
    ]
    lib.udp_transport_recv.restype = ctypes.c_int
    lib.udp_transport_recv.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint32, ctypes.c_int,
    ]
    _LIB = lib
    return lib


class UDPMulticastTransport:
    """Swarm transport on the reference's multicast group
    (udpm://224.0.0.251:7667, reference d2vins/launch/tum.launch:27)."""

    def __init__(self, self_id: int, group: str = "224.0.0.251",
                 port: int = 7667, loopback: bool = True,
                 max_msg: int = 4 * 1024 * 1024):
        self._lib = _load_lib()
        self._h = self._lib.udp_transport_create(
            group.encode(), port, self_id, int(loopback)
        )
        if not self._h:
            raise OSError("failed to create UDP multicast transport")
        self._buf = (ctypes.c_uint8 * max_msg)()
        self._max = max_msg

    def send(self, channel: int, data: bytes) -> None:
        arr = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
        rc = self._lib.udp_transport_send(self._h, channel, arr, len(data))
        if rc != 0:
            raise OSError("udp send failed")

    def recv(self, timeout_ms: int = 0) -> Optional[Tuple[int, int, bytes]]:
        """Returns (channel, sender, payload) or None."""
        ch = ctypes.c_uint16(0)
        snd = ctypes.c_uint16(0)
        n = self._lib.udp_transport_recv(
            self._h, ctypes.byref(ch), ctypes.byref(snd),
            self._buf, self._max, timeout_ms,
        )
        if n <= 0:
            return None
        return int(ch.value), int(snd.value), bytes(self._buf[:n])

    def close(self) -> None:
        if self._h:
            self._lib.udp_transport_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# ---------------------------------------------------------------------------
# channel routing (one socket, many consumers)
# ---------------------------------------------------------------------------


class ChannelRouter:
    """Demultiplex one transport across several consumers by channel.

    The reference gives every module its own LCM subscription on one
    multicast socket (loop_net.cpp:10-22, d2vins_net.cpp:8-27,
    d2comm.cpp:14-23 all share udpm://224.0.0.251:7667); our raw
    transport exposes a single ``recv`` queue, so a consensus solver
    draining it would steal keyframe packets meant for the LoopNet and
    vice versa. ``route(channels)`` returns an endpoint whose ``recv``
    only yields those channels — messages for other routes are queued
    for their owners, never dropped.

    Single-threaded per robot (each robot's modules run on its own
    thread, like the reference's per-node LCM handler thread).
    """

    def __init__(self, transport):
        self.transport = transport
        self._routes: list = []

    def route(self, channels) -> "RoutedEndpoint":
        ep = RoutedEndpoint(self, frozenset(channels))
        self._routes.append(ep)
        return ep

    def _pump(self, timeout_ms: int) -> bool:
        msg = self.transport.recv(timeout_ms=timeout_ms)
        if msg is None:
            return False
        ch = msg[0]
        for ep in self._routes:
            if ch in ep.channels:
                ep._q.append(msg)
                return True
        return True  # consumed (no subscriber -> dropped, like LCM)

    def close(self) -> None:
        self.transport.close()


class RoutedEndpoint:
    def __init__(self, router: ChannelRouter, channels: frozenset):
        self._router = router
        self.channels = channels
        self._q: list = []

    def send(self, channel: int, data: bytes) -> None:
        self._router.transport.send(channel, data)

    def recv(self, timeout_ms: int = 0):
        import time as _time

        deadline = _time.monotonic() + timeout_ms / 1000.0
        while True:
            if self._q:
                return self._q.pop(0)
            remain_ms = int((deadline - _time.monotonic()) * 1000)
            if not self._router._pump(max(remain_ms, 0)) and remain_ms <= 0:
                return None

    def close(self) -> None:  # routes share the socket; owner closes it
        pass


# ---------------------------------------------------------------------------
# in-memory bus (single-process multi-robot harness)
# ---------------------------------------------------------------------------


class BufferedTransport:
    """Wrap a transport with a reader THREAD that drains the underlying
    socket continuously into an unbounded host queue.

    A slow consumer (e.g. a SERVER node stuck in its first solver
    compilation for tens of seconds) otherwise overflows the kernel
    socket buffer and silently drops keyframe packets — UDP multicast
    has no replay (the reference tolerates this as lossy-link behavior;
    a ground station ingesting the whole swarm should not)."""

    def __init__(self, inner, poll_ms: int = 50):
        import collections
        import threading

        self._inner = inner
        self._q = collections.deque()
        self._cv = threading.Condition()
        self._stop = False

        def _pump():
            while not self._stop:
                m = inner.recv(poll_ms)
                if m is not None:
                    with self._cv:
                        self._q.append(m)
                        self._cv.notify()

        self._thread = threading.Thread(target=_pump, daemon=True)
        self._thread.start()

    def send(self, channel: int, data: bytes) -> None:
        self._inner.send(channel, data)

    def recv(self, timeout_ms: int = 0):
        with self._cv:
            if not self._q and timeout_ms > 0:
                self._cv.wait(timeout_ms / 1000.0)
            return self._q.popleft() if self._q else None

    def close(self) -> None:
        self._stop = True
        self._thread.join(timeout=2.0)
        if hasattr(self._inner, "close"):
            self._inner.close()


class LocalBus:
    """In-memory multicast bus with the UDPMulticastTransport interface.

    The reference emulates a swarm by running one docker container per
    drone against real UDP multicast (README.md:199-215 sync_bag_player);
    for single-process simulation and tests this bus gives every robot
    an endpoint on a zero-copy Python queue with the same
    ``send/recv(timeout_ms)`` contract (self-messages are suppressed,
    as the UDP transport does). Optional per-link loss/delay make it a
    lossy-UAV-link fault injector (the reference's d2pgo_test simulated
    comm delay, d2pgo_test.cpp:36-75).
    """

    def __init__(self, drop_prob: float = 0.0, seed: int = 0):
        self.endpoints = {}
        self.drop_prob = drop_prob
        self._rng = np.random.default_rng(seed)

    def endpoint(self, self_id: int) -> "LocalEndpoint":
        ep = LocalEndpoint(self, self_id)
        self.endpoints[self_id] = ep
        return ep


class LocalEndpoint:
    def __init__(self, bus: LocalBus, self_id: int):
        self._bus = bus
        self.self_id = self_id
        self._q = []

    def send(self, channel: int, data: bytes) -> None:
        for sid, ep in self._bus.endpoints.items():
            if sid == self.self_id:
                continue  # self-msg suppression (loop_net.cpp behavior)
            if self._bus.drop_prob and \
                    self._bus._rng.random() < self._bus.drop_prob:
                continue
            ep._q.append((channel, self.self_id, bytes(data)))

    def recv(self, timeout_ms: int = 0):
        return self._q.pop(0) if self._q else None

    def close(self) -> None:
        self._bus.endpoints.pop(self.self_id, None)
