"""Swarm wire format: compact keyframe packets with int8 descriptors.

TPU-native equivalent of the reference's LCM message encoding
(reference: d2common/include/d2common/d2frontend_types.h:228-341 toLCM /
fromLCM — int8 descriptor quantization scaled by max/127, per-feature
renormalization on decode; d2frontend/src/loop_net.cpp:110-160 bounded
landmark packets). One packet carries the header (ids, stamp, ego pose,
int8 NetVLAD) plus all landmark records (id, camera, unit ray, int8
SuperPoint descriptor).

Layout (little-endian):
  magic u32 | version u16 | drone_id u16 | frame_id i64 | stamp f64 |
  is_keyframe u8 | n_lm u16 | gdesc_dim u16 | desc_dim u16 |
  pose f32[7] | gdesc_scale f32 | gdesc i8[gdesc_dim] |
  per-landmark: id i64 | cam u8 | ray f32[3] | vel f32[3] |
                scale f32 | desc i8[desc_dim]
"""
from __future__ import annotations

import struct
from typing import NamedTuple, Optional

import numpy as np

MAGIC = 0xD25A11A7
VERSION = 1
_HDR = struct.Struct("<IHHqdBHHH")


class RemoteKeyframePacket(NamedTuple):
    drone_id: int
    frame_id: int
    stamp: float
    is_keyframe: bool
    pose: np.ndarray        # [7] ego pose
    gdesc: np.ndarray       # [G] float32 (renormalized on decode)
    lm_ids: np.ndarray      # [N] int64
    lm_cam: np.ndarray      # [N] uint8
    lm_rays: np.ndarray     # [N, 3] float32
    lm_vels: np.ndarray     # [N, 3] float32
    lm_desc: np.ndarray     # [N, D] float32 (renormalized on decode)


def _quant(v: np.ndarray):
    scale = float(np.max(np.abs(v))) / 127.0 if v.size else 1.0
    scale = max(scale, 1e-12)
    q = np.clip(np.round(v / scale), -127, 127).astype(np.int8)
    return q, scale


def _dequant(q: np.ndarray, scale: float, renorm: bool):
    v = q.astype(np.float32) * scale
    if renorm:
        n = np.linalg.norm(v, axis=-1, keepdims=True)
        v = v / np.maximum(n, 1e-12)
    return v


def encode_keyframe(pkt: RemoteKeyframePacket) -> bytes:
    n = len(pkt.lm_ids)
    G = len(pkt.gdesc)
    D = pkt.lm_desc.shape[1] if n else 0
    gq, gscale = _quant(np.asarray(pkt.gdesc, np.float32))
    out = [
        _HDR.pack(MAGIC, VERSION, pkt.drone_id, pkt.frame_id, pkt.stamp,
                  int(pkt.is_keyframe), n, G, D),
        np.asarray(pkt.pose, np.float32).tobytes(),
        struct.pack("<f", gscale),
        gq.tobytes(),
    ]
    for i in range(n):
        dq, dscale = _quant(np.asarray(pkt.lm_desc[i], np.float32))
        out.append(struct.pack("<qB", int(pkt.lm_ids[i]), int(pkt.lm_cam[i])))
        out.append(np.asarray(pkt.lm_rays[i], np.float32).tobytes())
        out.append(np.asarray(pkt.lm_vels[i], np.float32).tobytes())
        out.append(struct.pack("<f", dscale))
        out.append(dq.tobytes())
    return b"".join(out)


def decode_keyframe(buf: bytes) -> Optional[RemoteKeyframePacket]:
    if len(buf) < _HDR.size:
        return None
    magic, ver, drone_id, frame_id, stamp, is_kf, n, G, D = _HDR.unpack_from(
        buf, 0
    )
    if magic != MAGIC or ver != VERSION:
        return None
    off = _HDR.size
    pose = np.frombuffer(buf, np.float32, 7, off).copy()
    off += 28
    (gscale,) = struct.unpack_from("<f", buf, off)
    off += 4
    gq = np.frombuffer(buf, np.int8, G, off).copy()
    off += G
    gdesc = _dequant(gq, gscale, renorm=True)

    lm_ids = np.zeros(n, np.int64)
    lm_cam = np.zeros(n, np.uint8)
    lm_rays = np.zeros((n, 3), np.float32)
    lm_vels = np.zeros((n, 3), np.float32)
    lm_desc = np.zeros((n, D), np.float32)
    for i in range(n):
        lm_ids[i], lm_cam[i] = struct.unpack_from("<qB", buf, off)
        off += 9
        lm_rays[i] = np.frombuffer(buf, np.float32, 3, off)
        off += 12
        lm_vels[i] = np.frombuffer(buf, np.float32, 3, off)
        off += 12
        (dscale,) = struct.unpack_from("<f", buf, off)
        off += 4
        dq = np.frombuffer(buf, np.int8, D, off)
        off += D
        lm_desc[i] = _dequant(dq, dscale, renorm=True)
    return RemoteKeyframePacket(
        drone_id=drone_id, frame_id=frame_id, stamp=stamp,
        is_keyframe=bool(is_kf), pose=pose, gdesc=gdesc,
        lm_ids=lm_ids, lm_cam=lm_cam, lm_rays=lm_rays, lm_vels=lm_vels,
        lm_desc=lm_desc,
    )
