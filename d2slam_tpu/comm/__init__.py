from d2slam_tpu.comm.codec import (
    RemoteKeyframePacket,
    encode_keyframe,
    decode_keyframe,
)
from d2slam_tpu.comm.transport import UDPMulticastTransport
