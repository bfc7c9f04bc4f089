from d2slam_tpu.frontend.superpoint import (
    SuperPointConfig,
    superpoint_init,
    superpoint_apply,
    superpoint_extract,
    superpoint_from_onnx,
)
from d2slam_tpu.frontend.netvlad import (
    NetVLADConfig,
    netvlad_init,
    netvlad_apply,
    netvlad_from_onnx,
)
from d2slam_tpu.frontend.matching import (
    match_descriptors,
    match_descriptors_radius,
)
from d2slam_tpu.frontend.lk import build_pyramid, lk_track_pyramidal
