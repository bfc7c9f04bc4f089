from d2slam_tpu.depth.fisheye_undist import build_undistort_map, remap_bilinear
from d2slam_tpu.depth.stereo import (
    block_match_disparity,
    disparity,
    points_from_disparity,
)
from d2slam_tpu.depth.hitnet import hitnet_init, hitnet_apply, HitNetConfig
