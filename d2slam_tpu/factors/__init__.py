from d2slam_tpu.factors.residuals import (
    imu_residual,
    imu_sqrt_info,
    projection_residual,
    projection_two_frame_one_cam,
    projection_two_frame_two_cam,
    projection_one_frame_two_cam,
    projection_depth_residual,
    tangent_base_of,
    consensus_pose_residual,
    relpose_residual,
    relpose4d_residual,
    gravity_prior_residual,
)
from d2slam_tpu.factors.linearize import linearize_factor, RETRACT
