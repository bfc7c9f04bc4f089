from d2slam_tpu.imu.preintegration import (
    PreintegrationResult,
    preintegrate,
    imu_propagate_pose,
    default_noise_matrix,
)
from d2slam_tpu.imu.buffer import IMUBuffer
