from d2slam_tpu.tools.calibration import (
    calibrate_pinhole,
    calibrate_kb,
    calibrate_vignette,
)
