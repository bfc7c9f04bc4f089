from d2slam_tpu.parallel.consensus import (
    consensus_average,
    dual_update,
    build_consensus_rows,
    admm_vio_round,
)
from d2slam_tpu.parallel.mesh import robot_mesh
