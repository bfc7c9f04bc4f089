from d2slam_tpu.solver.layout import VIOLayout
from d2slam_tpu.solver.state import VIOState, ImuMeas, ProjMeas, PriorBlock
from d2slam_tpu.solver.vio_assembly import (
    build_imu_rows,
    build_proj_rows,
    build_prior_rows,
    assemble_full_rows,
)
from d2slam_tpu.solver.lm import lm_solve_vio, SolveReport
