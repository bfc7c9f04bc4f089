from d2slam_tpu.pgo.pose_graph import PGOLayout, PGOState, PGOEdges, solve_pgo
from d2slam_tpu.pgo.pcg import solve_pgo_pcg
from d2slam_tpu.pgo.rot_init import (
    chordal_rotation_init,
    chordal_rotation_init_pcg,
    linear_translation_init,
)
from d2slam_tpu.pgo.g2o_io import read_g2o, write_g2o
