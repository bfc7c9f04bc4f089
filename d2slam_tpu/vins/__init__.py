from d2slam_tpu.vins.types import FrontendFrame, CameraObservations, Odometry
from d2slam_tpu.vins.estimator import D2Estimator
from d2slam_tpu.vins.swarm import SwarmManager, SwarmConfig
