"""d2slam_tpu — TPU-native decentralized collaborative visual-inertial SLAM.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
HKUST-Aerial-Robotics/D2SLAM (see SURVEY.md): sliding-window
visual-inertial odometry with distributed consensus ADMM (D2VINS
equivalent), asynchronous distributed pose-graph optimization
(D2PGO equivalent), a learned frontend (SuperPoint / NetVLAD /
optical flow / HitNet depth) as batched TPU inference, and
multi-robot exchange expressed as collectives over a `robot` mesh
axis instead of LCM UDP multicast.

Subpackages
-----------
geometry   quaternion / SO(3) / SE(3) ops, camera models
imu        IMU buffering and midpoint preintegration
factors    analytic residual/jacobian factor library
solver     batched Gauss-Newton/LM with Schur elimination, marginalization
vins       sliding-window estimator (D2VINS equivalent)
frontend   learned feature frontend (SuperPoint, NetVLAD, LK, matching)
pgo        distributed pose-graph optimization (D2PGO equivalent)
parallel   mesh construction and consensus collectives
ops        Pallas TPU kernels for hot frontend ops
comm       wire codecs (int8 descriptor quantization) + swarm transport
datasets   EuRoC/TUM-VI readers, g2o pose-graph I/O
"""

__version__ = "0.1.0"
