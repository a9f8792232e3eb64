"""uneven_planner_tpu — TPU-native trajectory optimization for car-like
robots on uneven terrain.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
ZJU-FAST-Lab/uneven_planner: SE(2) terrain fields, MINCO SE(2) trajectory
optimization under a PHR augmented Lagrangian, a batched-sampling kinodynamic
front end, an ADMM-based tracking MPC, and a batched closed-loop simulator —
all batched over scenarios and shardable over TPU meshes.
"""

__version__ = "0.1.0"
