"""splatloam_tpu — a TPU-native LiDAR odometry & mapping framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
rvp-group/Splat-LOAM (reference: /root/reference): 2D Gaussian surfel maps
rendered through a differentiable spherical range-image rasterizer, pure-JAX
Gauss-Newton frame-to-model tracking, incremental densify/optimize/prune
mapping over bounded submaps, and multi-chip scaling via jax.sharding meshes.

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):
  geometry/   SE(3)/quaternion + spherical camera math  (ref utils/{general,graphic}_utils.py)
  ops/        device kernels: rasterizer (jnp golden + Pallas), KNN, projection
  model/      fixed-capacity surfel pytrees, cameras, frames, submaps
  slam/       tracker / mapper / orchestrator            (ref slam/)
  io/         dataset, pointcloud, trajectory, PLY I/O   (ref scene/dataset_readers.py, utils/*)
  eval/       odometry RPE + reconstruction metrics      (ref utils/eval_utils.py)
  parallel/   device meshes and sharded train steps      (new; ref has none)
"""

__version__ = "0.1.0"
