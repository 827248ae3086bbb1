"""sparse_view_3dgs_pack_tpu — TPU-native sparse-view 3D Gaussian Splatting.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`Advanced-Vision-and-Learning-Lab/sparse-view-3dgs-pack` (LGDWT-GS + the
fs3dgs benchmark harness with vanilla 3DGS / FSGS / DNGaussian / mult-dwtgs).

Layout:
  ops/        device compute: projection, tile rasterizer, KNN, SSIM, DWT,
              hash-grid + SH encoders, Pallas kernels
  models/     GaussianState pytree (padded/alive-mask), neural field
  data/       COLMAP/Blender scene IO, cameras, PLY
  losses/     photometric / DWT / depth / FSGS / DNGaussian / NIR losses
  train/      optimizer, densification, jitted train step, method recipes
  parallel/   device-mesh sharding helpers (tile- and data-parallel)
  benchmark/  fs3dgs-compatible YAML benchmark harness (`gs_benchmark`)
  viewer/     network_gui TCP bridge (SIBR remote-viewer protocol)
"""

__version__ = "0.1.0"
