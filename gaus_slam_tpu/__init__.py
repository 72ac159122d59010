"""gaus_slam_tpu — TPU-native dense RGB-D SLAM with 2D Gaussian surfels.

A from-scratch JAX/XLA/Pallas rebuild of the GauS-SLAM system
(reference: vasabi-root/gaus-slam, CUDA/torch). The compute path is
jit-compiled JAX with Pallas TPU kernels for the differentiable surfel
rasterizer; the SLAM orchestration (frontend tracking / backend bundle
adjustment over submaps) is host-side control flow around a small number
of jitted step functions.

Layout:
  ops/       rasterizer (preprocess / binning / compositing kernels),
             SE3 + camera math, image metrics
  models/    Gaussian map store (static-shape, optimizer-surgery aware),
             frames, poses, submaps, descriptors
  slam/      Frontend, Backend, losses, densification
  render/    render facade (tracking/mapping/BA/view modes)
  parallel/  device-mesh sharded bundle adjustment
  data/      dataset loaders (Replica/TUM/ScanNet/ScanNet++/... + synthetic)
  utils/     config, eval (PSNR/SSIM/ATE/mesh), PLY + scene I/O
  native/    C++ runtime pieces (TSDF fusion + marching cubes, prefetcher)
"""

__version__ = "0.1.0"
