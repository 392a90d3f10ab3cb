"""instance_nerf_tpu — TPU-native (JAX/XLA/Pallas/pjit) rebuild of Instance-NeRF.

A from-scratch framework with the capabilities of lyclyc52/Instance_NeRF
(ICCV 2023): per-instance 3D segmentation of NeRF scenes via a 3D
Mask-R-CNN over sampled RGBσ voxel grids (NeRF-RPN / NeRF-RCNN), plus a
hash-grid NGP "instance field" whose instance logits are rendered like
color.

Design (TPU-first, not a port):
  * channels-last NDHWC 3D convs on the MXU, bfloat16 compute
  * fixed-shape padded sets + validity masks instead of dynamic shapes
  * Pallas kernels for the hot irregular ops (RoIAlign-3D, hash-grid
    encoding, fused ray-march rendering)
  * scale-out through ``jax.sharding.Mesh`` + collectives over ICI
    (data/spatial sharding), not NCCL/DDP
"""

__version__ = "0.1.0"
