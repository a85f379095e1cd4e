"""dregnerf_tpu — TPU-native rebuild of DReg-NeRF (AIBluefisher/DReg-NeRF).

A JAX/XLA/Pallas framework providing:

- Instant-NGP radiance fields (multires hash encoding + tiny MLPs) trained
  per scene block with occupancy-grid-accelerated volume rendering
  (reference: conerf/radiance_fields/ngp.py, train_ngp_nerf.py).
- Voxel feature-grid extraction from trained NeRFs: density/surface masks,
  color averaging over fixed view directions, point-cloud export
  (reference: conerf/register/sample_grid.py, eval_ngp_nerf.py).
- NeRFRegTr: a 3D-FPN + transformer cross-encoder registration network with
  weighted-Kabsch pose decoding (reference: conerf/register/nerf_regtr.py).
- TPU-first runtime: static-shape packed ray marching, pjit/shard_map data
  parallelism over rays and scene pairs, orbax-style self-describing
  checkpoints, host-side C++ helpers for point-cloud IO and classical
  registration baselines.

The design is NOT a port: every compute-path component is re-architected for
XLA's compilation model (static shapes, masked compaction, segment scans)
and for TPU hardware (MXU-sized matmuls in bf16, fused Pallas kernels for
hash encoding and ray marching).
"""

__version__ = "0.1.0"
