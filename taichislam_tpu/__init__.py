"""taichislam_tpu — a TPU-native 3D dense-mapping framework.

A from-scratch rebuild of the capabilities of xuhao1/TaichiSLAM (the reference
lives at /root/reference and is analyzed in SURVEY.md) on JAX/XLA/Pallas:

- ``models``   — map types (Octomap, DenseTSDF, DenseESDF, SubmapMapping),
                 marching-cubes mesher, topological skeleton graph generator.
- ``ops``      — jittable compute ops: depth/pcl integration, TSDF ray-march
                 fusion, ESDF wavefront sweeps, marching cubes, exports.
- ``core``     — block voxel-grid substrate, coordinate/camera math, config.
- ``parallel`` — jax.sharding / shard_map multi-chip strategies.
- ``utils``    — comm (LCM-wire-compatible transport), serialization,
                 visualization, ROS interop.
- ``opti``     — quaternion/transform library and NLLS/BA on jax.grad.

Unlike the reference (Taichi sparse SNode trees + atomic kernels), everything
in the compute path here is functional, statically-shaped, and jittable:
sparse voxel storage is a fixed-capacity block grid with a direct-mapped
block table, stream compaction is prefix-sum based, and the incremental ESDF
is an iterated masked wavefront sweep.
"""

__version__ = "0.1.0"

from taichislam_tpu.core.config import TSDFConfig, OctomapConfig  # noqa: F401
