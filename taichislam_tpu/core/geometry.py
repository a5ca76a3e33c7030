"""Coordinate, camera, and pose math shared by every map type.

Replicates the conventions of the reference's BaseMap
(/root/reference/taichi_slam/mapping/mapping_common.py):

- ``xyz_to_ijk``: voxel index = round(xyz / voxel_scale) with ties rounding
  away from zero (Taichi's ``ti.round`` lowers to llvm.round, which is
  round-half-away-from-zero; mapping_common.py:263-266).
- ``unproject_point_dep``: pinhole back-projection where ``i`` is the image
  column and ``j`` the row, intrinsics given as a flattened row-major 3x3
  (fx=K[0], cx=K[2], fy=K[4], cy=K[5]; mapping_common.py:31-41).
- ``sign``: (0 < x) - (x < 0), zero at zero (mapping_common.py:5-7).

All functions are pure jnp and safe under jit/vmap.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sign(x):
    """Signum with sign(0) == 0, matching mapping_common.py:5-7."""
    return (0 < x).astype(x.dtype) - (x < 0).astype(x.dtype)


def round_half_away(x):
    """Round to nearest integer, ties away from zero (like C round/ti.round)."""
    return jnp.trunc(x + jnp.where(x >= 0, 0.5, -0.5))


def xyz_to_ijk(xyz, voxel_scale):
    """World position -> signed voxel index (mapping_common.py:240-243)."""
    return round_half_away(xyz / voxel_scale).astype(jnp.int32)


def ijk_to_xyz(ijk, voxel_scale):
    """Voxel index -> world position of the voxel center (mapping_common.py:221-223)."""
    return ijk.astype(jnp.float32) * voxel_scale


def unproject_point_dep(i, j, dep, K_dep):
    """Back-project pixel (col=i, row=j) at depth ``dep`` (meters).

    ``K_dep`` is the flattened 3x3 depth intrinsic. Returns (..., 3) points in
    the camera frame (mapping_common.py:31-41).
    """
    fx, cx, fy, cy = K_dep[0], K_dep[2], K_dep[4], K_dep[5]
    x = (i.astype(jnp.float32) - cx) * dep / fx
    y = (j.astype(jnp.float32) - cy) * dep / fy
    return jnp.stack([x, y, dep], axis=-1)


def color_ind_from_depth_pt(i, j, K_dep, K_color, w, h):
    """Re-project a depth pixel into the color image (mapping_common.py:43-58).

    Returns (col_index, row_index) into the color image — note the reference
    returns (color_j, color_i), i.e. swapped so the first coordinate indexes
    image rows. Out-of-bounds pixels clamp to (0, 0).
    """
    fx_c, cx_c, fy_c, cy_c = K_color[0], K_color[2], K_color[4], K_color[5]
    fx, cx, fy, cy = K_dep[0], K_dep[2], K_dep[4], K_dep[5]
    color_i = ((i - cx) / fx * fx_c + cx_c).astype(jnp.int32)
    color_j = ((j - cy) / fy * fy_c + cy_c).astype(jnp.int32)
    oob = (color_i < 0) | (color_i >= h) | (color_j < 0) | (color_j >= w)
    color_i = jnp.where(oob, 0, color_i)
    color_j = jnp.where(oob, 0, color_j)
    return color_j, color_i


def transform_points(R, T, pts):
    """Apply rigid transform to (..., 3) points: R @ p + T."""
    return pts @ jnp.asarray(R).T + jnp.asarray(T)


def rotate_points(R, pts):
    return pts @ jnp.asarray(R).T


def convert_by_base(base_R, base_T, R, T):
    """Express world pose (R, T) in the frame of base pose (host-side numpy).

    Mirrors BaseMap.convert_by_base (mapping_common.py:91-100).
    """
    base_R = np.asarray(base_R)
    base_R_inv = base_R.T
    R_ = base_R_inv @ np.asarray(R)
    T_ = base_R_inv @ (np.asarray(T) - np.asarray(base_T))
    return R_, T_


def strided_depth_f32(depth_mm, step: int):
    """Depth image decimated by ``step`` in both axes, as flat f32 mm.

    A plain ``depth[::2, ::2]`` lowers to a per-element gather on TPU
    (measured 0.81 ms/frame at 640x480 — ~10 ns/element, the whole cost
    of the unprojection stage). For the common step=2/uint16 case the
    even columns are extracted WITHOUT a gather: bitcast adjacent u16
    pairs to u32 (little-endian low half = even column, a vectorized
    elementwise op) and drop odd rows with a contiguous unit-stride
    slice. Other steps/dtypes fall back to the strided slice.
    """
    import jax

    h, w = depth_mm.shape
    if step == 2 and h % 2 == 0 and w % 2 == 0 and \
            depth_mm.dtype == jnp.uint16:
        v = jax.lax.bitcast_convert_type(
            depth_mm.reshape(h, w // 2, 2), jnp.uint32)
        v = v.reshape(h // 2, 2, w // 2)[:, 0, :]
        return (v & jnp.uint32(0xFFFF)).astype(jnp.float32).reshape(-1)
    return depth_mm[:(h // step) * step:step,
                    :(w // step) * step:step].reshape(-1).astype(jnp.float32)


def pixel_grid(h, w, step):
    """Strided pixel coordinate grids (rows j, cols i) like the reference's
    recast loops (dense_tsdf.py:188-195): rows 0, step, 2*step, ...
    Returns (jj, ii) int32 arrays of shape (h//step, w//step)."""
    rows = np.arange(0, (h // step)) * step
    cols = np.arange(0, (w // step)) * step
    jj, ii = np.meshgrid(rows, cols, indexing="ij")
    return jnp.asarray(jj, jnp.int32), jnp.asarray(ii, jnp.int32)
