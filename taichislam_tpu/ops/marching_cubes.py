"""Isosurface extraction over the sparse TSDF (marching cubes by tetrahedra).

Role-equivalent of the reference's MarchingCubeMesher
(/root/reference/taichi_slam/mapping/marching_cube_mesher.py): scan active
surface voxels, march a unit cube per voxel, emit interpolated triangles with
per-vertex normals (central-difference TSDF gradient) and colors.

Design differences (TPU-first):

- Instead of transcribing the classic 256-case edge/tri lookup tables, the
  triangulation is **generated at import time** from a 6-tetrahedra cube
  decomposition around the V0–V6 diagonal. Each tet has 16 trivially
  enumerable sign cases (≤2 triangles); orientation is fixed numerically so
  normals point toward positive SDF. The result is a watertight triangulation
  of the same isosurface (slightly more triangles than classic MC, no
  ambiguous-case holes).
- Extraction is two-phase with static shapes: (A) a parallel cell scan
  computes per-(cell, tet) triangle counts and prefix-sum-compacts triangle
  descriptors (replacing the reference's atomic ``num_facelets`` append,
  marching_cube_mesher.py:110-125); (B) vertices/normals/colors are computed
  only for the kept ``max_triangles``.

Semantics preserved from the reference kernel
(marching_cube_mesher.py:180-187, 127-178): cells are anchored at voxels with
``observed > 0 and TSDF < tsdf_surface_thres``; a cell is skipped when any of
its 8 corners (at ``+offset*step``) is unobserved; vertex positions are
interpolated in voxel-index space then scaled by ``voxel_scale`` (map-local
frame, no base-pose rotation); unallocated TSDF reads 0 for normals.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from taichislam_tpu.core.config import TSDFConfig
from taichislam_tpu.core.compaction import compact_mask
from taichislam_tpu.core.grid import (
    flat_voxel_index,
    gather_channel,
    lookup_slots,
    voxel_to_block,
)
from taichislam_tpu.ops.exports import voxel_ijk_all

EPS = 1e-6

# Bourke corner layout (canonical): V0..V7
CUBE_CORNERS = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.int32)

# 6-tet partition of the cube around the V0-V6 diagonal
TETS = np.array([
    [0, 1, 2, 6], [0, 2, 3, 6], [0, 3, 7, 6],
    [0, 7, 4, 6], [0, 4, 5, 6], [0, 5, 1, 6]], np.int32)


def tet_tri_tables():
    """jnp view of the cached numpy tables (see _tet_tri_tables_np)."""
    ntri, edges = _tet_tri_tables_np()
    return jnp.asarray(ntri), jnp.asarray(edges)


@functools.lru_cache(maxsize=1)
def _tet_tri_tables_np():
    """Generate per-tet triangulation tables.

    Returns (ntri, edges):
      ntri  (6, 16) int32            — triangles for (tet, inside-mask) case
      edges (6, 16, 2, 3, 2) int32   — cube-corner index pairs per triangle
                                       vertex (edge endpoints); -1 padded.
    Winding is oriented so cross(v1-v0, v2-v0) points toward positive SDF
    (outward), fixed numerically using the canonical corner positions.
    """
    ntri = np.zeros((6, 16), np.int32)
    edges = np.full((6, 16, 2, 3, 2), -1, np.int32)
    P = CUBE_CORNERS.astype(np.float64)

    for t in range(6):
        tet = TETS[t]
        pos = P[tet]  # (4, 3)
        for case in range(16):
            inside = [s for s in range(4) if case & (1 << s)]
            outside = [s for s in range(4) if not case & (1 << s)]
            tris = []
            if len(inside) == 1:
                a = inside[0]
                tris = [[(a, outside[0]), (a, outside[1]), (a, outside[2])]]
            elif len(inside) == 3:
                d = outside[0]
                tris = [[(d, inside[0]), (d, inside[1]), (d, inside[2])]]
            elif len(inside) == 2:
                a, b = inside
                c, d = outside
                tris = [[(a, c), (a, d), (b, d)], [(a, c), (b, d), (b, c)]]
            if not tris:
                continue
            # orientation: normals toward the outside (positive SDF) side
            cin = pos[inside].mean(axis=0)
            cout = pos[outside].mean(axis=0)
            out_dir = cout - cin
            fixed = []
            for tri in tris:
                v = [0.5 * (pos[e0] + pos[e1]) for e0, e1 in tri]
                n = np.cross(v[1] - v[0], v[2] - v[0])
                if np.dot(n, out_dir) < 0:
                    tri = [tri[0], tri[2], tri[1]]
                fixed.append(tri)
            ntri[t, case] = len(fixed)
            for k, tri in enumerate(fixed):
                for vv, (e0, e1) in enumerate(tri):
                    edges[t, case, k, vv, 0] = tet[e0]
                    edges[t, case, k, vv, 1] = tet[e1]
    return ntri, edges


def _lookup(spec, state, channel, s, ijk):
    blin, intra, _ = voxel_to_block(spec, s, ijk)
    slots = lookup_slots(spec, state.table, blin)
    flat = flat_voxel_index(spec, slots, intra)
    return gather_channel(state.channels[channel], flat)


def _vertex_interp(p0, p1, v0, v1):
    """vertexInterp (marching_cube_mesher.py:44-60) incl. EPS snapping."""
    mu = (0.0 - v0) / jnp.where(jnp.abs(v1 - v0) < 1e-30, 1e-30, v1 - v0)
    p = p0 + mu[..., None] * (p1 - p0)
    p = jnp.where((jnp.abs(v1) < EPS)[..., None], p1, p)
    p = jnp.where((jnp.abs(v0) < EPS)[..., None], p0, p)
    mu = jnp.where(jnp.abs(v0) < EPS, 0.0, jnp.where(jnp.abs(v1) < EPS, 1.0, mu))
    return p, mu


@partial(jax.jit, static_argnums=(0, 1, 2))
def extract_mesh(cfg: TSDFConfig, max_triangles: int, step: int,
                 state, active_submap, surface_thres):
    """Extract the isosurface of the active submap (or global map).

    Returns dict with vertices (T*3, 3), normals (T*3, 3), colors (T*3, 3),
    num_triangles, total_triangles (pre-cap).
    """
    spec = cfg.grid
    nb = spec.max_blocks + 1
    nt_tab, edge_tab = tet_tri_tables()

    # ---- phase A: cell scan ------------------------------------------------
    cell_ijk = voxel_ijk_all(spec, state).reshape(-1, 3)        # (C, 3)
    C = cell_ijk.shape[0]
    obs_c = state.channels["TSDF_observed"].reshape(-1) > 0
    tsdf_c = state.channels["TSDF"].reshape(-1).astype(jnp.float32)
    blk = state.block_active & (state.block_coords[:, 0] == active_submap)
    blk = blk.at[-1].set(False)
    cell_ok = obs_c & (tsdf_c < surface_thres) & \
        jnp.repeat(blk, spec.voxels_per_block)

    corners = cell_ijk[:, None, :] + CUBE_CORNERS[None] * step   # (C, 8, 3)
    s_arr = jnp.broadcast_to(active_submap, (C, 8))
    cv = _lookup(spec, state, "TSDF", s_arr, corners).astype(jnp.float32)
    cobs = _lookup(spec, state, "TSDF_observed", s_arr, corners)
    cell_ok &= jnp.all(cobs > 0, axis=-1)

    inside = cv < 0.0                                            # (C, 8)
    # per-tet case index from the 4 corner bits
    tet_bits = inside[:, TETS]                                   # (C, 6, 4)
    case = jnp.sum(tet_bits.astype(jnp.int32) *
                   jnp.asarray([1, 2, 4, 8])[None, None, :], axis=-1)
    ntris = jnp.where(cell_ok[:, None], nt_tab[jnp.arange(6)[None, :], case],
                      0)                                         # (C, 6)

    emit = jnp.arange(2)[None, None, :] < ntris[:, :, None]      # (C, 6, 2)
    pos, kept, total = compact_mask(emit.reshape(-1), max_triangles)

    lin = jnp.arange(C * 6 * 2, dtype=jnp.int32)
    desc = jnp.full((max_triangles + 1,), 0, jnp.int32).at[pos].set(
        lin, mode="drop")[:max_triangles]
    tri_valid = jnp.arange(max_triangles) < kept

    # ---- phase B: build kept triangles ------------------------------------
    cell_i = desc // 12
    tet_i = (desc // 2) % 6
    tri_i = desc % 2
    k_case = case[cell_i, tet_i]
    e = edge_tab[tet_i, k_case, tri_i]                           # (T, 3, 2)

    base = cell_ijk[cell_i].astype(jnp.float32)                  # (T, 3)
    cpos = base[:, None, None, :] + \
        jnp.asarray(CUBE_CORNERS, jnp.float32)[e] * step         # (T, 3, 2, 3)
    vals = cv[cell_i]                                            # (T, 8)
    v0 = jnp.take_along_axis(vals, e[:, :, 0], axis=1)           # (T, 3)
    v1 = jnp.take_along_axis(vals, e[:, :, 1], axis=1)
    vpos, mu = _vertex_interp(cpos[:, :, 0], cpos[:, :, 1], v0, v1)  # (T,3,3)

    # normals: central-difference TSDF gradient at round(p)
    # (marching_cube_mesher.py:84-93); unallocated voxels read 0
    vijk = jnp.round(vpos).astype(jnp.int32)                     # (T, 3, 3)
    sv = jnp.broadcast_to(active_submap, vijk.shape[:-1] + (6,))
    offs = jnp.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                        [0, 0, 1], [0, 0, -1]], jnp.int32)
    probe = vijk[:, :, None, :] + offs[None, None, :, :]         # (T, 3, 6, 3)
    tv = _lookup(spec, state, "TSDF", sv, probe).astype(jnp.float32)
    grad = jnp.stack([tv[..., 0] - tv[..., 1], tv[..., 2] - tv[..., 3],
                      tv[..., 4] - tv[..., 5]], axis=-1)
    nrm = grad / jnp.maximum(jnp.linalg.norm(grad, axis=-1, keepdims=True),
                             1e-12)

    if cfg.texture_enabled:
        ccol = _lookup(spec, state, "color", s_arr, corners)     # (C, 8, 3)
        ccol_t = ccol[cell_i].astype(jnp.float32)                # (T, 8, 3)
        idxA = jnp.broadcast_to(e[:, :, 0][:, :, None], e.shape[:2] + (3,))
        idxB = jnp.broadcast_to(e[:, :, 1][:, :, None], e.shape[:2] + (3,))
        colA = jnp.take_along_axis(ccol_t, idxA, axis=1)         # (T, 3, 3)
        colB = jnp.take_along_axis(ccol_t, idxB, axis=1)
        # zero-color fallback (vertexInterp_color, marching_cube_mesher.py:62-82)
        a_zero = jnp.all(colA == 0, axis=-1)
        b_zero = jnp.all(colB == 0, axis=-1)
        col = colA + mu[..., None] * (colB - colA)
        col = jnp.where(b_zero[..., None], colA, col)
        col = jnp.where(a_zero[..., None], colB, col)
    else:
        col = jnp.full(vpos.shape, 0.5, jnp.float32)

    vmask = tri_valid[:, None, None]
    vertices = jnp.where(vmask, vpos * cfg.voxel_scale, -1000000.0)
    return {
        "vertices": vertices.reshape(-1, 3),
        "normals": jnp.where(vmask, nrm, 0.0).reshape(-1, 3),
        "colors": jnp.where(vmask, col, 0.5).reshape(-1, 3),
        "num_triangles": kept,
        "total_triangles": total,
    }
