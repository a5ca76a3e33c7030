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
- Extraction is three-phase with static shapes:
  (0) **surface-block compaction** — blocks containing any candidate surface
      voxel are compacted to a static ``surface_block_cap`` (an nb-sized
      prefix sum, trivial), so the per-cell work scales with the surface,
      not the whole allocated grid;
  (A) a parallel cell scan over the compacted blocks computes per-(cell,
      tet) triangle counts, with cube corners read from **slab-assembled
      (V+2)³ halos** (per-block slice gathers; per-element corner lookups
      would cost 8 × total voxels);
  (B) vertices/normals/colors are computed only for the prefix-sum-kept
      ``max_triangles`` (replacing the reference's atomic ``num_facelets``
      append, marching_cube_mesher.py:110-125).

Semantics preserved from the reference kernel
(marching_cube_mesher.py:180-187, 127-178): cells are anchored at voxels with
``observed > 0 and TSDF < tsdf_surface_thres``; a cell is skipped when any of
its 8 corners (at ``+offset*step``) is unobserved; vertex positions are
interpolated in voxel-index space then scaled by ``voxel_scale`` (map-local
frame, no base-pose rotation); unallocated TSDF reads 0 for normals.
``step > 1`` uses the coordinate-lookup path (corners beyond the 1-halo).
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
    block_origin_voxel,
    flat_voxel_index,
    gather_channel,
    lookup_slots,
    voxel_to_block,
)
from taichislam_tpu.ops.esdf import assemble_halo, neighbor_slot_table

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
    mu = jnp.where(jnp.abs(v0) < EPS, 0.0,
                   jnp.where(jnp.abs(v1) < EPS, 1.0, mu))
    return p, mu


def _corner_values_halo(halo, V):
    """(cap, V, V, V, 8) corner samples from a (cap, V+2, V+2, V+2) halo
    (step == 1 fast path: every corner is a static slice)."""
    outs = []
    for dx, dy, dz in CUBE_CORNERS:
        outs.append(halo[:, 1 + dx:1 + dx + V, 1 + dy:1 + dy + V,
                         1 + dz:1 + dz + V])
    return jnp.stack(outs, axis=-1)


@partial(jax.jit, static_argnums=(0,))
def dilate_blocks(cfg: TSDFConfig, state, active_submap, bitmap):
    """26-dilate a per-slot block bitmap through the allocated-neighbor
    table. A block's mesh reads corner samples from its +1 halo and
    normal probes cross any face, so the re-mesh working set for a set of
    TSDF-touched blocks is their full 26-neighborhood (allocated blocks
    of the active submap only)."""
    nb = cfg.grid.max_blocks + 1
    nslots = neighbor_slot_table(cfg.grid, state, active_submap)  # (nb,3,3,3)
    src = bitmap.at[-1].set(False)
    tgt = jnp.where(src[:, None], nslots.reshape(nb, 27), nb - 1)
    out = jnp.zeros((nb,), bool).at[tgt.reshape(-1)].set(True)
    out = (out | bitmap).at[-1].set(False)
    blk = state.block_active & (state.block_coords[:, 0] == active_submap)
    return out & blk.at[-1].set(False)


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def extract_mesh(cfg: TSDFConfig, max_triangles: int, step: int,
                 surface_block_cap: int, state, active_submap,
                 surface_thres, block_mask=None):
    """Extract the isosurface of the active submap (or global map).

    Returns dict with vertices (T*3, 3), normals (T*3, 3), colors (T*3, 3),
    num_triangles, total_triangles (pre-cap), num_surface_blocks,
    surface_blocks_dropped, plus the per-compact-block spans feeding the
    incremental mesher (models/mesher.py): ``block_slots`` (cap,) storage
    slot per compact row (ascending-slot order — compaction is a prefix
    sum) and ``block_tri_counts`` (cap,) triangles per row. Triangles are
    emitted cell-major over the compact rows, so each block's triangles
    are one contiguous span of the output.

    With ``block_mask`` (per-slot bool bitmap) extraction is restricted
    to surface blocks IN THE MASK — the incremental re-mesh path (corner
    and normal reads still see the full map, so a masked block's
    triangles are bit-identical to its triangles in a full extraction).
    """
    spec = cfg.grid
    V = spec.V
    nb = spec.max_blocks + 1
    nt_tab, edge_tab = tet_tri_tables()

    tsdf_t = state.channels["TSDF"].astype(jnp.float32)
    obs_t = state.channels["TSDF_observed"] > 0
    blk = state.block_active & (state.block_coords[:, 0] == active_submap)
    blk = blk.at[-1].set(False)

    # ---- phase 0: compact surface blocks --------------------------------
    anchor = obs_t & (tsdf_t < surface_thres)
    blk_has = jnp.any(anchor.reshape(nb, -1), axis=1) & blk
    if block_mask is not None:
        blk_has = blk_has & block_mask
    bpos, bkept, btotal = compact_mask(blk_has, surface_block_cap)
    slot_of = jnp.full((surface_block_cap + 1,), nb - 1, jnp.int32).at[
        bpos].set(jnp.arange(nb, dtype=jnp.int32),
                  mode="drop")[:surface_block_cap]
    bvalid = jnp.arange(surface_block_cap) < bkept

    cap = surface_block_cap
    coords_c = jnp.take(state.block_coords, slot_of, axis=0)  # (cap, 4)
    origin_c = block_origin_voxel(spec, coords_c)             # (cap, 3)

    # ---- corner sampling --------------------------------------------------
    if step == 1:
        # halos are assembled directly into the compacted working set:
        # neighbor slabs are slice-gathered from the FULL channel arrays
        # (surface blocks border non-surface blocks whose values still feed
        # corner samples), but the (V+2)³ halo buffers are cap-sized — halo
        # cost scales with the surface, not the allocated grid
        nslots_full = neighbor_slot_table(spec, state, active_submap)
        nsl = jnp.take(nslots_full, slot_of, axis=0)          # (cap, 3,3,3)
        nsl = jnp.where(bvalid[:, None, None, None], nsl, nb - 1)

        def gtile(arr, fill):
            out = jnp.take(arr, slot_of, axis=0)
            return jnp.where(bvalid[:, None, None, None], out, fill)

        # unobserved/missing neighbors read TSDF 0 / observed 0 — the
        # reference's inactive-SNode semantics. Channels are stored flat
        # (nb, V^3); the halo slab slicing needs spatial (nb, V, V, V).
        tsdf_src = jnp.where(obs_t, tsdf_t, 0.0).at[-1].set(0.0).reshape(
            nb, V, V, V)
        obs_src = obs_t.at[-1].set(False).reshape(nb, V, V, V)
        th = assemble_halo(tsdf_src, nsl, V, 0.0,
                           center=gtile(tsdf_src, 0.0))       # (cap, V+2,..)
        oh = assemble_halo(obs_src, nsl, V, False,
                           center=gtile(obs_src, False))
        cv = _corner_values_halo(th, V).reshape(cap, -1, 8)   # (cap, V³, 8)
        cobs = _corner_values_halo(oh, V).reshape(cap, -1, 8)
        if cfg.texture_enabled:
            col_t = state.channels["color"].astype(jnp.float32)  # (nb,3,V³)
            ccol = jnp.stack(
                [_corner_values_halo(
                    assemble_halo(src, nsl, V, 0.0,
                                  center=gtile(src, 0.0)),
                    V).reshape(cap, -1, 8)
                 for src in (col_t[:, c, :].at[-1].set(0.0).reshape(
                     nb, V, V, V) for c in range(3))], axis=-1)  # (cap,V³,8,3)
    else:
        cell_ijk_c = origin_c[:, None, :] + _intra_np(V)[None]
        corners = cell_ijk_c[:, :, None, :] + \
            jnp.asarray(CUBE_CORNERS)[None, None] * step       # (cap,V³,8,3)
        s_arr = jnp.broadcast_to(active_submap, corners.shape[:-1])
        cv = _lookup(spec, state, "TSDF", s_arr, corners).astype(jnp.float32)
        cobs = _lookup(spec, state, "TSDF_observed", s_arr, corners) > 0
        if cfg.texture_enabled:
            col_t = state.channels["color"]                     # (nb,3,V³)
            blin_c, intra_c, _ = voxel_to_block(spec, s_arr, corners)
            slots_c = lookup_slots(spec, state.table, blin_c)
            ccol = jnp.stack(
                [jnp.take(col_t[:, c, :].reshape(-1),
                          flat_voxel_index(spec, slots_c, intra_c),
                          axis=0, mode="fill", fill_value=0)
                 for c in range(3)], axis=-1).astype(jnp.float32)

    anchor_c = jnp.take(anchor.reshape(nb, -1), slot_of, axis=0)  # (cap, V³)
    cell_ok = anchor_c & bvalid[:, None] & jnp.all(cobs, axis=-1)

    # ---- phase A: per-cell triangle counts ---------------------------------
    # Everything here stays 1-D (C,): materializing (C, 6) / (C, 6, 2) s32
    # intermediates OOMs on TPU — tile padding blows the tiny minor dims up
    # to 128 lanes (85x expansion, 16 GB at surface_block_cap=1024). The
    # per-tet structure is recovered below for the kept triangles only.
    C = cap * spec.voxels_per_block
    inside = (cv < 0.0).reshape(C, 8)
    pow2 = jnp.asarray([1, 2, 4, 8], jnp.int32)

    def tet_case(ins, t):
        return jnp.sum(ins[:, TETS[t]].astype(jnp.int32) * pow2[None, :],
                       axis=-1)

    tcount = jnp.zeros((C,), jnp.int32)
    for t in range(6):
        tcount = tcount + nt_tab[t][tet_case(inside, t)]
    tcount = jnp.where(cell_ok.reshape(C), tcount, 0)

    # two-level compaction: exclusive prefix sum gives each cell its output
    # base; scatter-max + cummax recovers the owning cell per output slot
    # (cell-major order, matching the reference's append order up to the
    # atomic nondeterminism it has and we don't)
    cbase = jnp.cumsum(tcount) - tcount
    total = cbase[-1] + tcount[-1]
    kept = jnp.minimum(total, max_triangles)
    tri_valid = jnp.arange(max_triangles) < kept

    tgt = jnp.where((tcount > 0) & (cbase < max_triangles), cbase,
                    max_triangles)
    seed = jnp.zeros((max_triangles + 1,), jnp.int32).at[tgt].max(
        jnp.arange(C, dtype=jnp.int32), mode="drop")[:max_triangles]
    cell_i = jax.lax.cummax(seed)                                # (T,)
    local = jnp.arange(max_triangles, dtype=jnp.int32) - cbase[cell_i]

    # ---- phase B: build kept triangles ------------------------------------
    # walk the 6 tets of each kept cell to locate triangle ``local`` —
    # (T,)-sized work, statically unrolled
    vals = cv.reshape(C, 8)[cell_i]                              # (T, 8)
    insideK = vals < 0.0
    ccum = jnp.zeros_like(local)
    tet_i = jnp.zeros_like(local)
    tri_i = jnp.zeros_like(local)
    k_case = jnp.zeros_like(local)
    for t in range(6):
        case_t = tet_case(insideK, t)
        nt_t = nt_tab[t][case_t]
        in_t = (local >= ccum) & (local < ccum + nt_t)
        tet_i = jnp.where(in_t, t, tet_i)
        tri_i = jnp.where(in_t, local - ccum, tri_i)
        k_case = jnp.where(in_t, case_t, k_case)
        ccum = ccum + nt_t
    e = edge_tab[tet_i, k_case, tri_i]                           # (T, 3, 2)

    cell_block = cell_i // spec.voxels_per_block
    cell_intra = cell_i % spec.voxels_per_block
    base = (origin_c[cell_block] +
            _intra_np(V)[cell_intra]).astype(jnp.float32)        # (T, 3)
    cpos = base[:, None, None, :] + \
        jnp.asarray(CUBE_CORNERS, jnp.float32)[e] * step         # (T, 3, 2, 3)
    v0 = jnp.take_along_axis(vals, e[:, :, 0], axis=1)           # (T, 3)
    v1 = jnp.take_along_axis(vals, e[:, :, 1], axis=1)
    vpos, mu = _vertex_interp(cpos[:, :, 0], cpos[:, :, 1], v0, v1)

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
        ccol_t = ccol.reshape(C, 8, 3)[cell_i]                   # (T, 8, 3)
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
        "num_surface_blocks": bkept,
        "surface_blocks_dropped": jnp.maximum(btotal - surface_block_cap, 0),
        "block_slots": slot_of,
        "block_tri_counts": tcount.reshape(cap, spec.voxels_per_block)
                                  .sum(axis=1),
    }


@partial(jax.jit, static_argnums=(3, 4))
def pack_mesh_delivery(vertices, normals, colors, rows: int,
                       with_colors: bool):
    """Quantize the live mesh prefix into ONE flat u8 buffer for host
    delivery: vertices as i16 millimetres (exact to 0.5 mm, range
    ±32.7 m), normals as i8/127 (unit vectors, ≤0.8 % direction error),
    colors as u8 — 12 bytes/vertex instead of 36, fetched in a single
    host round-trip. On remote-attached devices (this sandbox's relay)
    the mesh transfer dominates extraction by ~100×, so the wire size is
    the metric that matters; layout below = [rows*6 vertex bytes |
    rows*3 normal bytes | rows*3 color bytes if with_colors].
    """
    sl = jax.lax.dynamic_slice_in_dim
    v = sl(vertices, 0, rows, 0)
    vq = jnp.clip(jnp.round(v * 1000.0), -32767, 32767).astype(jnp.int16)
    vb = jax.lax.bitcast_convert_type(vq, jnp.uint8).reshape(-1)
    n = sl(normals, 0, rows, 0)
    nq = jnp.clip(jnp.round(n * 127.0), -127, 127).astype(jnp.int8)
    nb_ = jax.lax.bitcast_convert_type(nq, jnp.uint8).reshape(-1)
    parts = [vb, nb_]
    if with_colors:
        c = sl(colors, 0, rows, 0)
        parts.append(jnp.clip(jnp.round(c * 255.0), 0, 255)
                     .astype(jnp.uint8).reshape(-1))
    return jnp.concatenate(parts)


def unpack_mesh_delivery(buf, rows: int, with_colors: bool):
    """Host-side inverse of :func:`pack_mesh_delivery` (numpy)."""
    buf = np.asarray(buf)
    v = buf[:rows * 6].view(np.int16).reshape(rows, 3).astype(np.float32)
    v *= 1e-3
    n = buf[rows * 6:rows * 9].view(np.int8).reshape(rows, 3)
    n = n.astype(np.float32) / 127.0
    if with_colors:
        c = buf[rows * 9:rows * 12].reshape(rows, 3).astype(np.float32)
        c /= 255.0
    else:
        c = np.full((rows, 3), 0.5, np.float32)
    return v, n, c


@functools.lru_cache(maxsize=8)
def _intra_np_cached(V):
    r = np.arange(V)
    ii, jj, kk = np.meshgrid(r, r, r, indexing="ij")
    return np.stack([ii, jj, kk], -1).reshape(-1, 3).astype(np.int32)


def _intra_np(V):
    return jnp.asarray(_intra_np_cached(V))
