"""Export / compaction ops: surface voxels, slices, sparse serialization.

Rebuilds the reference's atomic-append export kernels
(/root/reference/taichi_slam/mapping/dense_tsdf.py:339-404, 412-454) as
masked prefix-sum compactions (deterministic, linear-index order).

All exports are two-level: candidate **blocks** are compacted first (an
nb-sized prefix sum — trivial), then the per-voxel compaction runs over the
gathered ``block_cap × V³`` lanes instead of the whole allocated grid —
scatter cost on TPU is per candidate lane, so this scales exports with the
surface instead of the map.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from taichislam_tpu.core.config import GridSpec, TSDFConfig
from taichislam_tpu.core.colormap import color_from_colormap
from taichislam_tpu.core.compaction import compact_mask, compact_sort
from taichislam_tpu.core.grid import GridState, block_origin_voxel


@functools.lru_cache(maxsize=8)
def _intra_offsets_np(V: int):
    r = np.arange(V)
    ii, jj, kk = np.meshgrid(r, r, r, indexing="ij")
    return np.stack([ii, jj, kk], -1).reshape(-1, 3).astype(np.int32)


def _intra_offsets(V: int):
    # numpy cached, converted per call — caching a jnp array here would leak
    # a tracer when first materialized inside a jit trace
    return jnp.asarray(_intra_offsets_np(V))


def voxel_ijk_all(spec: GridSpec, state: GridState):
    """Signed voxel index of every (slot, voxel): (nb, V^3, 3)."""
    base = block_origin_voxel(spec, state.block_coords)  # (nb, 3)
    return base[:, None, :] + _intra_offsets(spec.V)[None, :, :]


def voxel_xyz_all(spec: GridSpec, state: GridState, base_R, base_T,
                  is_global: bool):
    """World position of every voxel center.

    Mirrors ``submap_i_j_k_to_xyz`` (mapping_common.py:229-232): rotate the
    submap-local center through the per-submap base pose; the global map uses
    identity (``i_j_k_to_xyz``, dense_tsdf.py:352-355).
    """
    ijk = voxel_ijk_all(spec, state)                      # (nb, V^3, 3)
    local = ijk.astype(jnp.float32) * spec.voxel_scale
    if is_global:
        return local
    s = jnp.clip(state.block_coords[:, 0], 0, base_R.shape[0] - 1)
    R = jnp.take(base_R, s, axis=0)                       # (nb, 3, 3)
    T = jnp.take(base_T, s, axis=0)                       # (nb, 3)
    return jnp.einsum("bij,bvj->bvi", R, local) + T[:, None, :]


def _active_voxel_mask(spec: GridSpec, state: GridState, active_submap,
                       require_submap=True):
    blk = state.block_active & (state.block_coords[:, 0] == active_submap) \
        if require_submap else state.block_active
    blk = blk.at[-1].set(False)
    return jnp.broadcast_to(blk[:, None],
                            (blk.shape[0], spec.voxels_per_block))


def _compact_blocks(spec: GridSpec, vox_mask, block_cap: int):
    """Compact blocks containing any set voxel of ``vox_mask`` (nb, V³).

    Returns (slot_of (cap,), bvalid (cap,), kept, dropped): ``slot_of`` maps
    compacted position -> storage slot (garbage slot for padding)."""
    nb = vox_mask.shape[0]
    blk_has = jnp.any(vox_mask, axis=1)
    bpos, bkept, btotal = compact_mask(blk_has, block_cap)
    slot_of = jnp.full((block_cap + 1,), nb - 1, jnp.int32).at[bpos].set(
        jnp.arange(nb, dtype=jnp.int32), mode="drop")[:block_cap]
    bvalid = jnp.arange(block_cap) < bkept
    return slot_of, bvalid, bkept, jnp.maximum(btotal - block_cap, 0)


def _gathered_xyz(spec, state, slot_of, base_R, base_T, is_global):
    coords = jnp.take(state.block_coords, slot_of, axis=0)      # (cap, 4)
    origin = block_origin_voxel(spec, coords)                   # (cap, 3)
    ijk = origin[:, None, :] + _intra_offsets(spec.V)[None]     # (cap,V³,3)
    local = ijk.astype(jnp.float32) * spec.voxel_scale
    if is_global:
        return ijk, local
    s = jnp.clip(coords[:, 0], 0, base_R.shape[0] - 1)
    R = jnp.take(base_R, s, axis=0)
    T = jnp.take(base_T, s, axis=0)
    return ijk, jnp.einsum("bij,bvj->bvi", R, local) + T[:, None, :]


def _gathered_ijk_c(spec, state, slot_of):
    """Compacted per-voxel signed ijk as component arrays: (coords (cap,4),
    [ix, iy, iz] each (cap, V³) int32). Component form on purpose: a
    stacked (cap, V³, 3) array pads its minor dim 3 -> 128 lanes on TPU."""
    coords = jnp.take(state.block_coords, slot_of, axis=0)      # (cap, 4)
    origin = block_origin_voxel(spec, coords)                   # (cap, 3)
    off = _intra_offsets_np(spec.V)
    comps = [origin[:, a:a + 1] + jnp.asarray(off[:, a])[None, :]
             for a in range(3)]
    return coords, comps


def _gathered_xyz_c(spec, coords, ijk_c, base_R, base_T, is_global):
    """World xyz components of the compacted voxels (componentwise
    submap_i_j_k_to_xyz, mapping_common.py:229-232)."""
    loc = [c.astype(jnp.float32) * spec.voxel_scale for c in ijk_c]
    if is_global:
        return loc
    s = jnp.clip(coords[:, 0], 0, base_R.shape[0] - 1)          # (cap,)
    out = []
    for a in range(3):
        out.append(jnp.take(base_R[:, a, 0], s)[:, None] * loc[0] +
                   jnp.take(base_R[:, a, 1], s)[:, None] * loc[1] +
                   jnp.take(base_R[:, a, 2], s)[:, None] * loc[2] +
                   jnp.take(base_T[:, a], s)[:, None])
    return out


@partial(jax.jit, static_argnums=(0, 1, 2))
def tsdf_surface_export(cfg: TSDFConfig, capacity: int, block_cap: int,
                        state: GridState, base_R, base_T, active_submap):
    """cvt_TSDF_surface_to_voxels (dense_tsdf.py:339-365).

    Returns (x, y, z, cr, cg, cb, tsdf — each (capacity,) — and count);
    survivors are compacted to the front (linear-index order), so the
    appending ``*_to`` variant (dense_tsdf.py:327-329) is a host-side
    slice copy. Component outputs (the host stacks them) and a sort-based
    compaction keep every intermediate free of minor-dim padding and
    per-lane scatter costs; ``block_cap`` is bucketed by the caller from
    the allocated block count.
    """
    from taichislam_tpu.core.compaction import compact_sort

    spec = cfg.grid
    ch = state.channels
    nb = spec.max_blocks + 1
    V3 = spec.voxels_per_block

    obs = ch["TSDF_observed"].reshape(nb, V3) == 1
    tsdf_full = ch["TSDF"].reshape(nb, V3).astype(jnp.float32)
    pre_mask = _active_voxel_mask(spec, state, active_submap) & obs & \
        (jnp.abs(tsdf_full) < cfg.tsdf_surface_thres)

    slot_of, bvalid, _, _ = _compact_blocks(spec, pre_mask, block_cap)
    coords, ijk_c = _gathered_ijk_c(spec, state, slot_of)
    x, y, z = _gathered_xyz_c(spec, coords, ijk_c, base_R, base_T,
                              cfg.is_global_map)
    mask = jnp.take(pre_mask, slot_of, axis=0) & bvalid[:, None]
    mask &= (z <= cfg.disp_ceiling) & (z >= cfg.disp_floor)
    tsdf = jnp.take(tsdf_full, slot_of, axis=0)

    ops = [x.reshape(-1), y.reshape(-1), z.reshape(-1), tsdf.reshape(-1)]
    fills = [-100000.0, -100000.0, -100000.0, 0.0]
    if cfg.texture_enabled:
        colg = jnp.take(ch["color"], slot_of, axis=0)   # (cap, 3, V^3)
        ops += [colg[:, a, :].reshape(-1).astype(jnp.float32)
                for a in range(3)]
        fills += [0.5, 0.5, 0.5]
    outs, kept, total = compact_sort(mask.reshape(-1), capacity, ops, fills)
    if cfg.texture_enabled:
        col = jnp.stack(outs[4:7], axis=-1)
    else:
        # colormap on the (capacity,)-sized output, not the input lanes
        col = color_from_colormap(outs[2], cfg.disp_floor, cfg.disp_ceiling)
        col = jnp.where((jnp.arange(capacity) < kept)[:, None], col, 0.5)
    return outs[0], outs[1], outs[2], col, outs[3], kept


@partial(jax.jit, static_argnums=(0, 1, 2))
def tsdf_slice_export(cfg: TSDFConfig, capacity: int, block_cap: int,
                      state: GridState, base_R, base_T, active_submap,
                      z, dz):
    """cvt_TSDF_to_voxels_slice (dense_tsdf.py:367-389): voxels whose signed
    z-index k satisfies ``_index - dz < k < _index + dz`` with
    ``_index = int(z/voxel)``; colors = jet(TSDF in [-0.5, 0.5])."""
    from taichislam_tpu.core.compaction import compact_sort

    spec = cfg.grid
    ch = state.channels
    nb = spec.max_blocks + 1
    V3 = spec.voxels_per_block
    obs = ch["TSDF_observed"].reshape(nb, V3) > 0
    base = block_origin_voxel(spec, state.block_coords)         # (nb, 3)
    kidx = (base[:, 2:3] + jnp.asarray(_intra_offsets_np(spec.V)[:, 2])
            [None, :]).astype(jnp.float32)                      # (nb, V³)
    zindex = jnp.trunc(z / cfg.voxel_scale)
    pre_mask = _active_voxel_mask(spec, state, active_submap) & obs
    pre_mask &= (kidx > zindex - dz) & (kidx < zindex + dz)

    slot_of, bvalid, _, _ = _compact_blocks(spec, pre_mask, block_cap)
    coords, ijk_c = _gathered_ijk_c(spec, state, slot_of)
    x, y, zc = _gathered_xyz_c(spec, coords, ijk_c, base_R, base_T,
                               cfg.is_global_map)
    mask = jnp.take(pre_mask, slot_of, axis=0) & bvalid[:, None]
    tsdf = jnp.take(ch["TSDF"].reshape(nb, V3), slot_of,
                    axis=0).astype(jnp.float32)

    outs, kept, _ = compact_sort(
        mask.reshape(-1), capacity,
        [x.reshape(-1), y.reshape(-1), zc.reshape(-1), tsdf.reshape(-1)],
        [-100000.0, -100000.0, -100000.0, 0.0])
    col = color_from_colormap(outs[3], -0.5, 0.5)
    col = jnp.where((jnp.arange(capacity) < kept)[:, None], col, 0.5)
    return outs[0], outs[1], outs[2], outs[3], col, kept


@partial(jax.jit, static_argnums=(0,))
def count_active(cfg: TSDFConfig, state: GridState, active_submap):
    """count_active (dense_tsdf.py:412-423): observed voxels in the active
    submap."""
    spec = cfg.grid
    nb = spec.max_blocks + 1
    obs = state.channels["TSDF_observed"].reshape(nb, -1) > 0
    mask = _active_voxel_mask(spec, state, active_submap) & obs
    return jnp.sum(mask.astype(jnp.int32))


@partial(jax.jit, static_argnums=(0, 1, 2))
def sparse_gather(cfg: TSDFConfig, capacity: int, block_cap: int,
                  state: GridState, active_submap):
    """to_numpy (dense_tsdf.py:425-440): gather the active submap's observed
    voxels as (indices, TSDF, W_TSDF, occupy, color) with static capacity.
    The host slices the result to the true count. ``block_cap`` must cover
    the allocated block count (serialization is exhaustive); the caller
    buckets it from ``state.num_blocks``."""
    from taichislam_tpu.core.compaction import compact_sort

    spec = cfg.grid
    ch = state.channels
    nb = spec.max_blocks + 1
    V3 = spec.voxels_per_block
    obs = ch["TSDF_observed"].reshape(nb, V3) > 0
    pre_mask = _active_voxel_mask(spec, state, active_submap) & obs

    slot_of, bvalid, _, _ = _compact_blocks(spec, pre_mask, block_cap)
    coords, ijk_c = _gathered_ijk_c(spec, state, slot_of)
    mask = jnp.take(pre_mask, slot_of, axis=0) & bvalid[:, None]

    def g(channel, extra=()):
        return jnp.take(channel.reshape((nb, V3) + extra), slot_of, axis=0)

    ops = [c.reshape(-1) for c in ijk_c] + [
        g(ch["TSDF"]).reshape(-1).astype(jnp.float32),
        g(ch["W_TSDF"]).reshape(-1).astype(jnp.float32),
        g(ch["occupy"]).reshape(-1)]
    fills = [0, 0, 0, 0.0, 0.0, 0]
    if cfg.texture_enabled:
        colg = jnp.take(ch["color"], slot_of, axis=0)   # (cap, 3, V^3)
        ops += [colg[:, a, :].reshape(-1).astype(jnp.float32)
                for a in range(3)]
        fills += [0.0, 0.0, 0.0]
    outs, kept, total = compact_sort(mask.reshape(-1), capacity, ops, fills)
    out_idx = jnp.stack(outs[0:3], axis=-1)
    out_col = jnp.stack(outs[6:9], axis=-1) if cfg.texture_enabled else \
        jnp.zeros((0, 3), jnp.float32)
    return (out_idx, outs[3], outs[4], outs[5].astype(jnp.int8), out_col,
            kept, total)


@partial(jax.jit, static_argnums=(0, 1, 2))
def sparse_gather_packed(cfg: TSDFConfig, capacity: int, block_cap: int,
                         state: GridState, active_submap):
    """:func:`sparse_gather` packed into ONE u8 wire buffer for a single
    host fetch, already at the submap wire dtypes (export_submap's
    schema, dense_tsdf.py:462-476: i16 indices, f16 TSDF/W_TSDF/color,
    i8 occupy — 11 or 17 bytes/voxel instead of 24/36 across five f32
    fetches). Layout: [4B kept i32 | cap*6 idx | cap*2 tsdf | cap*2 w |
    cap occ | cap*6 color if textured]. Decode with
    :func:`unpack_sparse_delivery`."""
    idx, tsdf, w, occ, col, kept, total = sparse_gather(
        cfg, capacity, block_cap, state, active_submap)
    bc = jax.lax.bitcast_convert_type
    parts = [
        bc(jnp.stack([kept, total]), jnp.uint8).reshape(-1),
        bc(jnp.clip(idx, -32767, 32767).astype(jnp.int16),
           jnp.uint8).reshape(-1),
        bc(tsdf.astype(jnp.float16), jnp.uint8).reshape(-1),
        bc(w.astype(jnp.float16), jnp.uint8).reshape(-1),
        bc(occ, jnp.uint8).reshape(-1),
    ]
    if cfg.texture_enabled:
        parts.append(bc(col.astype(jnp.float16), jnp.uint8).reshape(-1))
    return jnp.concatenate(parts)


@partial(jax.jit, static_argnums=(0, 1, 2))
def bitmap_gather_packed(cfg: TSDFConfig, lane_cap: int, block_cap: int,
                         state: GridState, active_submap):
    """Bitmap-compact packed submap delivery: block origins + per-block
    observed bitmap + per-voxel value planes compacted to the observed
    voxels only, in bitmap (block-major, voxel-linear) order. The voxel
    coordinates ride for free in the bitmap, so this is ~5.1 B per
    observed voxel (f16 TSDF + f16 W + i8 occupy + bitmap/8 + origins)
    vs :func:`sparse_gather_packed`'s 11 — finished submap blocks here
    are ~40%% observed, so a block-dense plane layout loses and a
    per-voxel one with explicit i16 indices pays 6 B/voxel for what the
    bitmap encodes in ~0.3. Layout (little-endian):

    ``[16B: kept_blocks, total_blocks, kept_vox, total_vox i32]
    [block_cap*6: block origin voxel i16 x3]
    [block_cap*V3/8: observed bitmap u8, voxel-linear, LSB-first]
    [lane_cap*2: TSDF f16] [lane_cap*2: W_TSDF f16] [lane_cap: occupy i8]
    [lane_cap*6: color f16 x3, if textured]``

    ``total_*`` > the respective cap signals truncation; the caller
    re-gathers with grown caps. Decode with :func:`unpack_bitmap_packed`
    (numpy). Serves the async voxgraph finalize (same content as the
    reference's export wire, dense_tsdf.py:462-476)."""
    spec = cfg.grid
    nb = spec.max_blocks + 1
    V3 = spec.voxels_per_block
    ch = state.channels
    obs = ch["TSDF_observed"].reshape(nb, V3) > 0
    pre_mask = _active_voxel_mask(spec, state, active_submap) & obs
    slot_of, bvalid, bkept, bdropped = _compact_blocks(spec, pre_mask,
                                                       block_cap)
    coords = jnp.take(state.block_coords, slot_of, axis=0)
    origin = jnp.where(bvalid[:, None],
                       block_origin_voxel(spec, coords), 0)
    mask = jnp.take(pre_mask, slot_of, axis=0) & bvalid[:, None]
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.int32)
    bitmap = jnp.sum(mask.reshape(block_cap, V3 // 8, 8).astype(jnp.int32)
                     * weights, axis=-1).astype(jnp.uint8)

    def plane(name):
        return jnp.take(ch[name].reshape(nb, V3), slot_of, axis=0)

    bc = jax.lax.bitcast_convert_type
    # one stable mask-key sort compacts every plane at once; values pack
    # into a single u32 lane (f16 tsdf | f16 w) + an occupancy lane so the
    # sort moves 8 bytes/lane, preserving bitmap order
    tw = (bc(plane("TSDF").astype(jnp.float16), jnp.uint16)
          .astype(jnp.uint32) |
          (bc(plane("W_TSDF").astype(jnp.float16), jnp.uint16)
           .astype(jnp.uint32) << 16))
    ops = [tw.reshape(-1), plane("occupy").astype(jnp.int32).reshape(-1)]
    fills = [0, 0]
    if cfg.texture_enabled:
        colg = jnp.take(ch["color"], slot_of, axis=0)       # (cap, 3, V3)
        c16 = bc(colg.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)
        ops += [(c16[:, 0] | (c16[:, 1] << 16)).reshape(-1),
                c16[:, 2].reshape(-1)]
        fills += [0, 0]
    outs, vkept, vtotal = compact_sort(mask.reshape(-1), lane_cap, ops,
                                       fills)
    parts = [
        bc(jnp.stack([bkept, bkept + bdropped, vkept, vtotal])
           .astype(jnp.int32), jnp.uint8).reshape(-1),
        bc(jnp.clip(origin, -32767, 32767).astype(jnp.int16),
           jnp.uint8).reshape(-1),
        bitmap.reshape(-1),
        bc(outs[0].astype(jnp.uint32), jnp.uint8).reshape(-1),
        bc(outs[1].astype(jnp.int8), jnp.uint8).reshape(-1),
    ]
    if cfg.texture_enabled:
        parts += [bc(outs[2].astype(jnp.uint32), jnp.uint8).reshape(-1),
                  bc(outs[3].astype(jnp.uint16), jnp.uint8).reshape(-1)]
    return jnp.concatenate(parts)


def unpack_bitmap_packed(buf, lane_cap: int, block_cap: int, V: int,
                         with_color: bool):
    """Host-side inverse of :func:`bitmap_gather_packed` (numpy views):
    rebuilds the per-voxel (indices i16 (n,3), tsdf f16, w f16, occ i8,
    color) arrays of the submap wire schema. Returns
    (..., kept_blocks, total_blocks, kept_vox, total_vox)."""
    buf = np.asarray(buf)
    V3 = V * V * V
    kept_b, total_b, kept_v, total_v = (int(x)
                                        for x in buf[:16].view(np.int32))
    kb = min(kept_b, block_cap)
    kv = min(kept_v, lane_cap)
    o = 16
    origin = buf[o:o + block_cap * 6].view(np.int16).reshape(
        block_cap, 3)[:kb]
    o += block_cap * 6
    bits = np.unpackbits(
        buf[o:o + block_cap * (V3 // 8)].reshape(block_cap, V3 // 8)[:kb],
        axis=1, bitorder="little").astype(bool)            # (kb, V3)
    o += block_cap * (V3 // 8)
    tw = buf[o:o + lane_cap * 4].view(np.uint32)[:kv]
    o += lane_cap * 4
    occ = buf[o:o + lane_cap].view(np.int8)[:kv]
    o += lane_cap
    tsdf = (tw & 0xFFFF).astype(np.uint16).view(np.float16)
    w = (tw >> 16).astype(np.uint16).view(np.float16)
    intra = _intra_offsets_np(V).astype(np.int32)          # (V3, 3)
    idx = (origin[:, None, :].astype(np.int32) +
           intra[None]).reshape(-1, 3)[bits.reshape(-1)][:kv]
    if with_color:
        c01 = buf[o:o + lane_cap * 4].view(np.uint32)[:kv]
        o += lane_cap * 4
        c2 = buf[o:o + lane_cap * 2].view(np.uint16)[:kv]
        col = np.stack([(c01 & 0xFFFF).astype(np.uint16).view(np.float16),
                        (c01 >> 16).astype(np.uint16).view(np.float16),
                        c2.view(np.float16)], axis=-1)
    else:
        col = np.array([])
    return (np.clip(idx, -32767, 32767).astype(np.int16), tsdf, w, occ,
            col, kept_b, total_b, kept_v, total_v)


def unpack_sparse_delivery(buf, capacity: int, with_color: bool):
    """Host-side inverse of :func:`sparse_gather_packed` (numpy views).
    Returns (indices i16 (k,3), tsdf f16 (k,), w f16 (k,), occ i8 (k,),
    color f16 (k,3) or empty, kept, total)."""
    buf = np.asarray(buf)
    kept, total = (int(x) for x in buf[:8].view(np.int32))
    k = min(kept, capacity)
    o = 8
    idx = buf[o:o + capacity * 6].view(np.int16).reshape(capacity, 3)[:k]
    o += capacity * 6
    tsdf = buf[o:o + capacity * 2].view(np.float16)[:k]
    o += capacity * 2
    w = buf[o:o + capacity * 2].view(np.float16)[:k]
    o += capacity * 2
    occ = buf[o:o + capacity].view(np.int8)[:k]
    o += capacity
    if with_color:
        col = buf[o:o + capacity * 6].view(np.float16).reshape(capacity,
                                                               3)[:k]
    else:
        col = np.array([])
    return idx, tsdf, w, occ, col, kept, total


@partial(jax.jit, static_argnums=(0,))
def sparse_scatter(cfg: TSDFConfig, state: GridState, submap_id, indices,
                   tsdf, w_tsdf, occ, color, n_valid):
    """load_numpy (dense_tsdf.py:442-454): scatter (indices, TSDF, W_TSDF,
    occupy[, color]) into submap ``submap_id`` and mark observed. ``indices``
    are signed voxel coords (n, 3), padded to a static size; ``n_valid`` is
    the live prefix length."""
    from taichislam_tpu.core.grid import (
        allocate_blocks, flat_voxel_index, lookup_slots, voxel_to_block)
    spec = cfg.grid
    n = indices.shape[0]
    valid = jnp.arange(n) < n_valid
    s = jnp.broadcast_to(submap_id, (n,))
    blin, intra, inb = voxel_to_block(spec, s, indices.astype(jnp.int32))
    ok = valid & inb
    state = allocate_blocks(spec, state, blin, ok, submap_id)
    slots = lookup_slots(spec, state.table, blin)
    flat = flat_voxel_index(spec, slots, intra)
    nvox = (spec.max_blocks + 1) * spec.voxels_per_block
    flat = jnp.where(ok, flat, nvox - 1)

    ch = dict(state.channels)
    ch["TSDF"] = ch["TSDF"].reshape(nvox).at[flat].set(
        tsdf.astype(cfg.dtype)).reshape(ch["TSDF"].shape)
    ch["W_TSDF"] = ch["W_TSDF"].reshape(nvox).at[flat].set(
        w_tsdf.astype(cfg.dtype)).reshape(ch["W_TSDF"].shape)
    ch["occupy"] = ch["occupy"].reshape(nvox).at[flat].set(
        occ.astype(jnp.int8)).reshape(ch["occupy"].shape)
    ch["TSDF_observed"] = ch["TSDF_observed"].reshape(nvox).at[flat].set(
        jnp.where(ok, 1, 0).astype(jnp.int8)).reshape(
        ch["TSDF_observed"].shape)
    if cfg.texture_enabled:
        from taichislam_tpu.core.grid import comp_flat_index
        colf = ch["color"].reshape(-1)
        for a in range(3):
            idx = comp_flat_index(spec, slots, intra, a)
            idx = jnp.where(ok, idx, colf.shape[0])
            colf = colf.at[idx].set(color[:, a].astype(cfg.dtype),
                                    mode="drop")
        ch["color"] = colf.reshape(ch["color"].shape)
    for k in ch:
        ch[k] = ch[k].at[-1].set(jnp.zeros_like(ch[k][-1]))
    return state._replace(channels=ch)


def pow2_capacity(n: int, lo: int = 1024) -> int:
    """Bucket a dynamic count into a power-of-two static capacity to bound
    the number of jit specializations of the gather ops."""
    c = lo
    while c < n:
        c *= 2
    return c
