"""Voxgraph-style submap → global-map TSDF fusion.

Rebuilds ``DenseTSDF.fuse_submaps_kernel`` + ``fuse_with_interploation``
(/root/reference/taichi_slam/mapping/dense_tsdf.py:272-318): every observed
submap voxel is transformed through its submap base pose and splatted into
the surrounding global voxels with trilinear weights. The reference iterates
the 8 cube corners but **skips the (0,0,0) corner** (``di+dj+dk != 0``,
dense_tsdf.py:300) — a quirk we replicate for fidelity.

The weighted merge is associative, so the sequential atomic updates become
one scatter-add of (Σw, Σw·tsdf, Σw·color, Σocc) + a closed-form combine.
Sources are compacted at *block* granularity first (``max_fuse_blocks``
observed blocks, every voxel a masked lane) so the splat touches
``max_fuse_blocks × V³ × 7`` lanes instead of the whole grid.

``splat_contributions`` / ``apply_contributions`` are split so the
multi-chip path (taichislam_tpu.parallel.multi_drone) can psum the
accumulators over the drone axis before combining.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from taichislam_tpu.core.config import TSDFConfig
from taichislam_tpu.core.compaction import compact_mask
from taichislam_tpu.core.grid import (
    GridState,
    allocate_blocks,
    allocate_from_touched,
    block_origin_voxel,
    flat_voxel_index,
    lookup_slots,
    voxel_to_block_c,
)
from taichislam_tpu.core import geometry
from taichislam_tpu.ops.exports import _intra_offsets_np


class SplatContribs(NamedTuple):
    """Lane count L = 7 * max_fuse_blocks * V^3 (corner-major order);
    sources are every voxel of the compacted observed source blocks, with
    ``ok`` masking the unobserved ones."""
    blin: jax.Array      # (L,) target linear block ids in the global grid
    ok: jax.Array        # (L,) valid mask
    intra: jax.Array     # (L,) intra-block linear voxel index
    w: jax.Array         # (L,) splat weights (w_tsdf * trilinear)
    wd: jax.Array        # (L,) w * tsdf
    occ: jax.Array       # (L,) int32 occupancy counts
    wc: jax.Array        # (3, L) w * color, component axis leading
    kept: jax.Array      # () sources used
    dropped: jax.Array   # () sources in blocks beyond capacity


def splat_contributions(sub_cfg: TSDFConfig, glob_cfg: TSDFConfig,
                        max_fuse_blocks: int, sub_state: GridState,
                        base_R, base_T, only_submap=None) -> SplatContribs:
    """Two-level source selection + component arrays, both TPU-layout
    driven: (a) stacked (..., 3)/(..., 7) intermediates pad their minor dim
    to 128 lanes (the original (nb*V^3, 3) world-xyz array materialized
    2 GB padded); (b) per-voxel stream compaction over the whole grid costs
    ~10 ns per *input* lane in XLA's scatter, ~40 ms at 1024 blocks. So:
    compact observed *blocks* (an nb-lane prefix sum), slice-gather their
    rows, and splat every voxel of the gathered blocks with an `ok` mask —
    masked lanes are absorbed by the sorted Pallas reduction (or the
    mode="drop" scatters on the XLA path). Measured on v5e: full-submap
    fuse (113 blocks, 176k sources) 123 ms -> 15.7 ms at bcap=128."""
    spec = sub_cfg.grid
    gspec = glob_cfg.grid
    ch = sub_state.channels
    V3 = spec.voxels_per_block
    bcap = max(1, min(spec.max_blocks, max_fuse_blocks))

    obs_full = ch["TSDF_observed"] > 0                  # (nb, V^3)
    blk_ok = sub_state.block_active.at[-1].set(False)
    if only_submap is not None:
        # incremental mode: sources restricted to ONE submap (traced; the
        # weighted merge is associative, so splatting submaps one at a
        # time into a non-reset global equals reset + refuse-all)
        blk_ok &= (only_submap < 0) | \
            (sub_state.block_coords[:, 0] == only_submap)
    blk_has = blk_ok & jnp.any(obs_full, axis=1)
    total = jnp.sum((obs_full & blk_ok[:, None]).astype(jnp.int32))

    bpos, bkept, btotal = compact_mask(blk_has, bcap)
    nb = spec.max_blocks + 1
    slot_of = jnp.full((bcap + 1,), nb - 1, jnp.int32).at[bpos].set(
        jnp.arange(nb, dtype=jnp.int32), mode="drop")[:bcap]
    bvalid = jnp.arange(bcap) < bkept

    def grow(arr):
        return jnp.take(arr, slot_of, axis=0)           # (bcap, ...)

    src_valid = (grow(obs_full) & bvalid[:, None]).reshape(-1)
    src_tsdf = grow(ch["TSDF"]).astype(jnp.float32).reshape(-1)
    src_w = grow(ch["W_TSDF"]).astype(jnp.float32).reshape(-1)
    src_occ = grow(ch["occupy"]).astype(jnp.int32).reshape(-1)
    kept = jnp.sum(src_valid.astype(jnp.int32))

    # per-voxel signed ijk, componentwise: block origin + intra offset
    coords_c = grow(sub_state.block_coords)             # (bcap, 4)
    base = block_origin_voxel(spec, coords_c)           # (bcap, 3)
    intra_np = _intra_offsets_np(spec.V)                # (V^3, 3) numpy
    src_i = [(base[:, a:a + 1] + jnp.asarray(intra_np[:, a])[None, :]
              ).astype(jnp.float32).reshape(-1) for a in range(3)]
    src_s = jnp.repeat(coords_c[:, 0], V3)

    # submap-local center -> world (submap_i_j_k_to_xyz,
    # mapping_common.py:229-232), componentwise through the base pose
    s = jnp.clip(src_s, 0, base_R.shape[0] - 1)
    lx = src_i[0] * spec.voxel_scale
    ly = src_i[1] * spec.voxel_scale
    lz = src_i[2] * spec.voxel_scale
    gf = []
    inv_gv = 1.0 / glob_cfg.voxel_scale
    for a in range(3):
        wa = (jnp.take(base_R[:, a, 0], s) * lx +
              jnp.take(base_R[:, a, 1], s) * ly +
              jnp.take(base_R[:, a, 2], s) * lz + jnp.take(base_T[:, a], s))
        gf.append(wa * inv_gv)
    low = [jnp.floor(g).astype(jnp.int32) for g in gf]
    fr = [g - l.astype(jnp.float32) for g, l in zip(gf, low)]

    # 7 trilinear corners as a static loop of (C,) lanes (the (0,0,0)
    # corner is skipped per the reference quirk, dense_tsdf.py:300)
    blin_l, intra_l, ok_l, w_l, wd_l, occ_l = [], [], [], [], [], []
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                if di + dj + dk == 0:
                    continue
                wgt = ((fr[0] if di else 1.0 - fr[0]) *
                       (fr[1] if dj else 1.0 - fr[1]) *
                       (fr[2] if dk else 1.0 - fr[2]))
                wgt = jnp.where(src_valid, wgt, 0.0)
                blin, intra, inb = voxel_to_block_c(
                    gspec, jnp.int32(0), low[0] + di, low[1] + dj,
                    low[2] + dk)
                ok = src_valid & inb & (wgt > 0)
                w = jnp.where(ok, wgt * src_w, 0.0)
                blin_l.append(blin)
                intra_l.append(intra)
                ok_l.append(ok)
                w_l.append(w)
                wd_l.append(w * src_tsdf)
                occ_l.append(jnp.where(ok, src_occ, 0))

    okf = jnp.concatenate(ok_l)
    w_splat = jnp.concatenate(w_l)
    if sub_cfg.texture_enabled:
        colg = grow(ch["color"]).astype(jnp.float32)        # (bcap, 3, V3)
        # (3, L) with the component axis leading (minor-dim-3 arrays pad
        # to 128 lanes); w is already zero on masked lanes
        wc_splat = jnp.stack(
            [w_splat * jnp.tile(colg[:, a, :].reshape(-1), 7)
             for a in range(3)], axis=0)
    else:
        wc_splat = jnp.zeros((3, bcap * V3 * 7), jnp.float32)

    return SplatContribs(
        blin=jnp.concatenate(blin_l), ok=okf,
        intra=jnp.concatenate(intra_l), w=w_splat,
        wd=jnp.concatenate(wd_l), occ=jnp.concatenate(occ_l),
        wc=wc_splat, kept=kept, dropped=total - kept)


def accumulate_dense(glob_cfg: TSDFConfig, global_state: GridState,
                     c: SplatContribs):
    """Scatter contributions into dense per-voxel accumulators + a touched
    table bitmap (these are what the multi-chip path psums)."""
    gspec = glob_cfg.grid
    touched = jnp.zeros((gspec.table_size,), bool).at[
        jnp.where(c.ok, c.blin, gspec.table_size)].set(True, mode="drop")
    # slots may not exist yet; the caller allocates from `touched` first and
    # then calls `scatter_accumulators`.
    return touched


def scatter_accumulators(glob_cfg: TSDFConfig, global_state: GridState,
                         c: SplatContribs):
    gspec = glob_cfg.grid
    nvox = (gspec.max_blocks + 1) * gspec.voxels_per_block
    slots = lookup_slots(gspec, global_state.table, c.blin)
    flat = flat_voxel_index(gspec, slots, c.intra)
    flat = jnp.where(c.ok, flat, nvox - 1)
    w_sum = jnp.zeros((nvox,), jnp.float32).at[flat].add(c.w)
    wd_sum = jnp.zeros((nvox,), jnp.float32).at[flat].add(c.wd)
    occ_sum = jnp.zeros((nvox,), jnp.int32).at[flat].add(c.occ)
    # componentwise flat scatters (a windowed (L, 3) scatter is ~8x slower)
    wc_sum = jnp.stack(
        [jnp.zeros((nvox,), jnp.float32).at[flat].add(c.wc[a])
         for a in range(3)], axis=0)
    return w_sum, wd_sum, occ_sum, wc_sum


def combine_accumulators(glob_cfg: TSDFConfig, global_state: GridState,
                         w_sum, wd_sum, occ_sum, wc_sum) -> GridState:
    """Closed-form weighted merge (fuse_with_interploation semantics,
    dense_tsdf.py:272-280 — note: no Wmax clamp there)."""
    gspec = glob_cfg.grid
    nvox = (gspec.max_blocks + 1) * gspec.voxels_per_block
    gch = dict(global_state.channels)
    D = gch["TSDF"].reshape(nvox).astype(jnp.float32)
    W = gch["W_TSDF"].reshape(nvox).astype(jnp.float32)
    touched = w_sum > 0
    new_D = jnp.where(touched, (D * W + wd_sum) / (W + w_sum), D)
    new_W = W + w_sum
    gch["TSDF"] = new_D.astype(glob_cfg.dtype).reshape(gch["TSDF"].shape)
    gch["W_TSDF"] = new_W.astype(glob_cfg.dtype).reshape(gch["W_TSDF"].shape)
    obs_g = gch["TSDF_observed"].reshape(nvox)
    gch["TSDF_observed"] = jnp.maximum(
        obs_g, touched.astype(jnp.int8)).reshape(gch["TSDF_observed"].shape)
    occ_g = gch["occupy"].reshape(nvox).astype(jnp.int32) + occ_sum
    gch["occupy"] = occ_g.astype(jnp.int8).reshape(gch["occupy"].shape)
    if glob_cfg.texture_enabled:
        nb = gspec.max_blocks + 1
        V3 = gspec.voxels_per_block
        col = gch["color"]                                   # (nb, 3, V3)
        den = jnp.maximum(new_W, 1e-20)
        for a in range(3):
            c_a = col[:, a, :].reshape(nvox).astype(jnp.float32)
            new_a = jnp.where(touched, (c_a * W + wc_sum[a]) / den, c_a)
            col = col.at[:, a, :].set(
                new_a.astype(glob_cfg.dtype).reshape(nb, V3))
        gch["color"] = col
    for k in gch:
        gch[k] = gch[k].at[-1].set(jnp.zeros_like(gch[k][-1]))
    return global_state._replace(channels=gch)


def _use_pallas_fusion(glob_cfg: TSDFConfig) -> bool:
    from taichislam_tpu.ops.pallas.seg_accum import SENTINEL_BLOCK
    gspec = glob_cfg.grid
    if glob_cfg.pallas_accum == "off":
        return False
    if gspec.voxels_per_block % 128 != 0:
        return False
    if gspec.num_submaps * gspec.blocks_per_submap >= SENTINEL_BLOCK:
        return False
    if glob_cfg.pallas_accum == "on":
        return True
    return jax.default_backend() == "tpu"


@partial(jax.jit, static_argnums=(0, 1, 2))
def fuse_submaps(sub_cfg: TSDFConfig, glob_cfg: TSDFConfig,
                 max_fuse_blocks: int, global_state: GridState,
                 sub_state: GridState, base_R, base_T, only_submap=None):
    """Fuse ALL submaps (local + remote) into the global map — or, with
    ``only_submap >= 0`` (traced), just that submap's blocks into the
    EXISTING global map (incremental voxgraph mode: the weighted merge is
    associative, so one-splat-per-finished-submap equals the reference's
    reset + refuse-all, dense_tsdf.py:312-318, as long as base poses are
    unchanged — a PGO update requires the full refuse). The caller resets
    the global map first in full mode. Returns (global_state, stats).

    On TPU the splat accumulation runs through the Pallas sorted
    segmented-reduce kernel (one tile per touched global block) instead of
    4 per-lane scatters; ``fuse_tiles_dropped`` reports touched-capacity
    overflow so the caller can grow ``glob_cfg.max_touched_blocks`` and redo.
    """
    c = splat_contributions(sub_cfg, glob_cfg, max_fuse_blocks, sub_state,
                            base_R, base_T, only_submap=only_submap)
    gspec = glob_cfg.grid
    tiles_dropped = jnp.int32(0)

    if _use_pallas_fusion(glob_cfg):
        from taichislam_tpu.ops.pallas.seg_accum import (
            SENTINEL_BLOCK, segmented_block_reduce)
        V3 = gspec.voxels_per_block
        bkey = jnp.where(c.ok, c.blin, SENTINEL_BLOCK)
        occ_f = c.occ.astype(jnp.float32)
        vals = (c.w, c.wd, occ_f)
        if glob_cfg.texture_enabled:
            vals = vals + (c.wc[0], c.wc[1], c.wc[2])
        touched, acc, n_touched, _ = segmented_block_reduce(
            bkey, jnp.where(c.ok, c.intra, 0), vals, V3,
            glob_cfg.max_touched_blocks,
            interpret=(jax.default_backend() != "tpu"),
            max_bkey=gspec.num_submaps * gspec.blocks_per_submap)
        tiles_dropped = jnp.maximum(
            n_touched - glob_cfg.max_touched_blocks, 0)

        row_ok = touched >= 0
        global_state = allocate_blocks(gspec, global_state,
                                       jnp.where(row_ok, touched, -1),
                                       row_ok, jnp.int32(0))
        slots = lookup_slots(gspec, global_state.table,
                             jnp.where(row_ok, touched, -1))
        w_sum = jnp.where(row_ok[:, None], acc[:, 0, :], 0.0)
        wd_sum = jnp.where(row_ok[:, None], acc[:, 1, :], 0.0)
        occ_sum = jnp.where(row_ok[:, None], acc[:, 2, :], 0.0)

        gch = dict(global_state.channels)
        D = jnp.take(gch["TSDF"].reshape(-1, V3), slots,
                     axis=0).astype(jnp.float32)
        W = jnp.take(gch["W_TSDF"].reshape(-1, V3), slots,
                     axis=0).astype(jnp.float32)
        touched_v = w_sum > 0
        new_D = jnp.where(touched_v, (D * W + wd_sum) / (W + w_sum), D)
        new_W = W + w_sum  # no Wmax clamp (dense_tsdf.py:272-280)
        tgt = jnp.where(row_ok, slots, gspec.max_blocks)
        gch["TSDF"] = gch["TSDF"].reshape(-1, V3).at[tgt].set(
            new_D.astype(glob_cfg.dtype), mode="drop").reshape(
            gch["TSDF"].shape)
        gch["W_TSDF"] = gch["W_TSDF"].reshape(-1, V3).at[tgt].set(
            new_W.astype(glob_cfg.dtype), mode="drop").reshape(
            gch["W_TSDF"].shape)
        obs = jnp.take(gch["TSDF_observed"].reshape(-1, V3), slots, axis=0)
        gch["TSDF_observed"] = gch["TSDF_observed"].reshape(-1, V3).at[
            tgt].set(jnp.maximum(obs, touched_v.astype(jnp.int8)),
                     mode="drop").reshape(gch["TSDF_observed"].shape)
        occ_old = jnp.take(gch["occupy"].reshape(-1, V3), slots,
                           axis=0).astype(jnp.int32)
        gch["occupy"] = gch["occupy"].reshape(-1, V3).at[tgt].set(
            (occ_old + occ_sum.astype(jnp.int32)).astype(jnp.int8),
            mode="drop").reshape(gch["occupy"].shape)
        if glob_cfg.texture_enabled:
            # same weighted merge as combine_accumulators, on touched rows
            col2 = gch["color"].reshape(-1, V3)  # rows = slot * 3 + comp
            den = jnp.maximum(new_W, 1e-20)
            for a in range(3):
                wc_a = jnp.where(row_ok[:, None], acc[:, 3 + a, :], 0.0)
                rows_a = jnp.take(col2, slots * 3 + a,
                                  axis=0).astype(jnp.float32)
                new_a = jnp.where(touched_v, (rows_a * W + wc_a) / den,
                                  rows_a)
                tgt_a = jnp.where(row_ok, slots * 3 + a, col2.shape[0])
                col2 = col2.at[tgt_a].set(new_a.astype(glob_cfg.dtype),
                                          mode="drop")
            gch["color"] = col2.reshape(gch["color"].shape)
        for k in gch:
            gch[k] = gch[k].at[-1].set(jnp.zeros_like(gch[k][-1]))
        global_state = global_state._replace(channels=gch)
    else:
        touched = accumulate_dense(glob_cfg, global_state, c)
        global_state = allocate_from_touched(glob_cfg.grid, global_state,
                                             touched, jnp.int32(0))
        w_sum, wd_sum, occ_sum, wc_sum = scatter_accumulators(
            glob_cfg, global_state, c)
        global_state = combine_accumulators(glob_cfg, global_state, w_sum,
                                            wd_sum, occ_sum, wc_sum)
    stats = {"fuse_sources": c.kept, "fuse_dropped": c.dropped,
             "fuse_tiles_dropped": tiles_dropped}
    return global_state, stats
