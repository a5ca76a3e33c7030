"""Voxgraph-style submap → global-map TSDF fusion.

Rebuilds ``DenseTSDF.fuse_submaps_kernel`` + ``fuse_with_interploation``
(/root/reference/taichi_slam/mapping/dense_tsdf.py:272-318): every observed
submap voxel is transformed through its submap base pose and splatted into
the surrounding global voxels with trilinear weights. The reference iterates
the 8 cube corners but **skips the (0,0,0) corner** (``di+dj+dk != 0``,
dense_tsdf.py:300) — a quirk we replicate for fidelity.

The weighted merge is associative, so the sequential atomic updates become
one scatter-add of (Σw, Σw·tsdf, Σw·color, Σocc) + a closed-form combine.
Sources are compacted to the observed set first so the splat touches
``max_fuse_voxels × 7`` targets instead of the whole grid.

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
    flat_voxel_index,
    lookup_slots,
    voxel_to_block,
)
from taichislam_tpu.core import geometry
from taichislam_tpu.ops.exports import voxel_xyz_all


class SplatContribs(NamedTuple):
    blin: jax.Array      # (C*7,) target linear block ids in the global grid
    ok: jax.Array        # (C*7,) valid mask
    intra: jax.Array     # (C*7,) intra-block linear voxel index
    w: jax.Array         # (C*7,) splat weights (w_tsdf * trilinear)
    wd: jax.Array        # (C*7,) w * tsdf
    occ: jax.Array       # (C*7,) int32 occupancy counts
    wc: jax.Array        # (C*7, 3) w * color
    kept: jax.Array      # () sources used
    dropped: jax.Array   # () sources beyond capacity


def splat_contributions(sub_cfg: TSDFConfig, glob_cfg: TSDFConfig,
                        max_fuse_voxels: int, sub_state: GridState,
                        base_R, base_T) -> SplatContribs:
    spec = sub_cfg.grid
    gspec = glob_cfg.grid
    ch = sub_state.channels

    obs = ch["TSDF_observed"].reshape(-1) > 0
    blk_ok = sub_state.block_active.at[-1].set(False)
    mask = obs & jnp.repeat(blk_ok, spec.voxels_per_block)

    pos, kept, total = compact_mask(mask, max_fuse_voxels)
    C = max_fuse_voxels

    def gather(arr, extra=()):
        out = jnp.zeros((C + 1,) + extra, arr.dtype)
        return out.at[pos].set(arr, mode="drop")[:C]

    xyz_all = voxel_xyz_all(spec, sub_state, base_R, base_T,
                            is_global=False).reshape(-1, 3)
    src_xyz = gather(xyz_all, (3,))
    src_tsdf = gather(ch["TSDF"].reshape(-1).astype(jnp.float32))
    src_w = gather(ch["W_TSDF"].reshape(-1).astype(jnp.float32))
    src_occ = gather(ch["occupy"].reshape(-1).astype(jnp.int32))
    if sub_cfg.texture_enabled:
        src_col = gather(ch["color"].reshape(-1, 3).astype(jnp.float32), (3,))
    else:
        src_col = jnp.zeros((C, 3), jnp.float32)
    src_valid = jnp.arange(C) < kept

    gf = src_xyz / glob_cfg.voxel_scale
    low = jnp.floor(gf).astype(jnp.int32)
    corners = jnp.asarray(
        [[di, dj, dk] for di in (0, 1) for dj in (0, 1) for dk in (0, 1)
         if di + dj + dk != 0], jnp.int32)
    tgt = low[:, None, :] + corners[None, :, :]
    wgt = jnp.prod(1.0 - jnp.abs(tgt.astype(jnp.float32) - gf[:, None, :]),
                   axis=-1)
    wgt = jnp.where(src_valid[:, None], wgt, 0.0)

    s0 = jnp.zeros(tgt.shape[:-1], jnp.int32)
    blin, intra, inb = voxel_to_block(gspec, s0, tgt)
    ok = src_valid[:, None] & inb & (wgt > 0)

    w_splat = (wgt * src_w[:, None]).reshape(-1)
    wd_splat = w_splat * jnp.repeat(src_tsdf, 7)
    occ_splat = jnp.where(ok, src_occ[:, None], 0).reshape(-1)
    wc_splat = w_splat[:, None] * jnp.repeat(src_col, 7, axis=0)

    okf = ok.reshape(-1)
    return SplatContribs(
        blin=blin.reshape(-1), ok=okf, intra=intra.reshape(-1),
        w=jnp.where(okf, w_splat, 0.0), wd=jnp.where(okf, wd_splat, 0.0),
        occ=occ_splat, wc=jnp.where(okf[:, None], wc_splat, 0.0),
        kept=kept, dropped=jnp.maximum(total - C, 0))


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
    wc_sum = jnp.zeros((nvox, 3), jnp.float32).at[flat].add(c.wc)
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
        col_g = gch["color"].reshape(nvox, 3).astype(jnp.float32)
        new_col = jnp.where(touched[:, None],
                            (col_g * W[:, None] + wc_sum) /
                            jnp.maximum(new_W, 1e-20)[:, None], col_g)
        gch["color"] = new_col.astype(glob_cfg.dtype).reshape(
            gch["color"].shape)
    for k in gch:
        gch[k] = gch[k].at[-1].set(jnp.zeros_like(gch[k][-1]))
    return global_state._replace(channels=gch)


def _use_pallas_fusion(glob_cfg: TSDFConfig) -> bool:
    from taichislam_tpu.ops.pallas.seg_accum import SENTINEL_BLOCK
    gspec = glob_cfg.grid
    if glob_cfg.pallas_accum == "off" or glob_cfg.texture_enabled:
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
                 max_fuse_voxels: int, global_state: GridState,
                 sub_state: GridState, base_R, base_T):
    """Fuse ALL submaps (local + remote) into the global map. The caller
    resets the global map first, as DenseTSDF.fuse_submaps does
    (dense_tsdf.py:312-318). Returns (global_state, stats).

    On TPU the splat accumulation runs through the Pallas sorted
    segmented-reduce kernel (one tile per touched global block) instead of
    4 per-lane scatters; ``fuse_tiles_dropped`` reports touched-capacity
    overflow so the caller can grow ``glob_cfg.max_touched_blocks`` and redo.
    """
    c = splat_contributions(sub_cfg, glob_cfg, max_fuse_voxels, sub_state,
                            base_R, base_T)
    gspec = glob_cfg.grid
    tiles_dropped = jnp.int32(0)

    if _use_pallas_fusion(glob_cfg):
        from taichislam_tpu.ops.pallas.seg_accum import (
            SENTINEL_BLOCK, segmented_block_reduce)
        V3 = gspec.voxels_per_block
        bkey = jnp.where(c.ok, c.blin, SENTINEL_BLOCK)
        occ_f = c.occ.astype(jnp.float32)
        touched, acc, n_touched = segmented_block_reduce(
            bkey, jnp.where(c.ok, c.intra, 0), (c.w, c.wd, occ_f), V3,
            glob_cfg.max_touched_blocks,
            interpret=(jax.default_backend() != "tpu"))
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
