#!/usr/bin/env python
"""Kernel parameter sweep: rows (chunk size) for segmented_block_reduce,
on REAL frame keys (march lattice of the bench scene's worst-ish frame)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from tools.profile_fusion import timed  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import dataclasses
    from taichislam_tpu.core.config import TSDFConfig
    from taichislam_tpu.core import geometry
    from taichislam_tpu.core.grid import voxel_to_block_c
    from taichislam_tpu.ops import tsdf as tsdf_ops
    from taichislam_tpu.ops.pallas.seg_accum import (
        SENTINEL_BLOCK, segmented_block_reduce)

    cfg = TSDFConfig(map_scale=(10., 10.), voxel_scale=0.05,
                     num_voxel_per_blk_axis=16, max_ray_length=3.0,
                     min_ray_length=0.3, recast_step=2, max_blocks=256,
                     max_bins=5120, max_submap_num=64)
    spec = cfg.grid
    h, w = 480, 640
    K = jnp.asarray([384., 0, 320., 0, 384., 240., 0, 0, 1], jnp.float32)
    rng = np.random.default_rng(0)
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    t = 30
    base = 1500 + 40.0 * np.sin(0.3 * t)
    depth = jnp.asarray(np.clip(base + 0.6 * ii + 0.3 * jj +
                                rng.normal(0, 5, (h, w)), 400,
                                2900).astype(np.uint16))
    texture = jnp.zeros((1, 1, 3), jnp.uint8)
    th = 0.02 * t
    R = jnp.asarray(np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                              [-np.sin(th), 0, np.cos(th)]], np.float32))
    T = jnp.asarray(np.array([0.05 * t, 0, 0], np.float32))

    @jax.jit
    def lanes(depth, R, T):
        pts, dep, color, valid = tsdf_ops.depth_to_points(cfg, depth,
                                                          texture, K, K)
        px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
        m0 = R[0, 0] * px + R[0, 1] * py + R[0, 2] * pz
        m1 = R[1, 0] * px + R[1, 1] * py + R[1, 2] * pz
        m2 = R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz
        bins = tsdf_ops.bin_points_c(cfg, m0, m1, m2, dep, color, valid)
        (x0, x1, x2), live, ds, wv, _, _ = tsdf_ops._march_lattice_c(
            cfg, bins, T)
        rha = geometry.round_half_away
        inv_v = 1.0 / cfg.voxel_scale
        blin, intra, inb = voxel_to_block_c(
            spec, jnp.int32(0), rha(x0 * inv_v).astype(jnp.int32),
            rha(x1 * inv_v).astype(jnp.int32),
            rha(x2 * inv_v).astype(jnp.int32))
        mask = (live & inb).reshape(-1)
        rel = blin.reshape(-1)
        bkey = jnp.where(mask, rel, SENTINEL_BLOCK)
        intra_k = jnp.where(mask, intra.reshape(-1), 0)
        wf = jnp.where(mask, wv.reshape(-1), 0.0)
        return bkey, intra_k, wf, wf * ds.reshape(-1)

    bkey, intra, wf, wdf = jax.block_until_ready(lanes(depth, R, T))
    n_live = int(jnp.sum(bkey < SENTINEL_BLOCK))
    print(f"lanes: {bkey.shape[0]} total, {n_live} live", flush=True)

    for rows in (16, 24, 32, 48):
        def fn(bkey, intra, wf):
            _, acc, _, _ = segmented_block_reduce(
                bkey, intra, (wf, wdf), spec.voxels_per_block,
                cfg.max_touched_blocks, rows=rows,
                max_bkey=spec.blocks_per_submap, vals_f16=True)
            return acc[:, 0, :]
        print(f"rows={rows:3d}: "
              f"{timed(fn, (bkey, intra, wf), 2):7.2f} ms", flush=True)

    # sort alone, for reference
    def sort_only(bkey, intra):
        srt = jax.lax.sort((bkey, intra, wf, wdf), num_keys=1)
        return srt[2]
    print(f"sort alone: {timed(sort_only, (bkey, intra), 1):7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
