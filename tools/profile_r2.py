#!/usr/bin/env python
"""Round-2 stage profile: bench-shaped config incl. per-frame ESDF.

K-scan differencing (see profile_fusion.py) of:
  - full integrate_depth at the bench config (max_blocks=256, sized bins)
  - binning / march+keys prefixes
  - Pallas segmented reduce in isolation
  - incremental esdf_update on a built map with a realistic dirty set
  - marching-cubes full-map extraction

Usage: python tools/profile_r2.py
"""

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
    from taichislam_tpu.ops import tsdf as tsdf_ops
    from taichislam_tpu.ops import esdf as esdf_ops

    cfg = TSDFConfig(map_scale=(10., 10.), voxel_scale=0.05,
                     num_voxel_per_blk_axis=16, max_ray_length=3.0,
                     min_ray_length=0.3, recast_step=2, max_blocks=256,
                     max_bins=32768, max_submap_num=64)
    h, w = 480, 640
    K = jnp.asarray([384., 0, 320., 0, 384., 240., 0, 0, 1], jnp.float32)
    rng = np.random.default_rng(0)
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    depth_np = np.clip(1500 + 0.6 * ii + 0.3 * jj +
                       rng.normal(0, 5, (h, w)), 400, 2900).astype(np.uint16)
    depth = jnp.asarray(depth_np)
    texture = jnp.zeros((1, 1, 3), jnp.uint8)
    R = jnp.eye(3, dtype=jnp.float32)
    T = jnp.zeros(3, jnp.float32)

    state = tsdf_ops.make_tsdf_state(cfg)
    _, stats = tsdf_ops.integrate_depth(cfg, state, depth, texture, R, T,
                                        K, K, jnp.int32(0))
    from taichislam_tpu.models.dense_tsdf import bin_bucket_for
    nb = int(stats["num_bins"])
    cfg = dataclasses.replace(cfg, max_bins=bin_bucket_for(nb))
    print(f"bins: {nb} -> bucket {cfg.max_bins}; "
          f"touched cap {cfg.max_touched_blocks}", flush=True)
    state = tsdf_ops.make_tsdf_state(cfg)

    def full(depth, R, T):
        st, _ = tsdf_ops.integrate_depth(cfg, state, depth, texture, R, T,
                                         K, K, jnp.int32(0))
        return st.channels["W_TSDF"]

    print(f"full integrate:   {timed(full, (depth, R, T), 2):7.2f} ms",
          flush=True)

    from taichislam_tpu.core import geometry

    def binning(depth, R):
        pts, dep, color, valid = tsdf_ops.depth_to_points(cfg, depth,
                                                          texture, K, K)
        px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
        m0 = R[0, 0] * px + R[0, 1] * py + R[0, 2] * pz
        m1 = R[1, 0] * px + R[1, 1] * py + R[1, 2] * pz
        m2 = R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz
        return tsdf_ops.bin_points_c(cfg, m0, m1, m2, dep, color,
                                     valid).count

    print(f"binning:          {timed(binning, (depth, R)):7.2f} ms",
          flush=True)

    def march(depth, R, T):
        pts, dep, color, valid = tsdf_ops.depth_to_points(cfg, depth,
                                                          texture, K, K)
        px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
        m0 = R[0, 0] * px + R[0, 1] * py + R[0, 2] * pz
        m1 = R[1, 0] * px + R[1, 1] * py + R[1, 2] * pz
        m2 = R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz
        bins = tsdf_ops.bin_points_c(cfg, m0, m1, m2, dep, color, valid)
        (x0, x1, x2), live, ds, wv, _, _ = tsdf_ops._march_lattice_c(
            cfg, bins, T)
        return wv

    print(f"binning+march:    {timed(march, (depth, R, T), 2):7.2f} ms",
          flush=True)

    def keys(depth, R, T):
        from taichislam_tpu.core.grid import voxel_to_block_c
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
        blin_m, intra_m, inb_m = voxel_to_block_c(
            cfg.grid, jnp.int32(0), rha(x0 * inv_v).astype(jnp.int32),
            rha(x1 * inv_v).astype(jnp.int32),
            rha(x2 * inv_v).astype(jnp.int32))
        return blin_m + intra_m

    print(f"binning+march+keys{timed(keys, (depth, R, T), 2):7.2f} ms",
          flush=True)

    # Pallas reduce in isolation on realistic key/value distributions
    from taichislam_tpu.ops.pallas.seg_accum import (
        SENTINEL_BLOCK, segmented_block_reduce)
    spec = cfg.grid
    S = cfg.max_ray_steps
    n_lanes = cfg.max_bins * S
    lanes_rng = np.random.default_rng(1)
    n_real = nb * 62
    bkey_np = np.full((n_lanes,), SENTINEL_BLOCK, np.int32)
    real_blocks = lanes_rng.integers(0, 130, size=n_real)
    bkey_np[:n_real] = real_blocks
    intra_np = np.zeros((n_lanes,), np.int32)
    intra_np[:n_real] = lanes_rng.integers(0, spec.voxels_per_block,
                                           size=n_real)
    bkey = jnp.asarray(bkey_np)
    intra = jnp.asarray(intra_np)
    vals = (jnp.ones((n_lanes,), jnp.float32),
            jnp.ones((n_lanes,), jnp.float32))

    def reduce_only(bkey, intra):
        _, acc, _, _ = segmented_block_reduce(
            bkey, intra, vals, spec.voxels_per_block,
            cfg.max_touched_blocks,
            interpret=(jax.default_backend() != "tpu"))
        return acc[:, 0, :]

    print(f"pallas reduce ({n_lanes/1e3:.0f}k lanes): "
          f"{timed(reduce_only, (bkey, intra), 1):7.2f} ms", flush=True)

    # ---- ESDF on a built map ------------------------------------------------
    from taichislam_tpu.models.dense_esdf import DenseESDF
    m = DenseESDF(map_scale=[10., 10.], voxel_scale=0.05,
                  num_voxel_per_blk_axis=16, max_ray_length=3.0,
                  min_ray_length=0.3, max_blocks=256, max_bins=cfg.max_bins,
                  max_submap_num=64, max_esdf_sweeps=64)
    m.set_dep_camera_intrinsic(np.asarray(K).reshape(3, 3).flatten())
    m.recast_depth_to_map(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                          depth_np, None)
    touched = m.last_stats["touched_blocks"]
    print(f"map blocks: {int(m.state.num_blocks)}, esdf cap bucket "
          f"{m._esdf_cap_bucket}, sweeps {m.last_esdf_sweeps}", flush=True)

    cap = m._esdf_cap_bucket

    def esdf_inc(esdf, fixed):
        e, f, _, _, _, _ = esdf_ops.esdf_update(
            m.cfg, 64, cap, m.state, esdf, fixed, jnp.int32(0), touched)
        return e

    print(f"esdf incremental (cap={cap}): "
          f"{timed(esdf_inc, (m.esdf, m.esdf_fixed), 0):7.2f} ms",
          flush=True)

    full_cap = 256

    def esdf_full(esdf, fixed):
        e, f, _, _, _, _ = esdf_ops.esdf_update(
            m.cfg, 64, full_cap, m.state, esdf, fixed, jnp.int32(0))
        return e

    print(f"esdf full-warm (cap={full_cap}): "
          f"{timed(esdf_full, (m.esdf, m.esdf_fixed), 0):7.2f} ms",
          flush=True)

    # ---- marching cubes full map -------------------------------------------
    from taichislam_tpu.models.mesher import MarchingCubeMesher
    mesher = MarchingCubeMesher(m, max_triangles=1 << 18)
    t0 = time.perf_counter()
    mesher.generate_mesh(1)
    t_first = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        mesher.generate_mesh(1)
        best = min(best, time.perf_counter() - t0)
    print(f"marching cubes full map: {best*1000:.2f} ms "
          f"({mesher.num_facelets} tris; first {t_first*1000:.0f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
