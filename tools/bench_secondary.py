#!/usr/bin/env python
"""Secondary benchmarks (BASELINE.json configs): fusion + per-frame
incremental ESDF, and full-map marching cubes.

bench.py stays the single-line headline (fusion fps); this prints the
extended numbers for the record. Same latency-cancelling methodology.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")


def main():
    import jax
    import jax.numpy as jnp
    from profile_fusion import timed
    from taichislam_tpu.core.config import TSDFConfig
    from taichislam_tpu.ops import tsdf as tsdf_ops, esdf as esdf_ops
    from taichislam_tpu.ops import marching_cubes as mc_ops

    cfg = TSDFConfig(map_scale=(10., 10.), voxel_scale=0.05,
                     num_voxel_per_blk_axis=16, max_ray_length=3.0,
                     min_ray_length=0.3, recast_step=2, max_blocks=1024,
                     max_bins=5120, max_submap_num=64)
    state = tsdf_ops.make_tsdf_state(cfg)
    h, w = 480, 640
    K = jnp.asarray([384., 0, 320., 0, 384., 240., 0, 0, 1], jnp.float32)
    rng = np.random.default_rng(0)
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    depth = jnp.asarray(np.clip(1500 + 0.6 * ii + 0.3 * jj +
                                rng.normal(0, 5, (h, w)), 400,
                                2900).astype(np.uint16))
    texture = jnp.zeros((1, 1, 3), jnp.uint8)
    R = jnp.eye(3, dtype=jnp.float32)
    T = jnp.zeros(3, jnp.float32)
    # sweep the camera sideways so the map is much larger than one frustum
    # (the regime per-frame incremental ESDF exists for)
    for k in range(10):
        Tk = jnp.asarray([0.0, 0.8 * k, 0.0], jnp.float32)
        state, _ = tsdf_ops.integrate_depth(cfg, state, depth, texture, R,
                                            Tk, K, K, jnp.int32(0))
    print(f"map blocks: {int(state.num_blocks)}", flush=True)

    shape = (cfg.grid.max_blocks + 1, cfg.grid.voxels_per_block)
    FULL_CAP = 512
    esdf0, fixed0, _, sweeps, _, _ = esdf_ops.esdf_update(
        cfg, 96, FULL_CAP, state, jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.int8), jnp.int32(0))
    print(f"cold ESDF sweeps: {int(sweeps)}", flush=True)

    # fusion + per-frame ESDF: full-warm working set vs dirty-block set
    def make_fused(cap, use_dirty):
        def fused_frame(depth, R, T):
            st, stats = tsdf_ops.integrate_depth(cfg, state, depth, texture,
                                                 R, T, K, K, jnp.int32(0))
            dirty = stats["touched_blocks"] if use_dirty else None
            e, f, p, s, ch, ov = esdf_ops.esdf_update(
                cfg, 8, cap, st, esdf0, fixed0, jnp.int32(0), dirty)
            return e
        return fused_frame

    for label, cap, use_dirty in (("full-warm", FULL_CAP, False),
                                  ("dirty-block", 128, True)):
        ms = timed(make_fused(cap, use_dirty), (depth, R, T), perturb_idx=1,
                   k_lo=2, k_hi=6)
        print(f"fusion + warm ESDF [{label}, cap={cap}]: {ms:.2f} ms/frame "
              f"({1000.0/ms:.1f} fps)", flush=True)

    # marching cubes over the full map (cap bucketed as the model does)
    cap = 64
    while cap < int(state.num_blocks) + 1:
        cap *= 2

    def mesh(thres, R):
        out = mc_ops.extract_mesh(cfg, 1 << 17, 1, cap, state,
                                  jnp.int32(0), thres + 0 * R[0, 0])
        return out["vertices"]

    ms = timed(mesh, (jnp.float32(0.1), R), perturb_idx=1, k_lo=1, k_hi=4)
    out = mc_ops.extract_mesh(cfg, 1 << 17, 1, cap, state, jnp.int32(0),
                              jnp.float32(0.1))
    print(f"marching cubes (full map, cap={cap}, "
          f"{int(out['num_triangles'])} triangles): {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
