#!/usr/bin/env python
"""Stage profile of depth-frame fusion at the bench.py config/scene
(latency-cancelled K-scan timing; Pallas accumulation path)."""

import sys

import numpy as np

sys.path.insert(0, ".")
from tools.profile_fusion import timed  # noqa: E402
from bench import make_inputs  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from taichislam_tpu.core import geometry
    from taichislam_tpu.core.config import TSDFConfig
    from taichislam_tpu.models.dense_tsdf import bin_bucket_for
    from taichislam_tpu.ops import tsdf as tsdf_ops

    frames, Rs, Ts = make_inputs(8)
    from taichislam_tpu.utils.synthetic_scene import D435_K
    K = jnp.asarray(D435_K)
    texture = jnp.zeros((1, 1, 3), jnp.uint8)
    cfg = TSDFConfig(
        map_scale=(10.0, 10.0), voxel_scale=0.05, num_voxel_per_blk_axis=16,
        max_ray_length=3.0, min_ray_length=0.3, recast_step=2,
        max_blocks=2048, max_bins=32768, max_submap_num=64,
        max_touched_blocks=512)
    state = tsdf_ops.make_tsdf_state(cfg)
    depth = jnp.asarray(frames[0])
    R, T = jnp.asarray(Rs[0]), jnp.asarray(Ts[0])

    # size bins like the bench does
    _, st = tsdf_ops.integrate_depth(cfg, state, depth, texture, R, T, K, K,
                                     jnp.int32(0))
    want = bin_bucket_for(int(st["num_bins"] + st["bins_dropped"]))
    import dataclasses
    cfg = dataclasses.replace(cfg, max_bins=want)
    state = tsdf_ops.make_tsdf_state(cfg)
    state, st = tsdf_ops.integrate_depth(cfg, state, depth, texture, R, T,
                                         K, K, jnp.int32(0))
    print(f"bins bucket {cfg.max_bins}, valid {int(st['num_bins'])}, "
          f"S={cfg.max_ray_steps}, lanes={cfg.max_bins * cfg.max_ray_steps}")

    def prep(depth, R):
        pts, dep, color, valid = tsdf_ops.depth_to_points(
            cfg, depth, texture, K, K)
        px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
        q0 = R[0, 0] * px + R[0, 1] * py + R[0, 2] * pz
        q1 = R[1, 0] * px + R[1, 1] * py + R[1, 2] * pz
        q2 = R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz
        return q0, q1, q2, dep, color, valid

    def stage_pts(depth, R):
        return prep(depth, R)[0]

    def stage_bins(depth, R):
        q0, q1, q2, dep, color, valid = prep(depth, R)
        return tsdf_ops.bin_points_c(cfg, q0, q1, q2, dep, color,
                                     valid).count

    def stage_march(depth, R):
        q0, q1, q2, dep, color, valid = prep(depth, R)
        bins = tsdf_ops.bin_points_c(cfg, q0, q1, q2, dep, color, valid)
        (x0, x1, x2), live, ds, w, e, zb = tsdf_ops._march_lattice_c(
            cfg, bins, T)
        return w

    def full(depth, R):
        st2, stats = tsdf_ops.integrate_depth(
            cfg, state, depth, texture, R, T, K, K, jnp.int32(0))
        return st2.channels["TSDF"].astype(jnp.float32)

    print(f"pts+rotate:  {timed(stage_pts, (depth, R)):7.3f} ms")
    print(f"upto bins:   {timed(stage_bins, (depth, R)):7.3f} ms")
    print(f"upto march:  {timed(stage_march, (depth, R)):7.3f} ms")
    print(f"full:        {timed(full, (depth, R)):7.3f} ms")

    # live-lane census
    q0, q1, q2, dep, color, valid = prep(depth, R)
    bins = tsdf_ops.bin_points_c(cfg, q0, q1, q2, dep, color, valid)
    _, live, _, _, _, _ = tsdf_ops._march_lattice_c(cfg, bins, T)
    lv = np.asarray(live)
    print(f"live lanes {lv.sum()} / {lv.size} ({lv.mean():.1%})")


if __name__ == "__main__":
    main()
