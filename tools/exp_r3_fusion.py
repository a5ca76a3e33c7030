#!/usr/bin/env python
"""Round-3 fusion stage breakdown, in-scan (each stage's outputs feed a
carried accumulator so XLA cannot DCE or hoist them)."""

import sys
import time

sys.path.insert(0, ".")
import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from taichislam_tpu.core.config import TSDFConfig
    from taichislam_tpu.ops import tsdf as tsdf_ops
    from taichislam_tpu.core.grid import voxel_to_block_c
    from taichislam_tpu.core import geometry
    from taichislam_tpu.ops.pallas.seg_accum import SENTINEL_BLOCK
    from taichislam_tpu.utils.synthetic_scene import D435_K

    n_frames = 50
    frames, Rs, Ts = bench.make_inputs(n_frames)
    frames_j = jnp.asarray(frames)
    Rs_j, Ts_j = jnp.asarray(Rs), jnp.asarray(Ts)
    texture = jnp.zeros((1, 1, 3), jnp.uint8)
    K = jnp.asarray(D435_K)
    cfg = TSDFConfig(
        map_scale=(10.0, 10.0), voxel_scale=0.05, num_voxel_per_blk_axis=16,
        max_ray_length=3.0, min_ray_length=0.3, recast_step=2,
        max_blocks=2048, max_bins=8192, max_submap_num=64,
        max_touched_blocks=256, max_march_lanes=524288)

    tiny = jax.jit(lambda x: jnp.sum(x))
    tv = jnp.ones((8,), jnp.float32)
    float(tiny(tv))
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(tiny(tv))
        lats.append(time.perf_counter() - t0)
    lat = min(lats)
    spec = cfg.grid

    def stage_fn(stage):
        def pre(depth, R, T):
            pts, dep, color, valid = tsdf_ops.depth_to_points(
                cfg, depth, texture, K, K)
            px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
            m0 = R[0, 0] * px + R[0, 1] * py + R[0, 2] * pz
            m1 = R[1, 0] * px + R[1, 1] * py + R[1, 2] * pz
            m2 = R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz
            if stage == "pts":
                return m0.sum() + m1.sum() + m2.sum()
            if stage == "pixsort":
                ops = (jnp.where(valid, jnp.int32(1), jnp.int32(0)),
                       m0, m1, m2, dep)
                srt0 = jax.lax.sort(ops, num_keys=1)
                return srt0[1].sum() + srt0[4].sum()
            bins = tsdf_ops.bin_points_c(cfg, m0, m1, m2, dep, color, valid)
            if stage == "bins":
                return (bins.count.sum() + bins.sum_pos.sum() +
                        bins.sum_z.sum())
            (x0, x1, x2), live, ds, w, (e0, e1, e2), zb = \
                tsdf_ops._march_lattice_c(cfg, bins, T)
            rha = geometry.round_half_away
            inv_v = 1.0 / cfg.voxel_scale
            blin_m, intra_m, inb_m = voxel_to_block_c(
                spec, jnp.int32(0), rha(x0 * inv_v).astype(jnp.int32),
                rha(x1 * inv_v).astype(jnp.int32),
                rha(x2 * inv_v).astype(jnp.int32))
            mask_m = (live & inb_m).reshape(-1)
            wf = jnp.where(mask_m, w.reshape(-1), 0.0)
            wdf = wf * ds.reshape(-1)
            lo = jnp.int32(0) * spec.blocks_per_submap
            rel = blin_m.reshape(-1) - lo
            lane_ok = mask_m & (rel >= 0) & (rel < spec.blocks_per_submap)
            bkey = jnp.where(lane_ok, rel, SENTINEL_BLOCK)
            intra_k = jnp.where(lane_ok, intra_m.reshape(-1), 0)
            if stage == "march":
                return (wf.sum() + wdf.sum() + bkey.sum().astype(jnp.float32)
                        + intra_k.sum().astype(jnp.float32))
            if stage == "sort":
                V3l = spec.voxels_per_block
                pk = jnp.where(bkey < SENTINEL_BLOCK, bkey * V3l + intra_k,
                               2 ** 30)
                srt = jax.lax.sort((pk, wf, wdf), num_keys=1)
                srt = tuple(a[:cfg.max_march_lanes] for a in srt)
                return (srt[1].sum() + srt[2].sum() +
                        srt[0].sum().astype(jnp.float32))
            from taichislam_tpu.ops.pallas.seg_accum import \
                segmented_block_reduce
            touched_rel, acc, n_touched, ld = segmented_block_reduce(
                bkey, intra_k, (wf, wdf), spec.voxels_per_block,
                cfg.max_touched_blocks, lane_cap=cfg.max_march_lanes,
                max_bkey=spec.blocks_per_submap)
            return (acc.sum() + touched_rel.sum().astype(jnp.float32))
        return pre

    def make_run(stage):
        if stage == "full":
            def one_frame(carry, inputs):
                state, acc = carry
                depth, R, T = inputs
                state, stats = tsdf_ops.integrate_depth(
                    cfg, state, depth, texture, R, T, K, K, jnp.int32(0))
                return (state, acc), None

            @jax.jit
            def run_all(state, frames, Rs, Ts):
                (state, _), _ = jax.lax.scan(
                    one_frame, (state, jnp.float32(0)), (frames, Rs, Ts))
                return jnp.sum(state.channels["TSDF"].astype(jnp.float32))
            return run_all

        fn = stage_fn(stage)

        def one_frame(acc, inputs):
            depth, R, T = inputs
            return acc + fn(depth, R, T), None

        @jax.jit
        def run_all(state, frames, Rs, Ts):
            acc, _ = jax.lax.scan(one_frame, jnp.float32(0),
                                  (frames, Rs, Ts))
            return acc
        return run_all

    state = tsdf_ops.make_tsdf_state(cfg)
    for stage in ("pts", "pixsort", "bins", "sort", "accum", "full"):
        run = make_run(stage)
        s = run(state, frames_j, Rs_j, Ts_j)
        float(s)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(state, frames_j, Rs_j, Ts_j))
            best = min(best, time.perf_counter() - t0)
        print(f"{stage:6s}: {(best - lat) / n_frames * 1000:.3f} ms/frame",
              flush=True)


if __name__ == "__main__":
    main()
