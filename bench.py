#!/usr/bin/env python
"""Benchmark: depth-frame TSDF fusion throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The north-star target (BASELINE.json) is >= 200 fps fusing 640x480 depth
frames into a 0.05 m TSDF on a single TPU chip; ``vs_baseline`` is measured
fps / 200. The reference publishes no numbers (BASELINE.md), so the target
is the baseline.

Measurement notes: on the axon relay, ``block_until_ready`` does not
actually wait for device completion, so all N frames are chained through one
``lax.scan`` inside a single jit and the timing is closed by a scalar
readback; the tiny-readback RPC latency is measured separately and
subtracted.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from taichislam_tpu.core.config import TSDFConfig
    from taichislam_tpu.ops import tsdf as tsdf_ops

    import dataclasses

    # max_blocks sized ~2x the scene's 130 allocated blocks (the zero-drop
    # guard below counts alloc_overflow, so an under-sized capacity cannot
    # silently cheat): the scan carry copies the whole state each frame on
    # this relay, so capacity = cost
    cfg = TSDFConfig(
        map_scale=(10.0, 10.0), voxel_scale=0.05, num_voxel_per_blk_axis=16,
        max_ray_length=3.0, min_ray_length=0.3, recast_step=2,
        max_blocks=256, max_bins=32768, max_submap_num=64)
    state = tsdf_ops.make_tsdf_state(cfg)

    h, w = 480, 640
    K = jnp.asarray([384.0, 0, 320.0, 0, 384.0, 240.0, 0, 0, 1], jnp.float32)

    rng = np.random.default_rng(0)
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    n_frames = 50
    frames = np.empty((n_frames, h, w), np.uint16)
    Rs = np.empty((n_frames, 3, 3), np.float32)
    Ts = np.empty((n_frames, 3), np.float32)
    for t in range(n_frames):
        base = 1500 + 40.0 * np.sin(0.3 * t)
        depth = base + 0.6 * ii + 0.3 * jj + rng.normal(0, 5, (h, w))
        frames[t] = np.clip(depth, 400, 2900).astype(np.uint16)
        th = 0.02 * t
        Rs[t] = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                          [-np.sin(th), 0, np.cos(th)]], np.float32)
        Ts[t] = [0.05 * t, 0.0, 0.0]
    frames_j = jnp.asarray(frames)
    Rs_j, Ts_j = jnp.asarray(Rs), jnp.asarray(Ts)
    texture = jnp.zeros((1, 1, 3), jnp.uint8)

    # probe the real bin count once, then specialize the executable to a
    # right-sized bin bucket (the scatter lattice scales with it)
    _, probe_stats = tsdf_ops.integrate_depth(
        cfg, state, frames_j[0], texture, Rs_j[0], Ts_j[0], K, K,
        jnp.int32(0))
    from taichislam_tpu.models.dense_tsdf import bin_bucket_for
    n_bins = int(probe_stats["num_bins"])
    cfg = dataclasses.replace(
        cfg, max_bins=min(bin_bucket_for(n_bins), cfg.max_bins))

    def make_run(cfg):
        def one_frame(state, inputs):
            depth, R, T = inputs
            state, stats = tsdf_ops.integrate_depth(cfg, state, depth,
                                                    texture, R, T, K, K,
                                                    jnp.int32(0))
            dropped = stats["alloc_overflow"] + stats["touched_dropped"]
            total_bins = stats["num_bins"] + stats["bins_dropped"]
            return state, (dropped, total_bins)

        @jax.jit
        def run_all(state, frames, Rs, Ts):
            state, (dropped, total_bins) = jax.lax.scan(
                one_frame, state, (frames, Rs, Ts))
            # scalar readback closes the timing; drop stats guard honesty
            return (state,
                    jnp.sum(state.channels["TSDF"].astype(jnp.float32)),
                    jnp.max(dropped), jnp.max(total_bins))
        return run_all

    # warmup/compile; size the bucket to the worst frame so no ray is
    # silently capacity-dropped during the timed runs
    run_all = make_run(cfg)
    _, s0, dropped, max_bins = run_all(state, frames_j, Rs_j, Ts_j)
    float(s0)
    for _ in range(4):
        want = bin_bucket_for(int(max_bins))
        if int(dropped) == 0 and want <= cfg.max_bins:
            if want < cfg.max_bins:
                cfg = dataclasses.replace(cfg, max_bins=want)
                run_all = make_run(cfg)
                _, s0, dropped, max_bins = run_all(state, frames_j, Rs_j,
                                                   Ts_j)
                float(s0)
            break
        cfg = dataclasses.replace(
            cfg, max_bins=max(want, cfg.max_bins),
            max_touched_blocks=(cfg.max_touched_blocks * 2
                                if int(dropped) > 0
                                else cfg.max_touched_blocks))
        run_all = make_run(cfg)
        _, s0, dropped, max_bins = run_all(state, frames_j, Rs_j, Ts_j)
        float(s0)

    # RPC latency baseline
    tiny = jax.jit(lambda x: jnp.sum(x))
    tv = jnp.ones((8,), jnp.float32)
    float(tiny(tv))
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(tiny(tv))
        lat.append(time.perf_counter() - t0)
    lat = min(lat)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, sval, _, _ = run_all(state, frames_j, Rs_j, Ts_j)
        float(sval)
        best = min(best, time.perf_counter() - t0)
    per_frame = max(best - lat, 1e-9) / n_frames
    fps = 1.0 / per_frame

    print(json.dumps({
        "metric": "depth_fusion_fps_640x480_5cm",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 200.0, 3),
    }))


if __name__ == "__main__":
    main()
