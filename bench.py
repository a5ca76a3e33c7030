#!/usr/bin/env python
"""Benchmark: depth-frame TSDF fusion throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The north-star target (BASELINE.json) is >= 200 fps fusing 640x480 depth
frames into a 0.05 m TSDF on a single TPU chip; ``vs_baseline`` is measured
fps / 200. The reference publishes no numbers (BASELINE.md), so the target
is the baseline.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from taichislam_tpu.core.config import TSDFConfig
    from taichislam_tpu.ops import tsdf as tsdf_ops

    cfg = TSDFConfig(
        map_scale=(10.0, 10.0), voxel_scale=0.05, num_voxel_per_blk_axis=16,
        max_ray_length=3.0, min_ray_length=0.3, recast_step=2,
        max_blocks=8192, max_bins=32768, max_submap_num=64)
    state = tsdf_ops.make_tsdf_state(cfg)

    h, w = 480, 640
    fx = fy = 384.0
    cx, cy = w / 2.0, h / 2.0
    K = jnp.asarray([fx, 0, cx, 0, fy, cy, 0, 0, 1], jnp.float32)

    rng = np.random.default_rng(0)
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    frames = []
    n_frames = 20
    for t in range(n_frames):
        base = 1500 + 40.0 * np.sin(0.3 * t)
        depth = base + 0.6 * ii + 0.3 * jj + rng.normal(0, 5, (h, w))
        frames.append(jnp.asarray(np.clip(depth, 400, 2900).astype(np.uint16)))
    texture = jnp.zeros((1, 1, 3), jnp.uint8)

    poses = []
    for t in range(n_frames):
        th = 0.02 * t
        R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]], np.float32)
        T = np.array([0.05 * t, 0.0, 0.0], np.float32)
        poses.append((jnp.asarray(R), jnp.asarray(T)))

    def step(state, depth, R, T):
        state, _ = tsdf_ops.integrate_depth(cfg, state, depth, texture, R, T,
                                            K, K, jnp.int32(0))
        return state

    # warmup/compile
    state = step(state, frames[0], *poses[0])
    jax.block_until_ready(state.channels["TSDF"])

    t0 = time.perf_counter()
    for i in range(n_frames):
        state = step(state, frames[i], *poses[i])
    jax.block_until_ready(state.channels["TSDF"])
    dt = time.perf_counter() - t0
    fps = n_frames / dt

    print(json.dumps({
        "metric": "depth_fusion_fps_640x480_5cm",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 200.0, 3),
    }))


if __name__ == "__main__":
    main()
