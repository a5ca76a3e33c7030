#!/usr/bin/env python
"""f16 vs f32 channel storage, end to end at the bench config: fusion
throughput and TSDF field deviation (the reference stores ti.f16 fields,
dense_tsdf.py:64-76; this path is storage_dtype='float16')."""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from taichislam_tpu.core.config import TSDFConfig
    from taichislam_tpu.ops import tsdf as tsdf_ops
    from taichislam_tpu.utils.synthetic_scene import D435_K

    n_frames = 30
    frames, Rs, Ts = bench.make_inputs(n_frames)
    frames_j = jnp.asarray(frames)
    Rs_j, Ts_j = jnp.asarray(Rs), jnp.asarray(Ts)
    texture = jnp.zeros((1, 1, 3), jnp.uint8)
    K = jnp.asarray(D435_K)

    tiny = jax.jit(lambda x: jnp.sum(x))
    tv = jnp.ones((8,), jnp.float32)
    float(tiny(tv))
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(tiny(tv))
        lats.append(time.perf_counter() - t0)
    lat = min(lats)

    outs = {}
    for sd in ("float32", "float16"):
        cfg = TSDFConfig(
            map_scale=(10.0, 10.0), voxel_scale=0.05,
            num_voxel_per_blk_axis=16, max_ray_length=3.0,
            min_ray_length=0.3, recast_step=2, max_blocks=2048,
            max_bins=10240, max_submap_num=64, max_touched_blocks=512,
            storage_dtype=sd)

        @jax.jit
        def run_all(state, frames, Rs, Ts, cfg=cfg):
            def body(st, inputs):
                depth, R, T = inputs
                st, stats = tsdf_ops.integrate_depth(
                    cfg, st, depth, texture, R, T, K, K, jnp.int32(0))
                return st, stats["bins_dropped"] + stats["alloc_overflow"] \
                    + stats["touched_dropped"]
            st, drops = jax.lax.scan(body, state, (frames, Rs, Ts))
            return (st.channels["TSDF"].astype(jnp.float32),
                    st.channels["W_TSDF"].astype(jnp.float32),
                    st.channels["TSDF_observed"] > 0, jnp.max(drops))

        state = tsdf_ops.make_tsdf_state(cfg)
        D, W, obs, drops = run_all(state, frames_j, Rs_j, Ts_j)
        float(jnp.sum(D))
        assert int(drops) == 0, int(drops)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            D, W, obs, _ = run_all(state, frames_j, Rs_j, Ts_j)
            float(jnp.sum(D))
            best = min(best, time.perf_counter() - t0)
        ms = max(best - lat, 1e-9) / n_frames * 1000.0
        outs[sd] = (np.asarray(D), np.asarray(obs), ms)
        print(f"{sd}: fusion {1000.0 / ms:.1f} fps ({ms:.3f} ms/frame)",
              flush=True)

    D32, obs, _ = outs["float32"]
    D16, _, _ = outs["float16"]
    err = np.abs(np.where(obs, D32 - D16, 0.0))
    print(f"TSDF deviation f16 vs f32: max {err.max() * 1000:.2f} mm, "
          f"p99 {np.percentile(err[obs], 99) * 1000:.3f} mm "
          f"(voxel 50 mm)")


if __name__ == "__main__":
    main()
