#!/usr/bin/env python
"""In-scan per-frame cost of the incremental ESDF at the bench config,
split by sweep budget (budget 0 = fixed overhead incl. gating)."""

import dataclasses
import sys
import time

sys.path.insert(0, ".")
import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from taichislam_tpu.core.config import TSDFConfig
    from taichislam_tpu.ops import esdf as esdf_ops
    from taichislam_tpu.ops import tsdf as tsdf_ops
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
        max_touched_blocks=256, storage_dtype="float16")
    cfg = dataclasses.replace(cfg, esdf_raise_slack_voxels=0.5,
                              esdf_converge_eps=2e-3)

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
    shape = (spec.max_blocks + 1, spec.voxels_per_block)

    def make_run(esdf_cap, budget):
        def one_frame(carry, inputs):
            state, esdf, fixed, pending, seen_t, seen_o = carry
            depth, R, T = inputs
            state, stats = tsdf_ops.integrate_depth(
                cfg, state, depth, texture, R, T, K, K, jnp.int32(0))
            if esdf_cap == "gate":
                dirty, seen_t, seen_o = esdf_ops.esdf_seed_dirty(
                    cfg, state, seen_t, seen_o, stats["touched_blocks"])
                pending = dirty | pending
                ov = jnp.int32(0)
            elif esdf_cap == "nogate":
                dirty = stats["touched_blocks"] | pending
                esdf, fixed, _, _, pending, ov = esdf_ops.esdf_update(
                    cfg, budget, 256, state, esdf, fixed,
                    jnp.int32(0), dirty)
            elif esdf_cap:
                dirty, seen_t, seen_o = esdf_ops.esdf_seed_dirty(
                    cfg, state, seen_t, seen_o, stats["touched_blocks"])
                dirty = dirty | pending
                esdf, fixed, _, _, pending, ov = esdf_ops.esdf_update(
                    cfg, budget, esdf_cap, state, esdf, fixed,
                    jnp.int32(0), dirty)
            else:
                ov = jnp.int32(0)
            return (state, esdf, fixed, pending, seen_t, seen_o), (ov,)

        @jax.jit
        def run_all(state, frames, Rs, Ts):
            init = (state, jnp.zeros(shape, jnp.float32),
                    jnp.zeros(shape, jnp.int8),
                    jnp.zeros((shape[0],), bool),
                    jnp.zeros(shape, jnp.float32), jnp.zeros(shape, bool))
            (state, esdf, *_), (ov,) = jax.lax.scan(
                one_frame, init, (frames, Rs, Ts))
            return (jnp.sum(state.channels["TSDF"].astype(jnp.float32)) +
                    jnp.sum(esdf), jnp.max(ov))
        return run_all

    state = tsdf_ops.make_tsdf_state(cfg)
    for cap, budget, label in ((None, 0, "fusion only "),
                               ("gate", 0, "gating only "),
                               ("nogate", 0, "update only "),
                               (256, 0, "esdf budget0"),
                               (256, 1, "esdf budget1"),
                               (256, 2, "esdf budget2"),
                               (256, 3, "esdf budget3")):
        run = make_run(cap, budget)
        s, ov = run(state, frames_j, Rs_j, Ts_j)
        float(s)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            s, ov = run(state, frames_j, Rs_j, Ts_j)
            float(s)
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {(best - lat) / n_frames * 1000:.3f} ms/frame "
              f"(ov={int(ov)})", flush=True)


if __name__ == "__main__":
    main()
