#!/usr/bin/env python
"""Dissect the incremental-ESDF FIXED cost (budget-0) in-scan.

Stages (each includes the previous; DCE trims everything later):
  ws     — working-set build: dirty compaction, sort-dedupe rim, slot
           tables, neighbor probes, updatable flags
  rows   — + channel row gathers (gcomp), seed/fixed masks, warm start
  layout — + sweep-layout conversions, enc halo assembly, side channel
  noepi  — + while_loop entry/exit at budget 0 (no sweeps run)
  full   — + epilogue: scatter-back, diff vs prev, shell re-queue

All variants run with pending-requeue feedback DISABLED (pending = 0) so
every variant sees identical dirty sets; the deltas are therefore clean
stage costs at slightly-smaller-than-production working sets.
"""

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

    def make_run(stage, budget=0):
        def one_frame(carry, inputs):
            state, esdf, fixed, seen_t, seen_o = carry
            depth, R, T = inputs
            state, stats = tsdf_ops.integrate_depth(
                cfg, state, depth, texture, R, T, K, K, jnp.int32(0))
            if stage is not None:
                dirty, seen_t, seen_o = esdf_ops.esdf_seed_dirty(
                    cfg, state, seen_t, seen_o, stats["touched_blocks"])
                esdf, fixed, _, _, _, ov = esdf_ops.esdf_update(
                    cfg, budget, 256, state, esdf, fixed,
                    jnp.int32(0), dirty, stage)
            else:
                ov = jnp.int32(0)
            return (state, esdf, fixed, seen_t, seen_o), (ov,)

        @jax.jit
        def run_all(state, frames, Rs, Ts):
            init = (state, jnp.zeros(shape, jnp.float32),
                    jnp.zeros(shape, jnp.int8),
                    jnp.zeros(shape, jnp.float32), jnp.zeros(shape, bool))
            (state, esdf, *_), (ov,) = jax.lax.scan(
                one_frame, init, (frames, Rs, Ts))
            return (jnp.sum(state.channels["TSDF"].astype(jnp.float32)) +
                    jnp.sum(esdf), jnp.max(ov))
        return run_all

    state = tsdf_ops.make_tsdf_state(cfg)
    prev = None
    for stage, label in ((None, "fusion only"), ("ws1", "dirty cmpct"),
                         ("ws2", "nbr probe 1"), ("ws3", "sort+dedupe"),
                         ("ws", "ws build   "),
                         ("rows", "row gathers"), ("layout", "layouts+enc"),
                         ("noepi", "while entry"), ("", "full budg 0"),
                         (("", 3), "full budg 3")):
        budget = 0
        if isinstance(stage, tuple):
            stage, budget = stage
        run = make_run(stage, budget)
        s, ov = run(state, frames_j, Rs_j, Ts_j)
        float(s)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            s, ov = run(state, frames_j, Rs_j, Ts_j)
            float(s)
            best = min(best, time.perf_counter() - t0)
        ms = (best - lat) / n_frames * 1000
        delta = "" if prev is None else f"  (+{ms - prev:.3f})"
        print(f"{label}: {ms:.3f} ms/frame (ov={int(ov)}){delta}",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
