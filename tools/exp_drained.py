#!/usr/bin/env python
"""Drained-ESDF (budget-32) scan-cadence sweep, in-scan.

Information crosses one block boundary per halo exchange; only scan
sweeps carry it across the next block interior in one hop. This tool
measures ms/frame AND total sweeps executed for several scan cadences
(esdf_scan_sweeps / esdf_scan_period combinations) to find the drained
throughput optimum (VERDICT round-2 item 3: 60 -> >=120 fps).
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
    base = TSDFConfig(
        map_scale=(10.0, 10.0), voxel_scale=0.05, num_voxel_per_blk_axis=16,
        max_ray_length=3.0, min_ray_length=0.3, recast_step=2,
        max_blocks=2048, max_bins=8192, max_submap_num=64,
        max_touched_blocks=256, storage_dtype="float16",
        esdf_raise_slack_voxels=0.5, esdf_converge_eps=2e-3)

    tiny = jax.jit(lambda x: jnp.sum(x))
    tv = jnp.ones((8,), jnp.float32)
    float(tiny(tv))
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(tiny(tv))
        lats.append(time.perf_counter() - t0)
    lat = min(lats)

    spec = base.grid
    shape = (spec.max_blocks + 1, spec.voxels_per_block)

    def make_run(cfg, budget):
        def one_frame(carry, inputs):
            state, esdf, fixed, pending, seen_t, seen_o = carry
            depth, R, T = inputs
            state, stats = tsdf_ops.integrate_depth(
                cfg, state, depth, texture, R, T, K, K, jnp.int32(0))
            dirty, seen_t, seen_o = esdf_ops.esdf_seed_dirty(
                cfg, state, seen_t, seen_o, stats["touched_blocks"])
            dirty = dirty | pending
            esdf, fixed, _, sweeps, pending, ov = esdf_ops.esdf_update(
                cfg, budget, 256, state, esdf, fixed, jnp.int32(0), dirty,
                tsdf_src=seen_t, obs_src=seen_o)
            return (state, esdf, fixed, pending, seen_t, seen_o), \
                (ov, sweeps)

        @jax.jit
        def run_all(state, frames, Rs, Ts):
            init = (state, jnp.zeros(shape, jnp.float32),
                    jnp.zeros(shape, jnp.int8),
                    jnp.zeros((shape[0],), bool),
                    jnp.zeros(shape, jnp.float32), jnp.zeros(shape, bool))
            (state, esdf, *_), (ov, sweeps) = jax.lax.scan(
                one_frame, init, (frames, Rs, Ts))
            return (jnp.sum(state.channels["TSDF"].astype(jnp.float32)) +
                    jnp.sum(esdf), jnp.max(ov), jnp.sum(sweeps))
        return run_all

    state = tsdf_ops.make_tsdf_state(base)
    if "--split" in sys.argv:
        # fixed-count sweeps (esdf_force_sweeps: every slab active, no
        # early exit); the ms/frame slope over the budget = per-sweep
        # cost. "glue" variants patch the Pallas kernel to identity, so
        # the slope isolates halo assembly + diff/act + while staging +
        # pallas dispatch; real - glue = in-kernel VPU compute.
        import taichislam_tpu.ops.pallas.esdf_sweep as ks
        real_kernel = ks.esdf_sweep_pallas

        def fake_kernel(esdf_h, *a, **kw):
            return esdf_h
        variants = []
        for b in (8, 16, 24):
            variants.append((f"forced real b={b:<2}       ",
                             dict(esdf_force_sweeps=True), b, False))
            variants.append((f"forced glue b={b:<2}       ",
                             dict(esdf_force_sweeps=True), b, True))
    elif "--cadence" in sys.argv:
        # loop-kernel cadence sweep: periodic scans trade per-sweep VPU
        # cost for fewer total sweeps (cross-block propagation speedup)
        variants = [
            (f"drained ss=1 p={p}      ",
             dict(esdf_scan_sweeps=1, esdf_scan_period=p), 32, False)
            for p in (0, 3, 4, 6, 8)
        ]
    else:
        variants = [
            ("budg3 ss=1 (primary ref)", dict(esdf_scan_sweeps=1), 3,
             False),
            ("drained ss=1 p=0 (cur)  ", dict(esdf_scan_sweeps=1), 32,
             False),
            ("drained ss=2 p=0        ", dict(esdf_scan_sweeps=2), 32,
             False),
            ("drained ss=-1 (every)   ", dict(esdf_scan_sweeps=-1), 32,
             False),
        ]
    for label, kw, budget, fake in variants:
        if "--split" in sys.argv:
            ks.esdf_sweep_pallas = fake_kernel if fake else real_kernel
        cfg = dataclasses.replace(base, **kw)
        run = make_run(cfg, budget)
        s, ov, sw = run(state, frames_j, Rs_j, Ts_j)
        float(s)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            s, ov, sw = run(state, frames_j, Rs_j, Ts_j)
            float(s)
            best = min(best, time.perf_counter() - t0)
        ms = (best - lat) / n_frames * 1000
        print(f"{label}: {ms:.3f} ms/frame ({1000/ms:.1f} fps) "
              f"sweeps_total={int(sw)} ov={int(ov)}", flush=True)


if __name__ == "__main__":
    main()
