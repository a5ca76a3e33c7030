#!/usr/bin/env python
"""Benchmark: the BASELINE.json north-star metric on one chip.

Primary metric (the printed JSON line): 640x480 depth frames fused into a
0.05 m TSDF **with per-frame incremental ESDF** — the full metric named by
BASELINE.json ("depth frames/sec fused @640x480 (0.05m TSDF)" with
"per-frame incremental ESDF" from the north-star text). vs_baseline is
measured fps / 200.

Secondary fields (same JSON object): fusion-only fps, marching-cubes full-map
ms (the metric string's second half), and fusion fps on a production-shaped
8192-block map (the headline must not depend on scene-sized capacity).

Honesty guards: the bin bucket is sized to the WORST frame and the run
asserts zero capacity-dropped rays / ESDF working-set overflows across all
timed frames (an under-sized capacity cannot silently cheat).

Measurement notes: on the axon relay, ``block_until_ready`` does not
actually wait for device completion, so all N frames are chained through one
``lax.scan`` inside a single jit and the timing is closed by a scalar
readback; the tiny-readback RPC latency is measured separately and
subtracted. The scan state-carry itself measures 0.01 ms/frame
(tools/exp_carry.py) — chaining adds nothing.
"""

import dataclasses
import json
import time

import numpy as np


def make_inputs(n_frames=50):
    """D435-like sequence: a STATIC world (room + furniture boxes) observed
    by an orbiting camera with +-3 mm sensor noise — the reference's actual
    use case (a static scene mapped from a moving robot; the D435 bag). A
    round-1 bench scene instead wobbled the entire world coherently by up
    to 40 mm per frame, which forces a global ESDF field update every
    frame — physically a moving world, not SLAM.

    The render is deterministic (seed 0), so it caches to /tmp: repeat
    bench/experiment runs in one sandbox skip the ~60 s host raytrace."""
    import os
    cache = f"/tmp/taichislam_bench_scene_v2_{n_frames}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        return z["depth"], z["Rs"], z["Ts"]
    from taichislam_tpu.utils.synthetic_scene import orbit_sequence
    depth, Rs, Ts, K = orbit_sequence(n_frames=n_frames, noise_mm=3.0)
    try:
        np.savez(cache, depth=depth, Rs=Rs, Ts=Ts)
    except OSError:
        pass
    return depth, Rs, Ts


def main():
    import sys

    def note(msg, _t0=[time.time()]):
        print(f"[bench +{time.time()-_t0[0]:.0f}s] {msg}",
              file=sys.stderr, flush=True)

    import jax
    import jax.numpy as jnp

    # cold-cache discipline (the driver runs fresh processes): a persistent
    # compile cache makes repeat runs on the same host ~free, and the
    # first-ever run precompiles every known-shape executable CONCURRENTLY
    # below (the relay compiles overlap ~2x) before the sequential stages
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/taichislam_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from taichislam_tpu.core.config import TSDFConfig
    from taichislam_tpu.models.dense_tsdf import bin_bucket_for
    from taichislam_tpu.ops import esdf as esdf_ops
    from taichislam_tpu.ops import tsdf as tsdf_ops

    note("imports done")
    n_frames = 50
    frames, Rs, Ts = make_inputs(n_frames)
    note("scene rendered")
    frames_j = jnp.asarray(frames)
    Rs_j, Ts_j = jnp.asarray(Rs), jnp.asarray(Ts)
    jax.block_until_ready(frames_j)
    note("frames uploaded")
    texture = jnp.zeros((1, 1, 3), jnp.uint8)
    from taichislam_tpu.utils.synthetic_scene import D435_K
    K = jnp.asarray(D435_K)

    # map capacity comfortably above the scene's ~1k observed blocks; the
    # zero-drop guard below counts alloc_overflow so an under-sized
    # capacity cannot silently cheat. (A production-shaped 8192-block map
    # is measured too — see the secondary field.)
    # storage_dtype float16 matches the reference's f16 fields
    # (dense_tsdf.py:92-106) at half the HBM traffic; measured within ~2%
    # of f32 end-to-end with 2.8 mm max TSDF deviation
    # (tools/exp_f16_storage.py)
    # capacities start at this scene's measured steady state (sized_bins /
    # sized_march_lanes of the last recorded run) so the grow/shrink loop
    # usually confirms them in ONE compile; the zero-drop guard still
    # corrects them if the scene or kernels change
    cfg = TSDFConfig(
        map_scale=(10.0, 10.0), voxel_scale=0.05, num_voxel_per_blk_axis=16,
        max_ray_length=3.0, min_ray_length=0.3, recast_step=2,
        max_blocks=2048, max_bins=8192, max_submap_num=64,
        max_touched_blocks=256, max_march_lanes=524288,
        storage_dtype="float16")

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

    def make_run(cfg, esdf_cap=None, budget=6):
        """Scan all frames: integrate + per-frame incremental ESDF in the
        block-incremental mode (ops/esdf.py: esdf_seed_dirty ->
        updated-voxel gated working set -> esdf_update over the compacted
        dirty blocks + frozen rim, budget-bounded sweeps, residual
        wavefronts re-queued into the next frame via the pending bitmap —
        voxblox's amortized queue behavior). The dirty-WINDOW mode
        (esdf_update_dense + dirty_blocks) was measured SLOWER here: the
        static window must be sized to the worst frame's dirty bbox, and
        the cold-start frames cover the whole room, so every frame pays a
        full-map window (34 fps vs 176). It remains the model layer's
        fast path for compact working sets. esdf_cap=None disables ESDF."""
        spec = cfg.grid
        shape = (spec.max_blocks + 1, spec.voxels_per_block)

        def one_frame(carry, inputs):
            state, esdf, fixed, pending, seen_t, seen_o = carry
            depth, R, T = inputs
            state, stats = tsdf_ops.integrate_depth(
                cfg, state, depth, texture, R, T, K, K, jnp.int32(0))
            if esdf_cap:
                dirty, seen_t, seen_o = esdf_ops.esdf_seed_dirty(
                    cfg, state, seen_t, seen_o, stats["touched_blocks"])
                dirty = dirty | pending
                # consume-once snapshot seeds (ops/esdf.py esdf_update):
                # re-queued blocks sweep on the seeds they were gated
                # with, so sub-gate jitter cannot churn the field
                esdf, fixed, _, _, pending, ov = esdf_ops.esdf_update(
                    cfg, budget, esdf_cap, state, esdf, fixed,
                    jnp.int32(0), dirty, tsdf_src=seen_t, obs_src=seen_o)
            else:
                ov = jnp.int32(0)
            drop_fuse = (stats["alloc_overflow"] + stats["touched_dropped"]
                         + stats["lanes_dropped"])
            total_bins = stats["num_bins"] + stats["bins_dropped"]
            return (state, esdf, fixed, pending, seen_t, seen_o), \
                (drop_fuse, ov, total_bins, stats["live_lanes"])

        @jax.jit
        def run_all(state, frames, Rs, Ts):
            esdf0 = jnp.zeros(shape, jnp.float32)
            fixed0 = jnp.zeros(shape, jnp.int8)
            pend0 = jnp.zeros((shape[0],), bool)
            seen_t0 = jnp.zeros(shape, jnp.float32)
            seen_o0 = jnp.zeros(shape, bool)
            carry0 = (state, esdf0, fixed0, pend0, seen_t0, seen_o0)
            (state, esdf, *_), (drop_fuse, ov, total_bins, live) = \
                jax.lax.scan(one_frame, carry0, (frames, Rs, Ts))
            # scalar readback closes the timing; drop stats guard honesty
            return (jnp.sum(state.channels["TSDF"].astype(jnp.float32)) +
                    jnp.sum(esdf),
                    jnp.max(drop_fuse), jnp.max(ov), jnp.max(total_bins),
                    jnp.max(live))
        return run_all

    def size_and_time(cfg, esdf_cap=None, budget=6):
        """Grow capacities until zero drops, then time. Returns
        (ms_per_frame, cfg)."""
        state = tsdf_ops.make_tsdf_state(cfg)
        run_all = make_run(cfg, esdf_cap, budget)
        s0, dropped, esdf_ov, max_bins, max_live = run_all(
            state, frames_j, Rs_j, Ts_j)
        float(s0)
        for _ in range(7):
            want = bin_bucket_for(int(max_bins))
            # lane cap: bucket of the worst frame's live-lane count — the
            # post-sort slice is then lossless (guarded below); re-derived
            # whenever other capacities change the lattice
            want_lanes = bin_bucket_for(int(max_live))
            if int(esdf_ov) > 0:
                need = esdf_cap + int(esdf_ov)
                while esdf_cap < need:
                    esdf_cap *= 2
            elif int(dropped) == 0 and want >= cfg.max_bins and \
                    cfg.max_march_lanes == want_lanes:
                break
            elif int(dropped) == 0 and want < cfg.max_bins:
                cfg = dataclasses.replace(cfg, max_bins=want,
                                          max_march_lanes=want_lanes)
            elif int(dropped) == 0:
                cfg = dataclasses.replace(cfg, max_march_lanes=want_lanes)
            else:
                cfg = dataclasses.replace(
                    cfg, max_bins=max(want, cfg.max_bins),
                    max_march_lanes=want_lanes,
                    max_touched_blocks=cfg.max_touched_blocks * 2)
            run_all = make_run(cfg, esdf_cap, budget)
            s0, dropped, esdf_ov, max_bins, max_live = run_all(
                state, frames_j, Rs_j, Ts_j)
            float(s0)
        # the guard: the timed executable must have dropped NOTHING
        assert int(dropped) == 0 and int(esdf_ov) == 0, \
            f"capacity drops in timed run: {dropped} esdf_ov: {esdf_ov}"

        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sval, drp, ov2, _, _ = run_all(state, frames_j, Rs_j, Ts_j)
            float(sval)
            best = min(best, time.perf_counter() - t0)
        assert int(drp) == 0 and int(ov2) == 0
        return max(best - lat, 1e-9) / n_frames * 1000.0, cfg

    # ---- concurrent precompile of every known-shape executable --------------
    # The stages below normally confirm the recorded capacities in ONE
    # compile each; compiling those programs in parallel first (the axon
    # relay overlaps compiles ~2x) converts the serial ~6-compile chain
    # into roughly the longest single compile. Identical-HLO closures hit
    # the persistent cache, so the stage-built executables load from file
    # in seconds even though they are distinct Python callables. Failures
    # here are non-fatal: the stages just compile serially as before.
    note("concurrent precompile")
    esdf_cfg0 = dataclasses.replace(cfg, esdf_raise_slack_voxels=0.5,
                                    esdf_converge_eps=2e-3)
    big_cfg0 = dataclasses.replace(cfg, max_blocks=8192,
                                   map_scale=(40.0, 10.0))

    def _pc_run(c, cap, budget):
        def f():
            st = tsdf_ops.make_tsdf_state(c)
            make_run(c, cap, budget).lower(st, frames_j, Rs_j,
                                           Ts_j).compile()
        return f

    def _pc_mc():
        from taichislam_tpu.ops import marching_cubes as mc_ops_pc
        st = tsdf_ops.make_tsdf_state(cfg)
        thres0 = jnp.float32(cfg.tsdf_surface_thres)

        @jax.jit
        def f(state, k):
            def body(i, acc):
                out = mc_ops_pc.extract_mesh(cfg, 1 << 18, 1, 256, state,
                                             jnp.int32(0), thres0 + 0.0 * acc,
                                             block_mask=None)
                return acc + out["num_triangles"].astype(jnp.float32)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        f.lower(st, jnp.int32(6)).compile()

    def _pc_build():
        st = tsdf_ops.make_tsdf_state(cfg)

        @jax.jit
        def b(state, frames, Rs, Ts):
            def body(s, inputs):
                depth, R, T = inputs
                s, _ = tsdf_ops.integrate_depth(cfg, s, depth, texture,
                                                R, T, K, K, jnp.int32(0))
                return s, None
            s, _ = jax.lax.scan(body, state, (frames, Rs, Ts))
            return s
        b.lower(st, frames_j, Rs_j, Ts_j).compile()

    from concurrent.futures import ThreadPoolExecutor
    tasks = [_pc_run(cfg, None, 6), _pc_run(esdf_cfg0, 256, 3),
             _pc_run(esdf_cfg0, 256, 32), _pc_run(big_cfg0, None, 6),
             _pc_mc, _pc_build]
    try:
        with ThreadPoolExecutor(len(tasks)) as ex:
            for r in ex.map(lambda t: t(), tasks):
                pass
    except Exception as e:      # pragma: no cover - defensive
        print(f"[bench] precompile failed (continuing serial): {e!r}",
              file=sys.stderr)

    # ---- size bins on fusion-only ------------------------------------------
    note("sizing fusion-only")
    ms_fuse, cfg_sized = size_and_time(cfg, esdf_cap=None)
    fps_fuse = 1000.0 / ms_fuse

    from taichislam_tpu.ops import marching_cubes as mc_ops
    state = tsdf_ops.make_tsdf_state(cfg_sized)

    @jax.jit
    def build(state, frames, Rs, Ts):
        def body(st, inputs):
            depth, R, T = inputs
            st, _ = tsdf_ops.integrate_depth(cfg_sized, st, depth, texture,
                                             R, T, K, K, jnp.int32(0))
            return st, None
        st, _ = jax.lax.scan(body, state, (frames, Rs, Ts))
        return st
    full_state = build(state, frames_j, Rs_j, Ts_j)
    jax.block_until_ready(full_state.channels["TSDF"])
    sb_cap = 256
    thres = jnp.float32(cfg_sized.tsdf_surface_thres)

    # ---- primary: fusion + per-frame incremental ESDF -----------------------
    # The ESDF runs EVERY frame with a bounded sweep budget; residual
    # wavefronts continue next frame (voxblox's production behavior: its
    # raise/lower queues are also budget-bounded per cycle). The fixed point
    # is exact once drained — property-tested in tests/test_esdf.py.
    # Production field knobs (documented bounded-staleness, all tighter
    # than voxblox's min_diff_m=0.05 m default): raise hysteresis 0.5
    # voxels (0.025 m), convergence eps 2 mm (sensor noise floor), seed
    # gating 0.25 voxels (cfg default).
    esdf_cfg = dataclasses.replace(cfg_sized, esdf_raise_slack_voxels=0.5,
                                   esdf_converge_eps=2e-3)
    note("fusion+esdf budget 3")
    ms_esdf, _ = size_and_time(esdf_cfg, esdf_cap=256, budget=3)
    fps_esdf = 1000.0 / ms_esdf

    # ---- secondary: ESDF drained to convergence every frame -----------------
    note("fusion+esdf drained")
    ms_drained, _ = size_and_time(esdf_cfg, esdf_cap=256, budget=32)

    def make_mc_timer(mt, cap, mask, st_ref):
        """ONE compiled executable timing k back-to-back extractions
        (k is a traced fori_loop bound, so k=6 and k=2 share the compile
        — compile count is what bounds this bench's wall time)."""
        @jax.jit
        def f(state, k):
            def body(i, acc):
                out = mc_ops.extract_mesh(cfg_sized, mt, 1, cap, state,
                                          jnp.int32(0), thres + 0.0 * acc,
                                          block_mask=mask)
                return acc + out["num_triangles"].astype(jnp.float32)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        def timed(k):
            kj = jnp.int32(k)
            float(f(st_ref, kj))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(st_ref, kj))
                best = min(best, time.perf_counter() - t0)
            return best
        return timed
    note("marching cubes full map")
    run_mc = make_mc_timer(1 << 18, sb_cap, None, full_state)
    mc_ms = (run_mc(6) - run_mc(2)) / 4 * 1000.0

    # ---- secondary: incremental re-mesh (per-frame dirty working set) ------
    # one more frame integrated on the converged map -> its touched-block
    # bitmap (the mesh-dirty protocol's per-frame input), 26-dilated (halo
    # dependencies), extraction restricted to that set — the device cost
    # the node pays per frame with the incremental mesher
    # (models/mesher.py) instead of the full-map extraction above.
    note("incremental re-mesh")
    st2, stats2 = jax.jit(
        lambda st, d, Rf, Tf: tsdf_ops.integrate_depth(
            cfg_sized, st, d, texture, Rf, Tf, K, K, jnp.int32(0)))(
        full_state, frames_j[0], Rs_j[0], Ts_j[0])
    dil = mc_ops.dilate_blocks(cfg_sized, st2, jnp.int32(0),
                               stats2["touched_blocks"])
    # size the caps in ONE probe (the masked surface-block count is
    # <= n_dirty, so a pow2-of-n_dirty block cap never drops; the probe's
    # huge triangle cap then reports the exact total): a grow-and-retry
    # loop here costs one ~25 s recompile per doubling
    n_dirty = int(jnp.sum(dil))
    cap_inc = 64
    while cap_inc < n_dirty:
        cap_inc *= 2
    probe = mc_ops.extract_mesh(cfg_sized, 1 << 18, 1, cap_inc, st2,
                                jnp.int32(0), thres, block_mask=dil)
    pk = np.asarray(jnp.stack([probe["total_triangles"],
                               probe["surface_blocks_dropped"],
                               probe["num_surface_blocks"]]))
    assert int(pk[1]) == 0, pk
    mt_inc = 1 << 12
    while mt_inc < int(pk[0]):
        mt_inc *= 2
    # extraction compute scales with the STATIC block cap; only the dirty
    # blocks that actually hold surface are kept, so the steady-state cap
    # (what the mesher's adaptive bucket settles at) is pow2(kept)
    cap_kept = 64
    while cap_kept < int(pk[2]):
        cap_kept *= 2
    run_mc_inc = make_mc_timer(mt_inc, cap_kept, dil, st2)
    mesh_update_ms = (run_mc_inc(6) - run_mc_inc(2)) / 4 * 1000.0

    # ---- secondary: production-shaped map (8192 blocks) ---------------------
    note("8192-block map")
    big_cfg = dataclasses.replace(cfg_sized, max_blocks=8192,
                                  map_scale=(40.0, 10.0))
    ms_big, _ = size_and_time(big_cfg, esdf_cap=None)
    fps_big = 1000.0 / ms_big

    note("done; printing")
    print(json.dumps({
        "metric": "depth_fusion_esdf_fps_640x480_5cm",
        "value": round(fps_esdf, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps_esdf / 200.0, 3),
        "secondary": {
            "fusion_only_fps": round(fps_fuse, 2),
            "fusion_esdf_ms_per_frame": round(ms_esdf, 3),
            "esdf_budget_sweeps": 3,
            "esdf_drained_fps": round(1000.0 / ms_drained, 2),
            "marching_cubes_full_map_ms": round(mc_ms, 2),
            "mesh_update_ms": round(mesh_update_ms, 2),
            "mesh_dirty_blocks": n_dirty,
            "mesh_dirty_surface_blocks": int(pk[2]),
            "fusion_fps_8192_blocks": round(fps_big, 2),
            "n_frames": n_frames,
            "sized_bins": cfg_sized.max_bins,
            "sized_march_lanes": cfg_sized.max_march_lanes,
        },
    }))


if __name__ == "__main__":
    main()
