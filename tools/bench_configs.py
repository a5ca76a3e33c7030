#!/usr/bin/env python
"""Run ALL five BASELINE.json benchmark configs and print a table.

The five configs (BASELINE.json "configs", referencing the stripped
data/ri_tsdf.npy + D435 bag — regenerated equivalents come from
tools/gen_fixtures.py):

  1. marching-cubes mesh extraction from the saved map
  2. octomap-style occupancy fusion on the recorded depth sequence
  3. voxblox-style TSDF fusion + per-frame incremental ESDF on the sequence
  4. voxgraph-style submap mapping (allocation, fusion, per-submap meshing)
  5. topology skeleton graph generation from the TSDF

Usage: python tools/bench_configs.py [--frames 40] [--cpu] [--quick]
(--quick shrinks the sequence/resolution for CI smoke; timing still prints)
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

ROWS = []


def row(config, metric, value, detail=""):
    ROWS.append((config, metric, value, detail))
    print(f"  -> {config}: {metric} = {value} {detail}", flush=True)


def _run_voxgraph_once(SubmapMapping, DenseTSDF, opts, K, n, depth_dev,
                       Rs, Ts, eye):
    """One full config-4 pass: fresh SubmapMapping, windowed bag-replay
    ingest with async keyframe finalize, full wire delivery (sync)."""
    sm = SubmapMapping(DenseTSDF, keyframe_step=max(2, n // 4),
                       async_finalize=True,
                       sub_opts=dict(opts, max_submap_num=64,
                                     max_disp_particles=1 << 18),
                       global_opts=dict(opts, max_blocks=2048,
                                        max_disp_particles=1 << 18))
    sm.set_dep_camera_intrinsic(K)
    for sub in (sm.submap_collection, sm.global_map):
        sub.capacity_check_interval = 8
    # recorded steady-state capacity buckets for this sequence (worst
    # window ~8.8k bins): seeding skips the first window's grow-and-redo
    # replay; the zero-drop verdicts still correct them if the scene or
    # kernels change
    sm.submap_collection._bin_bucket = min(
        12288, sm.submap_collection.cfg.max_bins)
    sm.recast_depth_sequence(
        (i, True, (eye, Ts[i]), (Rs[i], np.zeros(3, np.float32)),
         depth_dev[i], None) for i in range(n))
    sm.sync()   # the fps row includes full wire delivery
    return sm


def wall(fn, *a, reps=3, warms=1, **kw):
    """Warm ``warms`` times (compile + capacity-bucket settling — a model
    whose buckets grow during warm pass 1 compiles the settled shapes in
    pass 2, so the timed reps are steady-state dispatch), then time."""
    for _ in range(warms):
        fn(*a, **kw)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--quick", action="store_true",
                    help="small shapes for CI smoke")
    ap.add_argument("--only", type=str, default="",
                    help="comma-separated config numbers to run "
                    "(e.g. --only 3,5; 5 implies 3 — it reuses its map)")
    args = ap.parse_args()
    only = set(int(x) for x in args.only.split(",") if x)
    if 5 in only:
        only.add(3)

    def want(k):
        return not only or k in only
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # persistent executable cache (shared with bench.py): fresh processes
    # on the same host skip recompiles; the warm passes still run so every
    # timed row is steady-state dispatch
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/taichislam_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if args.quick:
        args.frames = min(args.frames, 6)

    from tools.gen_fixtures import ensure_map, ensure_sequence
    from taichislam_tpu.models.dense_tsdf import DenseTSDF
    from taichislam_tpu.models.dense_esdf import DenseESDF
    from taichislam_tpu.models.octomap import Octomap
    from taichislam_tpu.models.mesher import MarchingCubeMesher
    from taichislam_tpu.models.submap_mapping import SubmapMapping
    from taichislam_tpu.models.topo_graph import TopoGraphGen

    seq = ensure_sequence(args.frames)
    with np.load(seq) as z:
        depth, Rs, Ts, K = z["depth"], z["Rs"], z["Ts"], z["K"]
    if args.quick:
        depth = depth[:, ::4, ::4]
        K = K / 4.0
        K[8] = 1.0
    n = len(depth)
    base_opts = dict(map_scale=[10.0, 10.0], voxel_scale=0.05,
                     max_ray_length=5.1, min_ray_length=0.3,
                     max_blocks=4096)
    opts = dict(base_opts, num_voxel_per_blk_axis=16, max_bins=32768)

    # The decoded depth sequence is staged to the device ONCE, outside the
    # timed loops: bag decode/upload is I/O the reference also times
    # separately from mapping (the pcl2npy vs recast stage prints,
    # taichislam_node.py:405). Model APIs accept device-resident frames
    # without copying, so the timed loops below measure dispatch + compute,
    # not this sandbox's ~13 MB/s relay uplink re-shipping every window.
    import jax.numpy as jnp
    depth_dev = jnp.asarray(depth)
    eye = np.eye(3, dtype=np.float32)

    # ---- parallel warm phase -------------------------------------------------
    # Cold-cache wall clock is compile-bound: each config's first pass
    # compiles its executables through the relay SERIALLY. Running one
    # throwaway pass of every wanted ingest config concurrently overlaps
    # those compiles (~2x on the relay); the in-process jit caches (the
    # ops are module-level jits keyed on static shapes) then serve the
    # timed sections below. Results are discarded — every printed row
    # still comes from the sequential steady-state timings.
    import dataclasses

    def _warm_c2():
        o = Octomap(K=2, min_occupy_thres=2, **base_opts)
        o.set_dep_camera_intrinsic(K)
        for i in range(n):
            o.recast_depth_to_map(Rs[i], Ts[i], depth_dev[i], None)

    def _warm_c3_percall():
        e = DenseESDF(max_submap_num=8, esdf_check_interval=8,
                      max_esdf_sweeps=8, esdf_raise_slack_voxels=0.5,
                      **opts)
        e.cfg = dataclasses.replace(e.cfg, esdf_converge_eps=2e-3)
        e.capacity_check_interval = 8
        e.set_dep_camera_intrinsic(K)
        for _ in range(2):      # pass 2 compiles the settled buckets
            for i in range(n):
                e.recast_depth_to_map(Rs[i], Ts[i], depth_dev[i], None)
        if want(5):             # config 5 reuses config 3's map
            topo = TopoGraphGen(e, coll_det_num=64, max_raycast_dist=2.5)
            xyz, ev = e.get_voxels_ESDF_slice(0.0)
            k = e.num_export_ESDF_particles
            topo.generate_topo_graph(xyz[:k][np.argmax(ev[:k])],
                                     max_nodes=16)

    def _warm_c3_windowed():
        e = DenseESDF(max_submap_num=8, max_esdf_sweeps=8,
                      esdf_raise_slack_voxels=0.5, **opts)
        e.cfg = dataclasses.replace(e.cfg, esdf_converge_eps=2e-3)
        e.set_dep_camera_intrinsic(K)
        W = max(1, min(20, n))
        for _ in range(2):
            for i in range(0, n, W):
                e.recast_depth_sequence(Rs[i:i + W], Ts[i:i + W],
                                        depth_dev[i:i + W])

    def _warm_c1():
        m = DenseTSDF.loadMap(ensure_map(args.frames))
        MarchingCubeMesher(m, max_triangles=1 << 19).generate_mesh(1)

    warm_fns = []
    if want(1):
        warm_fns.append(_warm_c1)
    if want(2):
        warm_fns.append(_warm_c2)
    if want(3):
        warm_fns.extend([_warm_c3_percall, _warm_c3_windowed])
    def _warm_c4():
        sm = _run_voxgraph_once(SubmapMapping, DenseTSDF, opts, K, n,
                                depth_dev, Rs, Ts, eye)
        sm.local_to_global()
        gm = MarchingCubeMesher(sm.global_map, max_triangles=1 << 17)
        sm.global_map._mark_mesh_dirty_full()
        gm.generate_mesh(1)

    if want(4):
        warm_fns.append(_warm_c4)
    if len(warm_fns) > 1:
        from concurrent.futures import ThreadPoolExecutor
        t0 = time.perf_counter()
        with ThreadPoolExecutor(len(warm_fns)) as ex:
            for _ in ex.map(lambda f: f(), warm_fns):
                pass
        print(f"[bench_configs] parallel warm phase: "
              f"{time.perf_counter()-t0:.0f}s", flush=True)

    # ---- config 1: marching cubes from the saved map ------------------------
    if want(1):
        m = DenseTSDF.loadMap(ensure_map(args.frames))
        mesher = MarchingCubeMesher(m, max_triangles=1 << 19)

        def mesh_full():
            # the incremental mesher no-ops on a clean map; each rep must
            # time a real full extraction
            m._mark_mesh_dirty_full()
            mesher.generate_mesh(1)
        t, _ = wall(mesh_full)
        row("1 marching-cubes (saved map)", "ms/extraction",
            round(t * 1000, 2), f"({mesher.num_facelets} triangles, "
            f"{m.count_active()} voxels)")

    # ---- config 2: octomap occupancy fusion ---------------------------------
    if want(2):
        octo = Octomap(K=2, min_occupy_thres=2, **base_opts)
        octo.set_dep_camera_intrinsic(K)

        def run_octo():
            for i in range(n):
                octo.recast_depth_to_map(Rs[i], Ts[i], depth_dev[i], None)
        t, _ = wall(run_octo, reps=1)
        row("2 octomap fusion (D435-like seq)", "fps", round(n / t, 1),
            f"({n} frames 640x480)" if not args.quick else f"({n} frames)")

    # ---- config 3: TSDF + per-frame incremental ESDF ------------------------
    # deferred capacity checks: on the axon relay every host sync costs a
    # full RPC round-trip, so the per-call API numbers here are gated by
    # check cadence, not device compute (the jitted inner-loop numbers are
    # bench.py's scan-chained metric)
    # production ESDF knobs (bench.py's primary metric uses the same):
    # budget-bounded sweeps with cross-frame re-queue, 0.5-voxel raise
    # hysteresis, 2 mm convergence eps — the exactness-tuned defaults
    # (slack 0, eps 0.1 mm, drain to 64 sweeps) are for tests
    import dataclasses
    if want(3):
        esdf = DenseESDF(max_submap_num=8, esdf_check_interval=8,
                         max_esdf_sweeps=8, esdf_raise_slack_voxels=0.5,
                         **opts)
        esdf.cfg = dataclasses.replace(esdf.cfg, esdf_converge_eps=2e-3)
        esdf.capacity_check_interval = 8
        esdf.set_dep_camera_intrinsic(K)

        def run_esdf():
            for i in range(n):
                esdf.recast_depth_to_map(Rs[i], Ts[i], depth_dev[i], None)
        # warms=2: pass 1 grows capacity buckets, pass 2 compiles the
        # settled shapes — the timed rep must not hide a recompile
        t, _ = wall(run_esdf, reps=1, warms=2)
        row("3 TSDF + incremental ESDF (per-call)", "fps", round(n / t, 1),
            f"(per-frame ESDF, last {esdf.last_esdf_sweeps} sweeps)")

        # same workload through the multi-frame ingest API
        # (ops/sequence.py): bag replay ingests a window per dispatch,
        # amortizing the per-call dispatch cost the row above pays on
        # every frame
        esdf_w = DenseESDF(max_submap_num=8, max_esdf_sweeps=8,
                           esdf_raise_slack_voxels=0.5, **opts)
        esdf_w.cfg = dataclasses.replace(esdf_w.cfg,
                                         esdf_converge_eps=2e-3)
        esdf_w.set_dep_camera_intrinsic(K)
        W = max(1, min(20, n))

        def run_esdf_seq():
            for i in range(0, n, W):
                esdf_w.recast_depth_sequence(Rs[i:i + W], Ts[i:i + W],
                                             depth_dev[i:i + W])
        t, _ = wall(run_esdf_seq, reps=1, warms=2)
        row("3 TSDF + incremental ESDF (windowed)", "fps", round(n / t, 1),
            f"(window={W} frames/dispatch)")

    # ---- config 4: voxgraph-style submap mapping -----------------------------
    # incremental_fuse: keyframe finalize splats only the finished submap
    # into the global map (full reset+refuse only after PGO moves —
    # equivalence-tested in tests/test_submap.py). The ingest loop runs
    # TWICE with fresh state: capacity buckets grow as submaps fill, and
    # each new bucket is a fresh executable (compile cached on any real
    # deployment after the first bag); pass 2 is the steady-state number.
    # bag-replay ingest: frames between keyframe boundaries fuse through
    # ONE dispatch window (ops/sequence.py); the submap lifecycle at the
    # split points is the async finalize — one packed scalar fetch per
    # boundary, submap wire delivery on the worker thread, deferred fuse
    # verdict. Each pass builds a FRESH SubmapMapping (capacity buckets
    # re-grow deterministically through compile-cached shapes).
    if want(4):
        def run_voxgraph():
            return _run_voxgraph_once(SubmapMapping, DenseTSDF, opts, K, n,
                                      depth_dev, Rs, Ts, eye)
        t_ingest, sm = wall(run_voxgraph, reps=1)
        row("4 voxgraph submap mapping", "fps ingest",
            round(n / t_ingest, 1), f"(submaps={len(sm.submaps)})")
        t_fuse, _ = wall(sm.local_to_global)
        gmesher = MarchingCubeMesher(sm.global_map, max_triangles=1 << 17)

        def gmesh_full():
            sm.global_map._mark_mesh_dirty_full()
            gmesher.generate_mesh(1)
        t_mesh, _ = wall(gmesh_full)
        row("4 voxgraph full fuse + global mesh", "ms",
            round(t_fuse * 1000, 1),
            f"(global mesh {t_mesh*1000:.1f} ms / {gmesher.num_facelets} "
            "tris)")

    # ---- config 5: topology skeleton graph ----------------------------------
    if want(5):
        topo_map = esdf
        topo = TopoGraphGen(topo_map, coll_det_num=64, max_raycast_dist=2.5)
        xyz, e = topo_map.get_voxels_ESDF_slice(0.0)
        k = topo_map.num_export_ESDF_particles
        seed = xyz[:k][np.argmax(e[:k])]

        def run_topo():
            topo.reset()
            return topo.generate_topo_graph(seed, max_nodes=16)
        t, nodes = wall(run_topo, reps=1)
        row("5 topo skeleton graph", "ms", round(t * 1000, 1),
            f"({nodes} nodes, {topo.num_facelets} facelets, "
            f"{len(topo.edges)} edges)")

    print("\n== BASELINE.json configs ==")
    wid = max(len(r[0]) for r in ROWS)
    for c, metric, v, d in ROWS:
        print(f"{c:<{wid}}  {metric:>12} {v:>10}  {d}")


if __name__ == "__main__":
    main()
