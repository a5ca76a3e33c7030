#!/usr/bin/env python
"""Budget-mode ESDF quality + timing: run budget-k and drained (32)
side-by-side in one scan on the orbit scene; report per-threshold
staleness fractions (p99 check) and in-scan ms/frame per budget."""

import sys
import time

sys.path.insert(0, ".")
import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from taichislam_tpu.core.config import TSDFConfig
    from taichislam_tpu.ops import esdf as esdf_ops
    from taichislam_tpu.ops import tsdf as tsdf_ops
    from taichislam_tpu.utils.synthetic_scene import D435_K
    import dataclasses

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
        max_touched_blocks=256, max_march_lanes=524288,
        esdf_raise_slack_voxels=0.5, esdf_converge_eps=2e-3,
        storage_dtype="float16")
    spec = cfg.grid
    shape = (spec.max_blocks + 1, spec.voxels_per_block)

    tiny = jax.jit(lambda x: jnp.sum(x))
    tv = jnp.ones((8,), jnp.float32)
    float(tiny(tv))
    lat = min((lambda t0: (float(tiny(tv)), time.perf_counter() - t0)[1])(
        time.perf_counter()) for _ in range(5))

    # ---- quality: budget-k vs drained in the SAME scan ---------------------
    def make_q(budget):
        def one_frame(carry, inputs):
            (state, eb, fb, pb, ed, fd, pd, st_, so_) = carry
            depth, R, T = inputs
            state, stats = tsdf_ops.integrate_depth(
                cfg, state, depth, texture, R, T, K, K, jnp.int32(0))
            dirty0, st_, so_ = esdf_ops.esdf_seed_dirty(
                cfg, state, st_, so_, stats["touched_blocks"])
            eb, fb, _, _, pb, ov1 = esdf_ops.esdf_update(
                cfg, budget, 256, state, eb, fb, jnp.int32(0), dirty0 | pb)
            ed, fd, part, _, pd, ov2 = esdf_ops.esdf_update(
                cfg, 32, 256, state, ed, fd, jnp.int32(0), dirty0 | pd)
            d = jnp.abs(jnp.where(part, eb - ed, 0.0))
            tot = jnp.sum(part.astype(jnp.int32))
            cnt = jnp.stack([jnp.sum((d > t).astype(jnp.int32))
                             for t in (0.01, 0.019, 0.03, 0.05)])
            return (state, eb, fb, pb, ed, fd, pd, st_, so_), \
                (d.max(), cnt, tot, ov1 + ov2)

        @jax.jit
        def run(state):
            z = jnp.zeros
            init = (state, z(shape, jnp.float32), z(shape, jnp.int8),
                    z((shape[0],), bool), z(shape, jnp.float32),
                    z(shape, jnp.int8), z((shape[0],), bool),
                    z(shape, jnp.float32), z(shape, bool))
            _, (mx, cnt, tot, ov) = jax.lax.scan(
                one_frame, init, (frames_j, Rs_j, Ts_j))
            return mx, cnt, tot, jnp.max(ov)
        return run

    for budget in (3,):
        mx, cnt, tot, ov = make_q(budget)(tsdf_ops.make_tsdf_state(cfg))
        mx, cnt, tot = np.asarray(mx), np.asarray(cnt), np.asarray(tot)
        fr = cnt.sum(0) / max(tot.sum(), 1)
        print(f"budget {budget}: max_stale={mx.max()*100:.1f}cm "
              f"frac>1cm={fr[0]:.4f} >1.9cm={fr[1]:.4f} >3cm={fr[2]:.4f} "
              f">5cm={fr[3]:.4f} ov={int(ov)}", flush=True)
        for f in range(0, 50, 3):
            fr_f = cnt[f] / max(tot[f], 1)
            print(f"  f{f:2d}: max={mx[f]*100:6.1f}cm >1.9cm={fr_f[1]:.4f} "
                  f">5cm={fr_f[3]:.4f}", flush=True)

    # ---- timing with current code (incl f16 sort lanes) --------------------
    def make_t(budget):
        def one_frame(carry, inputs):
            state, esdf, fixed, pending, st_, so_ = carry
            depth, R, T = inputs
            state, stats = tsdf_ops.integrate_depth(
                cfg, state, depth, texture, R, T, K, K, jnp.int32(0))
            if budget:
                dirty, st_, so_ = esdf_ops.esdf_seed_dirty(
                    cfg, state, st_, so_, stats["touched_blocks"])
                esdf, fixed, _, _, pending, ov = esdf_ops.esdf_update(
                    cfg, budget, 256, state, esdf, fixed, jnp.int32(0),
                    dirty | pending)
            else:
                ov = jnp.int32(0)
            return (state, esdf, fixed, pending, st_, so_), (ov,)

        @jax.jit
        def run(state):
            z = jnp.zeros
            init = (state, z(shape, jnp.float32), z(shape, jnp.int8),
                    z((shape[0],), bool), z(shape, jnp.float32),
                    z(shape, bool))
            (state, esdf, *_), (ov,) = jax.lax.scan(
                one_frame, init, (frames_j, Rs_j, Ts_j))
            return (jnp.sum(state.channels["TSDF"].astype(jnp.float32)) +
                    jnp.sum(esdf), jnp.max(ov))
        return run

    for budget, label in ((0, "fusion"), (3, "budget3"), (32, "drained")):
        run = make_t(budget)
        state = tsdf_ops.make_tsdf_state(cfg)
        s, ov = run(state)
        float(s)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            s, ov = run(state)
            float(s)
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {(best - lat) / n_frames * 1000:.3f} ms/frame "
              f"(ov={int(ov)})", flush=True)


if __name__ == "__main__":
    main()
