#!/usr/bin/env python
"""Latency-cancelling stage profile of the TSDF fusion pipeline.

The axon relay adds a large fixed RPC latency to any host readback and
`block_until_ready` does not synchronize, so each stage is timed by scanning
it K times inside ONE jit and differencing two K values — the per-iteration
cost comes out latency-free.

Usage: python tools/profile_fusion.py [--bins 8192]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, args, perturb_idx=1, k_lo=2, k_hi=12, reps=3):
    """Per-iteration time of ``fn`` via K-scan differencing.

    The scan body must depend on the carry or XLA hoists it out of the loop
    (loop-invariant code motion) and K-scaling vanishes; an opaque always-
    zero epsilon derived from the carry is added to args[perturb_idx]."""
    import jax
    import jax.numpy as jnp

    def run_k(k):
        @jax.jit
        def run(*a):
            def body(carry, _):
                eps = jnp.where(jnp.isnan(carry), 1.0, 0.0)  # 0, but opaque
                a2 = list(a)
                a2[perturb_idx] = a2[perturb_idx] + eps
                out = fn(*a2)
                return carry + jnp.sum(out.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
            return acc
        float(run(*args))  # compile+warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = run_k(k_lo), run_k(k_hi)
    return (t_hi - t_lo) / (k_hi - k_lo) * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bins", type=int, default=8192)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from taichislam_tpu.core.config import TSDFConfig
    from taichislam_tpu.core import geometry
    from taichislam_tpu.core.grid import (
        allocate_blocks, flat_voxel_index, lookup_slots, voxel_to_block)
    from taichislam_tpu.ops import tsdf as tsdf_ops

    cfg = TSDFConfig(map_scale=(10., 10.), voxel_scale=0.05,
                     num_voxel_per_blk_axis=16, max_ray_length=3.0,
                     min_ray_length=0.3, recast_step=2, max_blocks=8192,
                     max_bins=args.bins, max_submap_num=64)
    spec = cfg.grid
    nvox = (spec.max_blocks + 1) * spec.voxels_per_block
    state = tsdf_ops.make_tsdf_state(cfg)
    h, w = 480, 640
    K = jnp.asarray([384., 0, 320., 0, 384., 240., 0, 0, 1], jnp.float32)
    rng = np.random.default_rng(0)
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    depth = jnp.asarray(np.clip(1500 + 0.6 * ii + 0.3 * jj +
                                rng.normal(0, 5, (h, w)), 400,
                                2900).astype(np.uint16))
    texture = jnp.zeros((1, 1, 3), jnp.uint8)
    R = jnp.eye(3, dtype=jnp.float32)
    T = jnp.zeros(3, jnp.float32)

    def binning(depth, R):
        pts, dep, color, valid = tsdf_ops.depth_to_points(cfg, depth,
                                                          texture, K, K)
        pm = geometry.rotate_points(R, pts)
        return tsdf_ops.bin_points(cfg, pm, dep, color, valid).count

    print(f"binning:      {timed(binning, (depth, R)):7.2f} ms", flush=True)

    def upto(stage):
        def fn(depth, R, T):
            pts, dep, color, valid = tsdf_ops.depth_to_points(cfg, depth,
                                                              texture, K, K)
            pm = geometry.rotate_points(R, pts)
            bins = tsdf_ops.bin_points(cfg, pm, dep, color, valid)
            x, live, ds, wv, pos_p, zb = tsdf_ops._march_lattice(cfg, bins, T)
            if stage == "march":
                return wv
            xi = geometry.xyz_to_ijk(x, cfg.voxel_scale)
            s_m = jnp.zeros(xi.shape[:-1], jnp.int32)
            blin, intra, inb = voxel_to_block(spec, s_m, xi)
            mask = (live & inb).reshape(-1)
            if stage == "blocks":
                return blin
            st = allocate_blocks(spec, state, blin.reshape(-1), mask,
                                 jnp.int32(0))
            if stage == "alloc":
                return st.num_blocks
            slots = lookup_slots(spec, st.table, blin.reshape(-1))
            flat = flat_voxel_index(spec, slots, intra.reshape(-1))
            flat = jnp.where(mask, flat, nvox - 1)
            wf = jnp.where(mask, wv.reshape(-1), 0.0)
            wdf = wf * ds.reshape(-1)
            if stage == "flat":
                return flat
            acc = jnp.zeros((nvox, 2), jnp.float32).at[flat].add(
                jnp.stack([wf, wdf], -1))
            return acc[:, 0]
        return fn

    for stage in ["march", "blocks", "alloc", "flat", "scatter"]:
        print(f"upto {stage:8s} {timed(upto(stage), (depth, R, T)):7.2f} ms", flush=True)

    def full(depth, R, T):
        st, _ = tsdf_ops.integrate_depth(cfg, state, depth, texture, R, T,
                                         K, K, jnp.int32(0))
        return st.channels["W_TSDF"]

    print(f"full:         {timed(full, (depth, R, T)):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
