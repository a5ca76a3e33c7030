#!/usr/bin/env python
"""Block-incremental ESDF diagnostics at the bench config: per-frame dirty /
pending / working-set sizes on the orbit scene, and esdf_update cost split
into fixed overhead vs per-sweep cost at the realized cap."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from tools.profile_fusion import timed  # noqa: E402
from bench import make_inputs  # noqa: E402


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from taichislam_tpu.core.config import TSDFConfig
    from taichislam_tpu.models.dense_tsdf import bin_bucket_for
    from taichislam_tpu.ops import esdf as esdf_ops
    from taichislam_tpu.ops import tsdf as tsdf_ops

    n_frames = 50
    frames, Rs, Ts = make_inputs(n_frames)
    from taichislam_tpu.utils.synthetic_scene import D435_K
    K = jnp.asarray(D435_K)
    texture = jnp.zeros((1, 1, 3), jnp.uint8)
    cfg = TSDFConfig(
        map_scale=(10.0, 10.0), voxel_scale=0.05, num_voxel_per_blk_axis=16,
        max_ray_length=3.0, min_ray_length=0.3, recast_step=2,
        max_blocks=2048, max_bins=65536, max_submap_num=64,
        max_touched_blocks=512)
    cfg = dataclasses.replace(cfg, esdf_raise_slack_voxels=0.5,
                              esdf_converge_eps=2e-3)
    spec = cfg.grid
    shape = (spec.max_blocks + 1, spec.voxels_per_block)

    state = tsdf_ops.make_tsdf_state(cfg)
    esdf = jnp.zeros(shape, jnp.float32)
    fixed = jnp.zeros(shape, jnp.int8)
    seen_t = jnp.zeros(shape, jnp.float32)
    seen_o = jnp.zeros(shape, bool)
    pending = jnp.zeros((shape[0],), bool)

    nsl = None
    hist = []
    states = []
    for i in range(n_frames):
        state, stats = tsdf_ops.integrate_depth(
            cfg, state, jnp.asarray(frames[i]), texture,
            jnp.asarray(Rs[i]), jnp.asarray(Ts[i]), K, K, jnp.int32(0))
        dirty, seen_t, seen_o = esdf_ops.esdf_seed_dirty(
            cfg, state, seen_t, seen_o, stats["touched_blocks"])
        dirty = dirty | pending
        if i in (10, 30, 49):
            states.append((state, esdf, fixed, dirty))
        esdf, fixed, _, sweeps, pending, ov = esdf_ops.esdf_update(
            cfg, 6, 512, state, esdf, fixed, jnp.int32(0), dirty)
        hist.append((int(jnp.sum(stats["touched_blocks"])),
                     int(jnp.sum(dirty)), int(jnp.sum(pending)),
                     int(sweeps), int(ov)))
    print("frame (touched, dirty, pending, sweeps, ov):")
    for i in (0, 5, 10, 20, 30, 40, 49):
        print(f"  f{i}: {hist[i]}")
    print("nblocks:", int(state.num_blocks))

    # cost split at the realized shapes: time esdf_update at budget 1..6
    st, e0, f0, d0 = states[1]
    for cap in (256, 512):
        for budget in (1, 2, 6):
            def f(_, e):
                out = esdf_ops.esdf_update(cfg, budget, cap, st, e, f0,
                                           jnp.int32(0), d0)
                return out[0]
            ms = timed(f, (None, e0), perturb_idx=1)
            print(f"cap {cap} budget {budget}: {ms:.3f} ms")

    # seed_dirty cost
    def g(s, t):
        return esdf_ops.esdf_seed_dirty(cfg, st, t, seen_o,
                                        jnp.ones((shape[0],), bool))[1]
    ms = timed(g, (None, seen_t), perturb_idx=1)
    print(f"seed_dirty full pass: {ms:.3f} ms")


if __name__ == "__main__":
    main()
