#!/usr/bin/env python
"""Breakdown of the block-incremental esdf_update FIXED overhead (cost at
zero sweeps) into stages, at the bench config's realized shapes."""

import sys

import numpy as np

sys.path.insert(0, ".")
from tools.profile_fusion import timed  # noqa: E402
from bench import make_inputs  # noqa: E402


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from taichislam_tpu.core.config import TSDFConfig
    from taichislam_tpu.ops import esdf as esdf_ops
    from taichislam_tpu.ops import tsdf as tsdf_ops

    n_frames = 31
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
    for i in range(n_frames):
        state, stats = tsdf_ops.integrate_depth(
            cfg, state, jnp.asarray(frames[i]), texture,
            jnp.asarray(Rs[i]), jnp.asarray(Ts[i]), K, K, jnp.int32(0))
        dirty, seen_t, seen_o = esdf_ops.esdf_seed_dirty(
            cfg, state, seen_t, seen_o, stats["touched_blocks"])
        dirty = dirty | pending
        if i == n_frames - 1:
            break
        esdf, fixed, _, _, pending, _ = esdf_ops.esdf_update(
            cfg, 6, 512, state, esdf, fixed, jnp.int32(0), dirty)

    cap = 256
    V = spec.V
    nb = spec.max_blocks + 1

    def f_budget0(_, e):
        return esdf_ops.esdf_update(cfg, 0, cap, state, e, fixed,
                                    jnp.int32(0), dirty)[0]

    def f_budget1(_, e):
        return esdf_ops.esdf_update(cfg, 1, cap, state, e, fixed,
                                    jnp.int32(0), dirty)[0]

    print(f"budget0 (fixed ovh): {timed(f_budget0, (None, esdf)):.3f} ms")
    print(f"budget1:             {timed(f_budget1, (None, esdf)):.3f} ms")

    # stage: neighbor slot table (hash probes for 27 neighbors x nb rows)
    def f_nsl(_, e):
        t = esdf_ops.neighbor_slot_table(spec, state, jnp.int32(0))
        return t.astype(jnp.float32).sum() + e[0, 0]
    print(f"neighbor_slot_table: {timed(f_nsl, (None, esdf)):.3f} ms")

    # stage: the 2x dilation (take over (nb,27) of bool) + compaction
    from taichislam_tpu.core.compaction import compact_mask

    def f_dil(_, e):
        nsl = esdf_ops.neighbor_slot_table(spec, state, jnp.int32(0))
        blk = state.block_active
        d = dirty.at[-1].set(False)
        dil = jnp.any(jnp.take(d, nsl.reshape(nb, 27), axis=0), axis=1) | d
        work = blk & dil
        rim = jnp.any(jnp.take(work, nsl.reshape(nb, 27), axis=0),
                      axis=1) | work
        bpos, bkept, btotal = compact_mask(blk & rim, cap)
        return bpos.astype(jnp.float32).sum() + e[0, 0]
    print(f"nsl+dilate+compact:  {timed(f_dil, (None, esdf)):.3f} ms")

    # stage: gcomp of 4 full channels (row gathers)
    def f_gcomp(_, e):
        slot_of = jnp.arange(cap, dtype=jnp.int32)
        acc = e[0, 0]
        for arr in (state.channels["TSDF"].astype(jnp.float32),
                    (state.channels["TSDF_observed"] > 0).astype(
                        jnp.float32), e, fixed.astype(jnp.float32)):
            acc = acc + jnp.take(arr, slot_of, axis=0).sum()
        return acc
    print(f"4x row gather (cap): {timed(f_gcomp, (None, esdf)):.3f} ms")

    # stage: sweep-layout conversion of 6 compact arrays
    def f_layout(_, e):
        g = jnp.take(e, jnp.arange(cap + 1, dtype=jnp.int32), axis=0)
        acc = 0.0
        for _i in range(6):
            acc = acc + esdf_ops._to_sweep_layout(g + _i, V, 0.0).sum()
        return acc
    print(f"6x to_sweep_layout:  {timed(f_layout, (None, esdf)):.3f} ms")

    # stage: epilogue-like full-size where + scatter
    def f_epi(_, e):
        part = (state.channels["TSDF_observed"] > 0)
        tgt = jnp.arange(cap, dtype=jnp.int32)
        rows = jnp.take(e, tgt, axis=0) + 1.0
        out = jnp.where(part, e, 0.0).at[tgt].set(rows, mode="drop")
        fr = jnp.where(part, fixed, 0).astype(jnp.int8).at[tgt].set(
            jnp.take(fixed, tgt, axis=0), mode="drop")
        return out.sum() + fr.astype(jnp.float32).sum()
    print(f"epilogue-like:       {timed(f_epi, (None, esdf)):.3f} ms")


if __name__ == "__main__":
    main()
