#!/usr/bin/env python
"""ESDF hot-loop diagnostics at the bench config: sweeps per frame and
per-sweep cost (K-scan differenced at fixed max_sweeps)."""

import sys

import numpy as np

sys.path.insert(0, ".")
from tools.profile_fusion import timed  # noqa: E402
from bench import make_inputs  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import dataclasses
    from taichislam_tpu.core.config import TSDFConfig
    from taichislam_tpu.models.dense_tsdf import bin_bucket_for
    from taichislam_tpu.ops import esdf as esdf_ops
    from taichislam_tpu.ops import tsdf as tsdf_ops

    frames, Rs, Ts = make_inputs(12)
    K = jnp.asarray([384.0, 0, 320.0, 0, 384.0, 240.0, 0, 0, 1], jnp.float32)
    texture = jnp.zeros((1, 1, 3), jnp.uint8)
    cfg = TSDFConfig(
        map_scale=(10.0, 10.0), voxel_scale=0.05, num_voxel_per_blk_axis=16,
        max_ray_length=3.0, min_ray_length=0.3, recast_step=2,
        max_blocks=256, max_bins=32768, max_submap_num=64,
        max_touched_blocks=256)
    state = tsdf_ops.make_tsdf_state(cfg)
    _, st = tsdf_ops.integrate_depth(cfg, state, jnp.asarray(frames[0]),
                                     texture, jnp.asarray(Rs[0]),
                                     jnp.asarray(Ts[0]), K, K, jnp.int32(0))
    cfg = dataclasses.replace(cfg, max_bins=bin_bucket_for(int(st["num_bins"])))
    state = tsdf_ops.make_tsdf_state(cfg)

    shape = (cfg.grid.max_blocks + 1, cfg.grid.voxels_per_block)
    cap = 256
    for label, cfg_v in (
            ("exact (adopt+scan)", cfg),
            ("monotone-only", dataclasses.replace(
                cfg, esdf_raise_slack_voxels=1e6))):
        print(f"--- {label} ---", flush=True)
        st = tsdf_ops.make_tsdf_state(cfg)
        esdf = jnp.zeros(shape, jnp.float32)
        fixed = jnp.zeros(shape, jnp.int8)
        pending = jnp.zeros((shape[0],), bool)
        for t in range(12):
            st, stats = tsdf_ops.integrate_depth(
                cfg_v, st, jnp.asarray(frames[t]), texture,
                jnp.asarray(Rs[t]), jnp.asarray(Ts[t]), K, K, jnp.int32(0))
            dirty = stats["touched_blocks"] | pending
            nd = int(jnp.sum(dirty))
            esdf, fixed, _, sweeps, pending, ov = esdf_ops.esdf_update(
                cfg_v, 64, cap, st, esdf, fixed, jnp.int32(0), dirty)
            print(f"frame {t}: dirty={nd} sweeps={int(sweeps)} "
                  f"pending={int(jnp.sum(pending))} ov={int(ov)}",
                  flush=True)
    state = st

    # per-sweep cost: cold start (zeros) so max_sweeps binds; K-scan
    # differenced. Slope between rows = ms per sweep.
    dirty = stats["touched_blocks"] | pending
    cold_e = jnp.zeros(shape, jnp.float32)
    cold_f = jnp.zeros(shape, jnp.int8)
    for ms in (1, 2, 4, 8):
        def fn(esdf_a, fixed_a):
            e, f, _, _, _, _ = esdf_ops.esdf_update(
                cfg, ms, cap, state, esdf_a, fixed_a, jnp.int32(0), dirty)
            return e
        print(f"max_sweeps={ms}: {timed(fn, (cold_e, cold_f), 0):7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
