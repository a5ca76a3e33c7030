#!/usr/bin/env python
"""Bit-exactness check: the Pallas sweep kernel inside the sharded ESDF.

Runs on a REAL TPU (a 1-device ``jax.sharding.Mesh`` over the attached
chip): builds a small map, updates it with the single-device XLA-body
``ops.esdf.esdf_update``, then with ``parallel.sharded_esdf_update``
driving the fused Pallas kernel per chunk (``pallas="on"``), and asserts
the two programs bit-identical — field, fixed flags, sweep counts, and
re-queue bitmaps — across several incremental frames.

Invoked by tests/test_parallel_tpu.py as a subprocess (the test suite's
conftest pins JAX to the virtual CPU mesh; this check needs the real
chip). Exit 0 + "OK" on success; exits 77 (skip) when no TPU is attached.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    import jax

    if jax.default_backend() not in ("tpu", "axon") and not any(
            d.platform == "tpu" for d in jax.devices()):
        print("SKIP: no TPU attached")
        return 77
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from taichislam_tpu.core.config import TSDFConfig
    from taichislam_tpu.ops import esdf as esdf_ops
    from taichislam_tpu.ops import tsdf as tsdf_ops
    from taichislam_tpu.parallel.block_sharded import shard_state
    from taichislam_tpu.parallel.sharded_esdf import sharded_esdf_update

    cfg = TSDFConfig(map_scale=(6.4, 3.2), voxel_scale=0.1,
                     num_voxel_per_blk_axis=8, max_ray_length=2.0,
                     min_ray_length=0.3, max_blocks=255, max_bins=8192,
                     max_touched_blocks=128, max_march_lanes=65536,
                     # comparison target is the XLA body on both sides;
                     # the sharded build then swaps in the Pallas kernel
                     pallas_esdf="off", esdf_loop_kernel="off")
    K = jnp.asarray([40.0, 0, 32.0, 0, 40.0, 24.0, 0, 0, 1], jnp.float32)
    tex = jnp.zeros((1, 1, 3), jnp.uint8)

    # deterministic synthetic frames: a sloped wall seen from a moving cam
    jj, ii = np.meshgrid(np.arange(48), np.arange(64), indexing="ij")
    frames = [(900 + 60 * t + 4.0 * ii + 2.0 * jj).astype(np.uint16)
              for t in range(4)]
    Ts = [np.array([0.05 * t, 0.02 * t, 0.0], np.float32) for t in range(4)]
    eye = jnp.eye(3, dtype=jnp.float32)

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("block",))
    BC = 128
    fn_sharded = sharded_esdf_update(cfg, 16, BC, mesh, incremental=True,
                                     pallas="on")

    nb = cfg.grid.max_blocks + 1
    shape = (nb, cfg.grid.voxels_per_block)
    state = tsdf_ops.make_tsdf_state(cfg)
    esdf_a = jnp.zeros(shape, jnp.float32)
    fixed_a = jnp.zeros(shape, jnp.int8)
    esdf_b, fixed_b = esdf_a, fixed_a
    pend_a = pend_b = jnp.zeros((nb,), bool)

    for t in range(4):
        state, stats = tsdf_ops.integrate_depth(
            cfg, state, jnp.asarray(frames[t]), tex, eye,
            jnp.asarray(Ts[t]), K, K, jnp.int32(0))
        dirty = stats["touched_blocks"]
        # single-device reference (XLA body)
        esdf_a, fixed_a, _, sw_a, chg_a, ov_a = esdf_ops.esdf_update(
            cfg, 16, BC, state, esdf_a, fixed_a, jnp.int32(0),
            dirty | pend_a)
        pend_a = chg_a
        # sharded composition with the Pallas chunk kernel
        st_sh = shard_state(state, mesh)
        esdf_b, fixed_b, _, sw_b, chg_b, ov_b = fn_sharded(
            st_sh, esdf_b, fixed_b, jnp.int32(0), dirty | pend_b)
        pend_b = chg_b

        assert int(ov_a) == int(ov_b) == 0, (int(ov_a), int(ov_b))
        assert int(sw_a) == int(sw_b), (t, int(sw_a), int(sw_b))
        ea, eb = np.asarray(esdf_a), np.asarray(esdf_b)
        if not np.array_equal(ea, eb):
            bad = np.argwhere(ea != eb)
            print(f"frame {t}: {len(bad)} mismatched voxels, first "
                  f"{bad[0]}: {ea[tuple(bad[0])]} vs {eb[tuple(bad[0])]}")
            return 1
        assert np.array_equal(np.asarray(fixed_a), np.asarray(fixed_b)), t
        assert np.array_equal(np.asarray(chg_a), np.asarray(chg_b)), t
        assert int(jnp.sum(jnp.abs(esdf_a))) >= 0
    n_obs = int(jnp.sum(jnp.abs(esdf_a) > 0))
    assert n_obs > 1000, n_obs   # the field actually holds distances
    print(f"OK: sharded-pallas == single-device XLA bit-exact over 4 "
          f"frames ({n_obs} nonzero voxels, last sweep count "
          f"{int(sw_a)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
