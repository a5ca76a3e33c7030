"""SPMD multi-drone mapping over a TPU device mesh.

The reference exchanges submaps between drones over UDP multicast
(/root/reference/taichi_slam/utils/communication.py) and fuses them on every
peer. When a fleet is simulated (or co-located) on one TPU pod, this module
replaces that with collectives over ICI:

- each device owns one drone: its depth stream, pose, and submap collection
  (all arrays carry a leading ``drone`` axis sharded over the mesh);
- per-step, every device integrates its own frame (pure local compute);
- global fusion: every device computes its splat contributions into the
  *replicated* global grid, the touched-block bitmaps and dense accumulators
  are ``psum``-ed over the drone axis, and allocation runs on the psum'd
  bitmap — a deterministic prefix-sum, so every device derives the identical
  global map without any host round-trip (the TPU-native analog of
  "send submap + fuse on every peer", SURVEY.md §5.8).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from taichislam_tpu.core.config import TSDFConfig
from taichislam_tpu.core.grid import allocate_from_touched
from taichislam_tpu.ops import fusion as fusion_ops
from taichislam_tpu.ops import tsdf as tsdf_ops


def make_drone_states(cfg: TSDFConfig, n_drones: int):
    """Per-drone submap-collection states, stacked on a leading drone axis."""
    one = tsdf_ops.make_tsdf_state(cfg)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (n_drones,) + x.shape), one)


def multi_drone_step(sub_cfg: TSDFConfig, glob_cfg: TSDFConfig,
                     max_fuse_blocks: int, mesh: Mesh, axis: str = "drone"):
    """Build the jitted SPMD step:
    (drone_states, global_state, depth, R, T, K, base_R, base_T)
      -> (drone_states, global_state)

    drone_states/depth/R/T are sharded on the drone axis; the global state
    and per-submap base poses are replicated.
    """

    def local_step(dstate, gstate, depth, R, T, K, base_R, base_T):
        # shard_map gives local shards with leading axis of size 1
        st = jax.tree_util.tree_map(lambda x: x[0], dstate)
        st, _ = tsdf_ops.integrate_depth(sub_cfg, st, depth[0],
                                         jnp.zeros((1, 1, 3), jnp.uint8),
                                         R[0], T[0], K, K, jnp.int32(0))
        # fusion contributions from this drone's submap collection
        c = fusion_ops.splat_contributions(sub_cfg, glob_cfg, max_fuse_blocks,
                                           st, base_R, base_T)
        touched = fusion_ops.accumulate_dense(glob_cfg, gstate, c)
        touched = jax.lax.psum(touched.astype(jnp.int32), axis) > 0
        gstate = allocate_from_touched(glob_cfg.grid, gstate, touched,
                                       jnp.int32(0))
        w, wd, occ, wc = fusion_ops.scatter_accumulators(glob_cfg, gstate, c)
        w = jax.lax.psum(w, axis)
        wd = jax.lax.psum(wd, axis)
        occ = jax.lax.psum(occ, axis)
        wc = jax.lax.psum(wc, axis)
        gstate = fusion_ops.combine_accumulators(glob_cfg, gstate, w, wd, occ,
                                                 wc)
        out = jax.tree_util.tree_map(lambda x: x[None], st)
        return out, gstate

    dstate_spec = P(axis)
    rep = P()
    fn = shard_map(
        local_step, mesh=mesh,
        in_specs=(dstate_spec, rep, P(axis), P(axis), P(axis), rep, rep, rep),
        out_specs=(dstate_spec, rep),
        check_vma=False)
    return jax.jit(fn)
