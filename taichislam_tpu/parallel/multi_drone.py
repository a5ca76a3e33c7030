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


# ---------------------------------------------------------------------------
# lifecycle-composed SPMD step (the in-graph SubmapMapping)
# ---------------------------------------------------------------------------

def make_lifecycle_states(sub_cfg: TSDFConfig, n_drones: int,
                          with_esdf: bool = False):
    """Per-drone lifecycle state, leading drone axis: submap-collection
    grid state + active submap id + frame count + per-drone base-pose
    registry (the host SubmapMapping keeps these in Python,
    submap_mapping.py:126-169; here they are device arrays so keyframe
    switching runs inside the jitted step).

    With ``with_esdf`` the dict also carries each drone's distance field
    (``esdf``/``fixed`` full-map arrays + the ``pending`` re-queue bitmap
    chaining still-propagating wavefronts across frames) so every device
    keeps a planner-ready ESDF — the reference node's ``esdf`` mapping
    type per drone (/root/reference/scripts/taichislam_node.py:216-218)."""
    S = sub_cfg.max_submap_num
    life = dict(
        state=make_drone_states(sub_cfg, n_drones),
        active=jnp.zeros((n_drones,), jnp.int32),
        fcount=jnp.zeros((n_drones,), jnp.int32),
        base_R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32),
                                (n_drones, S, 3, 3)),
        base_T=jnp.zeros((n_drones, S, 3), jnp.float32),
    )
    if with_esdf:
        nb = sub_cfg.grid.max_blocks + 1
        V3 = sub_cfg.grid.voxels_per_block
        life["esdf"] = jnp.zeros((n_drones, nb, V3), jnp.float32)
        life["fixed"] = jnp.zeros((n_drones, nb, V3), jnp.int8)
        life["pending"] = jnp.zeros((n_drones, nb), bool)
        life["esdf_stats"] = jnp.zeros((n_drones, 2), jnp.int32)
    return life


def multi_drone_lifecycle_step(sub_cfg: TSDFConfig, keyframe_step: int,
                               mesh: Mesh, axis: str = "drone",
                               esdf_sweeps: int | None = None,
                               esdf_block_cap: int = 64,
                               mesh_triangles: int | None = None,
                               mesh_block_cap: int = 32):
    """Build the jitted SPMD frame step WITH the submap lifecycle
    in-graph — the device analog of
    ``SubmapMapping.recast_depth_to_map_by_frame`` (submap_mapping.py:
    126-193): per-drone keyframe policy (new submap on frame 0 and every
    ``keyframe_step``-th keyframe), per-drone base-pose registration of
    the new submap at the current (PGO-corrected) world pose,
    world->submap pose conversion (``convert_by_base``), and integration
    into the active submap slot.

    Signature: (life, depth, R, T, is_keyframe, K) -> life, where
    ``life`` is the dict from :func:`make_lifecycle_states` (sharded on
    the drone axis) and depth/R/T/is_keyframe carry a leading drone axis.
    Global fusion is separate (:func:`multi_drone_fuse`) so it can run at
    keyframe cadence like the host orchestrator, not every frame.

    With ``esdf_sweeps`` set, the SAME dispatch also runs each drone's
    budget-bounded incremental ESDF update (pure per-device compute, no
    collectives): dirty set = this frame's touched blocks OR the pending
    re-queue bitmap, identical to the host DenseESDF chaining
    (models/dense_esdf.py update_esdf). On a working-set overflow
    (> ``esdf_block_cap``) the frame's whole dirty set re-queues into
    ``pending`` so dropped blocks are retried next frame — deterministic
    bounded staleness with no host verdict round-trip. ``esdf_stats``
    packs per-drone (sweeps_run, overflow) for observability.

    With ``mesh_triangles`` set, the SAME dispatch also extracts each
    drone's per-frame incremental mesh patch (marching cubes restricted to
    the 26-dilation of this frame's touched blocks — the span-patch
    working set of models/mesher.py), so every drone gets planner/viz
    triangle output without a host round-trip (the reference node's
    per-drone mesh output path, scripts/taichislam_node.py:324). The step
    then returns ``(life, mesh_out)`` where ``mesh_out`` carries
    per-drone ``vertices`` (mesh_triangles*3, 3) and ``counts``
    (num_triangles, surface_blocks_dropped, triangles_dropped).
    """
    S = sub_cfg.max_submap_num

    def local_step(life, depth, R, T, kf, K):
        st = jax.tree_util.tree_map(lambda x: x[0], life["state"])
        act = life["active"][0]
        fcnt = life["fcount"][0]
        bR = life["base_R"][0]
        bT = life["base_T"][0]
        R0, T0 = R[0], T[0]

        # need_create_new_submap (submap_mapping.py:148-155)
        new = (fcnt == 0) | (kf[0] & (fcnt % keyframe_step == 0))
        act1 = jnp.minimum(jnp.where(new & (fcnt > 0), act + 1, act), S - 1)
        tgt = jnp.where(new, act1, S)          # S drops (mode="drop")
        bR = bR.at[tgt].set(R0, mode="drop")
        bT = bT.at[tgt].set(T0, mode="drop")

        # set_pose: world -> active-submap frame (mapping_common.py:91-100)
        baR, baT = bR[act1], bT[act1]
        R_in = baR.T @ R0
        T_in = baR.T @ (T0 - baT)
        st, stats = tsdf_ops.integrate_depth(
            sub_cfg, st, depth[0], jnp.zeros((1, 1, 3), jnp.uint8),
            R_in, T_in, K, K, act1)

        out = dict(
            state=jax.tree_util.tree_map(lambda x: x[None], st),
            active=act1[None], fcount=(fcnt + 1)[None],
            base_R=bR[None], base_T=bT[None])
        if esdf_sweeps is not None:
            from taichislam_tpu.ops import esdf as esdf_ops
            dirty = stats["touched_blocks"] | life["pending"][0]
            e, f, _, sweeps, changed, ovf = esdf_ops.esdf_update(
                sub_cfg, esdf_sweeps, esdf_block_cap, st,
                life["esdf"][0], life["fixed"][0], act1, dirty)
            changed = jnp.where(ovf > 0, changed | dirty, changed)
            out["esdf"] = e[None]
            out["fixed"] = f[None]
            out["pending"] = changed[None]
            out["esdf_stats"] = jnp.stack(
                [jnp.asarray(sweeps, jnp.int32),
                 jnp.asarray(ovf, jnp.int32)])[None]
        if mesh_triangles is None:
            return out
        from taichislam_tpu.ops import marching_cubes as mc_ops
        dil = mc_ops.dilate_blocks(sub_cfg, st, act1,
                                   stats["touched_blocks"])
        m = mc_ops.extract_mesh(
            sub_cfg, mesh_triangles, 1, mesh_block_cap, st, act1,
            jnp.float32(sub_cfg.tsdf_surface_thres), block_mask=dil)
        tris_dropped = jnp.maximum(
            m["total_triangles"] - m["num_triangles"], 0)
        mesh_out = dict(
            vertices=m["vertices"][None],
            counts=jnp.stack([
                m["num_triangles"].astype(jnp.int32),
                m["surface_blocks_dropped"].astype(jnp.int32),
                tris_dropped.astype(jnp.int32)])[None])
        return out, mesh_out

    sh = P(axis)
    keys = ["state", "active", "fcount", "base_R", "base_T"]
    if esdf_sweeps is not None:
        keys += ["esdf", "fixed", "pending", "esdf_stats"]
    life_spec = {k: sh for k in keys}
    out_specs = life_spec if mesh_triangles is None else \
        (life_spec, {"vertices": sh, "counts": sh})
    fn = shard_map(
        local_step, mesh=mesh,
        in_specs=(life_spec, sh, sh, sh, sh, P()),
        out_specs=out_specs,
        check_vma=False)
    return jax.jit(fn)


def multi_drone_fuse(sub_cfg: TSDFConfig, glob_cfg: TSDFConfig,
                     max_fuse_blocks: int, mesh: Mesh, axis: str = "drone",
                     with_esdf: bool = False):
    """Build the jitted all-drone global fusion: every device splats its
    own collection through its OWN base-pose registry, the touched bitmap
    and dense accumulators psum over the drone axis, and every device
    derives the identical replicated global map — the collective analog
    of N sequential ``fuse_submaps`` calls (associative weighted merge).
    Signature: (life, gstate) -> gstate. Pass ``with_esdf=True`` when
    ``life`` came from ``make_lifecycle_states(..., with_esdf=True)``
    (the extra per-drone ESDF keys ride along unused)."""

    def local_fuse(life, gstate):
        st = jax.tree_util.tree_map(lambda x: x[0], life["state"])
        c = fusion_ops.splat_contributions(
            sub_cfg, glob_cfg, max_fuse_blocks, st,
            life["base_R"][0], life["base_T"][0])
        touched = fusion_ops.accumulate_dense(glob_cfg, gstate, c)
        touched = jax.lax.psum(touched.astype(jnp.int32), axis) > 0
        gstate = allocate_from_touched(glob_cfg.grid, gstate, touched,
                                       jnp.int32(0))
        w, wd, occ, wc = fusion_ops.scatter_accumulators(glob_cfg, gstate, c)
        w = jax.lax.psum(w, axis)
        wd = jax.lax.psum(wd, axis)
        occ = jax.lax.psum(occ, axis)
        wc = jax.lax.psum(wc, axis)
        return fusion_ops.combine_accumulators(glob_cfg, gstate, w, wd, occ,
                                               wc)

    sh = P(axis)
    keys = ["state", "active", "fcount", "base_R", "base_T"]
    if with_esdf:
        keys += ["esdf", "fixed", "pending", "esdf_stats"]
    fn = shard_map(
        local_fuse, mesh=mesh,
        in_specs=({k: sh for k in keys}, P()),
        out_specs=P(),
        check_vma=False)
    return jax.jit(fn)
