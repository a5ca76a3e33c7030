"""Incremental ESDF on a block-sharded map (SURVEY.md §5.7).

The reference's incremental ESDF drains raise/lower queues on one device
(/root/reference/taichi_slam/mapping/dense_esdf.py:261-299); a map big
enough to need multi-chip HBM would lose its distance field. Here the
persistent ESDF state — the ``(max_blocks+1, V^3)`` f32 field and int8
fixed flags, full-map-sized like the TSDF channels — stays sharded over
the slot axis of the device mesh (``parallel.block_sharded`` layout), and
the per-update sweep runs as a collective:

- **working-set assembly by psum of disjoint shard scatters**: the
  compacted participating rows (dirty blocks + frozen rim, same policy as
  ``ops.esdf.esdf_update``) are gathered out of the sharded channels by
  every device scattering the rows it owns into a zeroed compact buffer
  and one ``psum`` over ICI — each compact row is written by exactly one
  device, so the sum is exact (0 + x == x bitwise).
- **row-partitioned sweeps with all_gather halo exchange**: the sweep's
  per-row compute (class extrema, multi-hop axis scans, support check —
  all lane/sublane-local, see ops/esdf.py sweep-layout notes) is divided
  into contiguous row chunks, one per device. Cross-block halo exchange
  (``ops.esdf._assemble_sweep``) needs arbitrary neighbor rows, so each
  sweep starts with a tiled ``all_gather`` of the row chunks — the
  cross-shard form of the reference's "assume all slots local" halo
  gather. Convergence is a psum-OR of the per-chunk change flags.
- **scatter-back to shard rows**: each device writes back only the compact
  rows whose storage slot falls in its shard; re-queue bitmaps
  (``changed_blocks``) and overflow verdicts are replicated, exactly like
  the single-device returns.

Bit-exactness (asserted in tests/test_parallel.py and the driver dryrun):
every arithmetic op is either replicated (identical inputs on all
devices) or an exact disjoint partition of the single-device op, so the
sharded result equals ``ops.esdf.esdf_update``'s XLA-body path bit for
bit — including sweep counts, re-queue bitmaps, and hysteresis behavior.

The per-sweep Pallas kernel (ops/pallas/esdf_sweep.py) is row-local, so it
drops into the per-chunk compute unchanged: ``pallas="auto"`` (default)
engages it on TPU meshes — including a 1-device TPU mesh, where
tests/test_parallel_tpu.py asserts the composition bit-exact against the
single-device ``ops.esdf.esdf_update`` — while the virtual CPU mesh in CI
keeps the XLA body (``pallas="on"`` forces interpreter mode for tiny
dedicated tests). Both bodies compute bit-identical sweeps
(tests/test_esdf.py::test_pallas_sweep_matches_xla).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from taichislam_tpu.core.compaction import compact_mask
from taichislam_tpu.core.config import TSDFConfig
from taichislam_tpu.core.geometry import sign
from taichislam_tpu.ops.esdf import (
    BIG,
    _assemble_sweep,
    _extrema_sweep,
    _from_sweep_layout,
    _scan_candidates_fused,
    _shell_mask_np,
    _to_sweep_layout,
    morton_order_rows,
    neighbor_slot_cols,
)
from taichislam_tpu.parallel.block_sharded import _state_spec


def esdf_sharding(mesh: Mesh, axis: str = "block"):
    """(esdf, fixed) placement matching the sharded channel layout."""
    return NamedSharding(mesh, P(axis))


def sharded_esdf_update(cfg: TSDFConfig, max_sweeps: int, block_cap: int,
                        mesh: Mesh, incremental: bool, axis: str = "block",
                        pallas: str = "auto"):
    """Build the jitted collective ESDF update over a slot-sharded map.

    Signature (incremental=True):
        fn(state, prev_esdf, prev_fixed, active_submap, dirty_blocks)
    Signature (incremental=False): same without ``dirty_blocks``.

    ``pallas``: "auto" runs each device's chunk sweep through the fused
    Pallas kernel (ops/pallas/esdf_sweep.py) on TPU backends and the XLA
    body elsewhere; "on" forces the kernel (interpreter mode off-TPU,
    tiny tests only); "off" keeps the XLA body. The two bodies are
    bit-identical (tests/test_esdf.py::test_pallas_sweep_matches_xla), so
    the flag changes cost, not results.

    ``state`` is a slot-sharded GridState (parallel.block_sharded layout);
    ``prev_esdf``/``prev_fixed`` are (max_blocks+1, V^3) arrays sharded on
    the slot axis; ``dirty_blocks`` is a replicated (max_blocks+1,) bool
    bitmap (e.g. the touched bitmap returned by
    ``sharded_integrate_depth``, OR'd with the previous call's
    ``changed_blocks`` — the same pending-wavefront chaining the
    single-device DenseESDF does).

    Returns (esdf, fixed, observed, sweeps, changed_blocks, overflow):
    the first three sharded on the slot axis, the rest replicated —
    semantics identical to ``ops.esdf.esdf_update``.
    """
    spec = cfg.grid
    V = spec.V
    W = V + 2
    nb = spec.max_blocks + 1
    n = mesh.devices.size
    assert nb % n == 0, "slot axis must divide the mesh (block_sharded rule)"
    shard_rows = nb // n
    V3 = spec.voxels_per_block
    gamma = cfg.voxel_scale
    max_ray = cfg.max_ray_length
    v1 = jnp.float32(cfg.voxel_scale)
    v2 = jnp.float32(np.sqrt(2.0) * cfg.voxel_scale)
    v3 = jnp.float32(np.sqrt(3.0) * cfg.voxel_scale)
    max_ray_f = jnp.float32(max_ray)
    eps_py = max(cfg.esdf_raise_slack_voxels * cfg.voxel_scale, 1e-4)
    eps = jnp.float32(eps_py)
    # compact rows pad to a multiple of n so every device owns an equal
    # contiguous chunk (and of 8, the Pallas slab height, for the drop-in)
    NROWS = -(-(block_cap + 1) // (8 * n)) * (8 * n)
    m = NROWS // n
    if pallas == "auto":
        use_pallas = jax.default_backend() == "tpu"
    else:
        use_pallas = pallas == "on"
    interp = jax.default_backend() != "tpu"

    def _scan_this_sweep(it):
        pred = it < cfg.esdf_scan_sweeps
        if cfg.esdf_scan_period > 0:
            pred |= (it % cfg.esdf_scan_period) == 0
        return pred

    def local(state, prev_esdf, prev_fixed, active_submap, dirty_blocks):
        me = jax.lax.axis_index(axis)
        lo_slot = me * shard_rows

        blk = state.block_active & \
            (state.block_coords[:, 0] == active_submap)
        blk = blk.at[-1].set(False)

        # -- working set (replicated: bookkeeping + dirty are replicated) --
        # same policy as ops/esdf.py esdf_update: full mode compacts every
        # active block; incremental mode compacts dirty rows first, then
        # the sort-deduped frozen rim of their 26-neighborhoods
        if not incremental:
            work_blk = blk
            bpos, bkept, btotal = compact_mask(blk, block_cap)
            slot_of = jnp.full((block_cap + 1,), nb - 1,
                               jnp.int32).at[bpos].set(
                jnp.arange(nb, dtype=jnp.int32), mode="drop")[:block_cap]
            bvalid = jnp.arange(block_cap) < bkept
            overflow_in = jnp.maximum(btotal - block_cap, 0)
            ns_flat = rows_d = validD = None
        else:
            dirty = dirty_blocks.at[-1].set(False)
            work_blk = blk & dirty
            posD, keptD, totalD = compact_mask(work_blk, block_cap)
            rows_d = jnp.full((block_cap,), nb - 1, jnp.int32).at[posD].set(
                jnp.arange(nb, dtype=jnp.int32), mode="drop")
            validD = jnp.arange(block_cap) < keptD
            ns_d = neighbor_slot_cols(spec, state, active_submap,
                                      rows=rows_d)
            ns_flat = jnp.where(validD[None, :], ns_d, nb - 1)   # (27, cap)
            srt = jax.lax.sort(ns_flat.reshape(-1))
            head = (srt < nb - 1) & jnp.concatenate(
                [jnp.array([True]), srt[1:] != srt[:-1]])
            head &= ~jnp.take(work_blk, srt)
            posR, keptR, totalR = compact_mask(head, block_cap)
            posR = jnp.where(posR < block_cap, posR + keptD, block_cap)
            slot_of = jnp.full((block_cap + 1,), nb - 1,
                               jnp.int32).at[posD].set(
                jnp.arange(nb, dtype=jnp.int32), mode="drop").at[
                jnp.minimum(posR, block_cap)].set(
                jnp.where(head, srt, nb - 1), mode="drop")[:block_cap]
            keptS = jnp.minimum(keptD + keptR, block_cap)
            bvalid = jnp.arange(block_cap) < keptS
            overflow_in = jnp.maximum(
                jnp.maximum(totalD, totalD + totalR) - block_cap, 0)

        # identical spatial row order to ops/esdf.py esdf_update (exact;
        # keeps the single-device equivalence bit-for-bit, row for row)
        n_upd = bkept if not incremental else keptD
        slot_of = morton_order_rows(slot_of, bvalid, n_upd,
                                    state.block_coords)

        inv = jnp.full((nb,), block_cap, jnp.int32).at[slot_of].set(
            jnp.where(bvalid, jnp.arange(block_cap, dtype=jnp.int32),
                      block_cap), mode="drop")

        # -- compact channel assembly: psum of disjoint shard scatters ----
        # (every required fill is zero, so unwritten rows are correct)
        inv_l = jax.lax.dynamic_slice(inv, (lo_slot,), (shard_rows,))
        tgt_c = jnp.where(inv_l < block_cap, inv_l, NROWS)

        def gcomp_sharded(local_rows, dtype):
            z = jnp.zeros((NROWS + 1, V3), dtype).at[tgt_c].set(
                local_rows.astype(dtype), mode="drop")[:NROWS]
            return jax.lax.psum(z, axis)

        tsdf = gcomp_sharded(state.channels["TSDF"].astype(jnp.float32),
                             jnp.float32)
        obs_l = (state.channels["TSDF_observed"] > 0)
        blk_l = jax.lax.dynamic_slice(blk, (lo_slot,), (shard_rows,))
        part_l = obs_l & blk_l[:, None]
        participate = gcomp_sharded(part_l, jnp.int32) > 0
        prev_e = gcomp_sharded(prev_esdf, jnp.float32)
        prev_f = gcomp_sharded(prev_fixed, jnp.int32)

        # -- seeds / warm start / sources (ops/esdf.py esdf_update) -------
        fixed = participate & (jnp.abs(tsdf) < gamma)
        seed = jnp.where(fixed, tsdf, sign(tsdf) * max_ray)
        prev_ok = (jnp.sign(prev_e) == jnp.sign(seed)) & participate & \
            (prev_e != 0) & ~((prev_f > 0) & ~fixed)
        esdf0 = jnp.where(fixed, seed,
                          jnp.where(prev_ok,
                                    jnp.clip(prev_e, -max_ray, max_ray),
                                    seed))
        esdf0 = jnp.where(participate, esdf0, 0.0)

        nslots = jnp.take(inv, neighbor_slot_cols(
            spec, state, active_submap, rows=slot_of), axis=0)  # (27, cap)
        nslots = jnp.where(bvalid[None, :], nslots, block_cap)
        nslots = jnp.concatenate(
            [nslots, jnp.full((27, NROWS - block_cap), block_cap,
                              jnp.int32)], axis=1)              # (27, NROWS)

        updatable = jnp.take(work_blk, slot_of, axis=0) & bvalid
        updatable = jnp.concatenate(
            [updatable, jnp.zeros((NROWS - block_cap,), bool)])

        pos_side = participate & ~fixed & (tsdf >= 0) & updatable[:, None]
        neg_side = participate & ~fixed & (tsdf < 0) & updatable[:, None]
        pos_src = (participate & (fixed | (tsdf >= gamma))).at[-1].set(False)
        neg_src = (participate & (fixed | (tsdf <= -gamma))).at[-1].set(
            False)

        # -- sweep layout; static masks replicated, chunk slices per device
        pos_src_h = _to_sweep_layout(pos_src, V, False)
        neg_src_h = _to_sweep_layout(neg_src, V, False)
        esdf0_h = _to_sweep_layout(esdf0, V, 0.0)
        fixed_h = _assemble_sweep(
            _to_sweep_layout(fixed.astype(jnp.float32), V, 0.0), nslots, V,
            0.0) > 0.5

        def chunk(a):
            return jax.lax.dynamic_slice_in_dim(a, me * m, m, 0)

        pos_side_c = chunk(_to_sweep_layout(pos_side, V, False))
        neg_side_c = chunk(_to_sweep_layout(neg_side, V, False))
        fixed_c = chunk(fixed_h)

        def _epilogue(esdf_mine, sweeps):
            """Shared tail: gather the swept chunks, scatter rows back to
            this device's shard, build the replicated re-queue bitmap."""
            esdf_h = jax.lax.all_gather(esdf_mine, axis, axis=0, tiled=True)
            esdf_c = _from_sweep_layout(esdf_h, V)        # (NROWS, V^3)

            tgt = jnp.where(updatable[:block_cap], slot_of, nb)
            esdf_rows = jnp.where(participate[:block_cap],
                                  esdf_c[:block_cap], 0.0)
            fixed_rows = jnp.where(participate[:block_cap],
                                   fixed[:block_cap], False).astype(jnp.int8)
            mine = (tgt >= lo_slot) & (tgt < lo_slot + shard_rows)
            ltgt = jnp.where(mine, tgt - lo_slot, shard_rows)
            esdf_out = prev_esdf.at[ltgt].set(esdf_rows, mode="drop")
            fixed_out = prev_fixed.astype(jnp.int8).at[ltgt].set(
                fixed_rows, mode="drop")

            diff = (jnp.abs(esdf_c - prev_e) > cfg.esdf_converge_eps) | \
                (fixed != (prev_f > 0))
            row_changed = jnp.any(diff, axis=1)
            changed_blocks = jnp.zeros((nb,), bool).at[tgt].set(
                row_changed[:block_cap], mode="drop").at[-1].set(False)
            if incremental:
                shell = jnp.asarray(_shell_mask_np(V))
                shell_changed = jnp.any(diff & shell[None, :], axis=1)
                tgtD = jnp.where(validD, jnp.take(inv, rows_d), block_cap)
                shell_d = jnp.take(shell_changed,
                                   jnp.minimum(tgtD, NROWS - 1)) & validD
                tgt27 = jnp.where(shell_d[None, :], ns_flat, nb - 1)
                shell_blocks = jnp.zeros(
                    (nb,), bool).at[tgt27.reshape(-1)].set(
                    True).at[-1].set(False)
                cb = (changed_blocks |
                      (blk & shell_blocks)).at[-1].set(False)
            else:
                cb = changed_blocks
            return (esdf_out, fixed_out, part_l, sweeps, cb, overflow_in)

        if use_pallas:
            # fused-kernel chunk compute (the drop-in the module docstring
            # describes): enc channel + interior side mask assembled once,
            # replicated, then chunk-sliced; each sweep all_gathers the
            # field, fills halo shells, and runs the kernel on this
            # device's rows only
            from taichislam_tpu.ops.pallas.esdf_sweep import (
                ENC_BIG, esdf_sweep_pallas)
            enc_hh = _assemble_sweep(
                _to_sweep_layout(jnp.where(participate, tsdf, ENC_BIG), V,
                                 ENC_BIG), nslots, V, ENC_BIG)
            enc_c = chunk(enc_hh)
            side_c = chunk(_to_sweep_layout(
                pos_side.astype(jnp.int8) - neg_side.astype(jnp.int8), V,
                jnp.int8(0)))

            def body(carry):
                esdf_mine, _, it = carry
                esdf = jax.lax.all_gather(esdf_mine, axis, axis=0,
                                          tiled=True)
                eh_c = chunk(_assemble_sweep(esdf, nslots, V, 0.0))

                def call(ws):
                    def f(x):
                        return esdf_sweep_pallas(
                            x, enc_c, side_c, None, V=V,
                            v1=float(cfg.voxel_scale), gamma=float(gamma),
                            eps=float(eps_py), max_ray=float(max_ray),
                            with_scans=ws, interpret=interp)
                    return f

                if cfg.esdf_scan_sweeps < 0:
                    new = call(True)(eh_c)
                else:
                    new = jax.lax.cond(_scan_this_sweep(it), call(True),
                                       call(False), eh_c)
                ch_local = jnp.any(jnp.abs(new - eh_c) >
                                   cfg.esdf_converge_eps)
                changed = jax.lax.psum(ch_local.astype(jnp.int32), axis) > 0
                if cfg.esdf_force_sweeps:
                    changed = jnp.bool_(True)
                return new, changed, it + 1

            def cond(carry):
                _, changed, it = carry
                return changed & (it < max_sweeps)

            esdf_mine, _, sweeps = jax.lax.while_loop(
                cond, body, (chunk(esdf0_h), jnp.bool_(True),
                             jnp.int32(0)))
            return _epilogue(esdf_mine, sweeps)

        def body(carry):
            esdf_mine, _, it = carry
            # cross-shard halo exchange: reassemble the full compact field
            # (tiled all_gather keeps chunk-order == row-order), fill the
            # halo shells from neighbor rows, then slice back to our chunk
            # for the expensive per-row compute
            esdf = jax.lax.all_gather(esdf_mine, axis, axis=0, tiled=True)
            lo_h = _assemble_sweep(jnp.where(pos_src_h, esdf, BIG), nslots,
                                   V, BIG)
            hi_h = _assemble_sweep(jnp.where(neg_src_h, esdf, -BIG), nslots,
                                   V, -BIG)
            lo_c, hi_c = chunk(lo_h), chunk(hi_h)
            fl, el, cl = _extrema_sweep(lo_c, jnp.minimum, BIG, W)
            fh, eh, chs = _extrema_sweep(hi_c, jnp.maximum, -BIG, W)
            cand_lo = jnp.minimum(jnp.minimum(fl + v1, el + v2), cl + v3)
            cand_hi = jnp.maximum(jnp.maximum(fh - v1, eh - v2), chs - v3)

            def with_scans(cands):
                c_lo, c_hi = cands
                c_lo = jnp.minimum(c_lo, _scan_candidates_fused(
                    lo_c, (lo_c >= BIG * 0.5) | fixed_c,
                    float(cfg.voxel_scale), BIG, W))
                c_hi = jnp.maximum(c_hi, -_scan_candidates_fused(
                    -hi_c, (hi_c <= -BIG * 0.5) | fixed_c,
                    float(cfg.voxel_scale), BIG, W))
                return c_lo, c_hi

            if cfg.esdf_scan_sweeps < 0:
                cand_lo, cand_hi = with_scans((cand_lo, cand_hi))
            else:
                cand_lo, cand_hi = jax.lax.cond(
                    _scan_this_sweep(it), with_scans, lambda c: c,
                    (cand_lo, cand_hi))

            new = jnp.where(cand_lo <= esdf_mine + eps,
                            jnp.minimum(esdf_mine, cand_lo),
                            jnp.minimum(max_ray_f, cand_lo))
            new = jnp.where(pos_side_c, new, esdf_mine)
            new_n = jnp.where(cand_hi >= esdf_mine - eps,
                              jnp.maximum(esdf_mine, cand_hi),
                              jnp.maximum(-max_ray_f, cand_hi))
            new = jnp.where(neg_side_c, new_n, new)
            ch_local = jnp.any(jnp.abs(new - esdf_mine) >
                               cfg.esdf_converge_eps)
            changed = jax.lax.psum(ch_local.astype(jnp.int32), axis) > 0
            if cfg.esdf_force_sweeps:
                changed = jnp.bool_(True)
            return new, changed, it + 1

        def cond(carry):
            _, changed, it = carry
            return changed & (it < max_sweeps)

        esdf_mine, _, sweeps = jax.lax.while_loop(
            cond, body, (chunk(esdf0_h), jnp.bool_(True), jnp.int32(0)))

        esdf_h = jax.lax.all_gather(esdf_mine, axis, axis=0, tiled=True)
        esdf_c = _from_sweep_layout(esdf_h, V)            # (NROWS, V^3)

        # -- scatter-back: each device writes its own shard's rows --------
        tgt = jnp.where(updatable[:block_cap], slot_of, nb)
        esdf_rows = jnp.where(participate[:block_cap], esdf_c[:block_cap],
                              0.0)
        fixed_rows = jnp.where(participate[:block_cap], fixed[:block_cap],
                               False).astype(jnp.int8)
        mine = (tgt >= lo_slot) & (tgt < lo_slot + shard_rows)
        ltgt = jnp.where(mine, tgt - lo_slot, shard_rows)
        esdf_out = prev_esdf.at[ltgt].set(esdf_rows, mode="drop")
        fixed_out = prev_fixed.astype(jnp.int8).at[ltgt].set(
            fixed_rows, mode="drop")

        # -- re-queue epilogue (replicated, same as single-device) --------
        diff = (jnp.abs(esdf_c - prev_e) > cfg.esdf_converge_eps) | \
            (fixed != (prev_f > 0))
        row_changed = jnp.any(diff, axis=1)
        changed_blocks = jnp.zeros((nb,), bool).at[tgt].set(
            row_changed[:block_cap], mode="drop").at[-1].set(False)
        if incremental:
            shell = jnp.asarray(_shell_mask_np(V))
            shell_changed = jnp.any(diff & shell[None, :], axis=1)
            tgtD = jnp.where(validD, jnp.take(inv, rows_d), block_cap)
            shell_d = jnp.take(shell_changed,
                               jnp.minimum(tgtD, NROWS - 1)) & validD
            tgt27 = jnp.where(shell_d[None, :], ns_flat, nb - 1)
            shell_blocks = jnp.zeros((nb,), bool).at[tgt27.reshape(-1)].set(
                True).at[-1].set(False)
            changed_blocks = (changed_blocks |
                              (blk & shell_blocks)).at[-1].set(False)
        return (esdf_out, fixed_out, part_l, sweeps, changed_blocks,
                overflow_in)

    sh = P(axis)
    rep = P()
    in_specs = (_state_spec(cfg, axis), sh, sh, rep)
    if incremental:
        in_specs = in_specs + (rep,)
        fn = shard_map(local, mesh=mesh, in_specs=in_specs,
                       out_specs=(sh, sh, sh, rep, rep, rep),
                       check_vma=False)
    else:
        def local_full(state, pe, pf, act):
            return local(state, pe, pf, act, None)
        fn = shard_map(local_full, mesh=mesh, in_specs=in_specs,
                       out_specs=(sh, sh, sh, rep, rep, rep),
                       check_vma=False)
    return jax.jit(fn)
