"""Incremental ESDF via masked Jacobi wavefront sweeps.

The reference's only ESDF implementation (legacy DenseSDF,
/root/reference/taichi_slam/mapping/dense_esdf.py:228-333) runs voxblox's
raise/lower queues as *serialized device while-loops* with atomic cursors —
sequential on GPU, and with a known memory issue (reference README roadmap).
Its semantics: voxels in the fixed band (|TSDF| < γ = voxel_scale) hold
ESDF = TSDF; every other observed voxel relaxes toward
``min over 26-neighbors (ESDF[n] + |dir|·voxel)`` on the positive side and
``max (ESDF[n] - dist)`` on the negative side — a signed chamfer/brushfire
distance, initialized at ±max_ray_length.

TPU-native formulation (all static shapes, no queues, no atomics):

- **one-sided brushfires**: the positive side relaxes only through
  fixed/positive-side sources, the negative side mirrored — the well-defined
  voxblox fixed point (the reference queues let fresh ±max seeds poison the
  other side and never iterate to convergence, one reason its ESDF never
  stabilized); property-tested against Bellman-Ford.
- **halo exchange by block slabs**: each active block's (V+2)³ halo is
  assembled from its 26 neighbors' boundary slabs with *per-block slice
  gathers* (DMA-friendly; per-element gathers on TPU are ~ns/element and
  would dominate).
- **separable neighborhood minima**: the 26-neighbor chamfer relaxation
  decomposes by distance class — faces (1·v), edges (√2·v), corners (√3·v) —
  each class computable by composing 2-shift axis minima, so a sweep is a
  handful of fused elementwise passes instead of 26 materialized windows.
- **pure min-plus Jacobi update = built-in raise semantics**: each sweep
  recomputes ``new[v] = min(max_ray, min over source neighbors (esdf[n] +
  dist))`` — the voxel's own previous value does NOT appear in the min, so
  the iteration converges to the unique distance fixed point from *any*
  initialization. Stale-LOW values (a surface receded or was erased) rise by
  at least one voxel_scale per sweep until they regain real support; values
  above the fixed point fall one voxel per sweep as usual. This subsumes
  voxblox's raise queue (dense_esdf.py:261-273 resets children of raised
  voxels via parent_dir back-pointers) without parent state, queues, or
  atomics — property-tested on wall-deleted / wall-receded scenes against
  brute-force distance.
- warm starts: previous ESDF values initialize the iteration (kept where the
  TSDF sign is unchanged), so per-frame incremental updates converge in a
  few sweeps inside the ``lax.while_loop``; staleness of any kind is
  self-correcting per the Jacobi property above.
- dirty-block working sets (``dirty_blocks`` arg): per-frame updates sweep
  only the 26-dilation of frame-touched blocks; wavefronts that reach the
  working-set edge re-queue via the returned ``changed_blocks`` bitmap and
  continue next frame — identical fixed point to a full warm sweep
  (property-tested), at working-set cost.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from taichislam_tpu.core.config import TSDFConfig
from taichislam_tpu.core.grid import lookup_slots
from taichislam_tpu.core.geometry import sign

BIG = jnp.float32(1e9)


# ---------------------------------------------------------------------------
# halo machinery
# ---------------------------------------------------------------------------

def neighbor_slot_table(spec, state, active_submap):
    """(nb, 3, 3, 3) storage slot of each block's 26 neighbors (+ itself);
    missing neighbors map to the garbage slot."""
    nb = spec.max_blocks + 1
    bc = state.block_coords  # (nb, 4)
    offs = jnp.stack(jnp.meshgrid(*([jnp.arange(-1, 2)] * 3),
                                  indexing="ij"), axis=-1)  # (3,3,3,3)
    nbr = bc[:, None, None, None, 1:4] + offs[None]          # (nb,3,3,3,3)
    inb = jnp.all((nbr >= 0) & (nbr < jnp.asarray(
        [spec.bn_xy, spec.bn_xy, spec.bn_z])), axis=-1)
    inb &= (bc[:, 0] >= 0)[:, None, None, None]
    blin = (nbr[..., 0] * spec.bn_xy + nbr[..., 1]) * spec.bn_z + \
        nbr[..., 2] + bc[:, 0][:, None, None, None] * spec.blocks_per_submap
    blin = jnp.where(inb, blin, -1)
    return lookup_slots(spec, state.table, blin)


def assemble_halo(tiles, nslots, V, fill, center=None):
    """Build (n, V+2, V+2, V+2) halos for ``n = nslots.shape[0]`` blocks.

    ``tiles`` is (nb, V, V, V) with the garbage row holding ``fill``;
    ``nslots`` the (n, 3, 3, 3) neighbor slot table (slot indices into
    ``tiles``). The 26 boundary slabs are fetched with per-block slice
    gathers (efficient on TPU: large constant-size slices per index).

    With the default ``center=None``, ``nslots`` indexes the same rows as
    ``tiles`` (n == nb) and the halo interiors come from ``tiles``. For a
    *compacted* working set, pass ``center`` as the (n, V, V, V) gathered
    interiors while ``tiles``/``nslots`` stay full-size — halo cost then
    scales with the working set, not the allocated grid.
    """
    if center is None:
        center = tiles
    n = center.shape[0]
    halo = jnp.full((n, V + 2, V + 2, V + 2), fill, tiles.dtype)
    halo = halo.at[:, 1:V + 1, 1:V + 1, 1:V + 1].set(center)

    def src_slice(s):
        # neighbor-local source plane(s) feeding our halo on side s
        return {1: slice(0, 1), -1: slice(V - 1, V), 0: slice(0, V)}[s]

    def dst_slice(s):
        return {1: slice(V + 1, V + 2), -1: slice(0, 1),
                0: slice(1, V + 1)}[s]

    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            for dk in (-1, 0, 1):
                if di == 0 and dj == 0 and dk == 0:
                    continue
                slab = tiles[:, src_slice(di), src_slice(dj), src_slice(dk)]
                gathered = jnp.take(slab, nslots[:, di + 1, dj + 1, dk + 1],
                                    axis=0)
                halo = halo.at[:, dst_slice(di), dst_slice(dj),
                               dst_slice(dk)].set(gathered)
    return halo


def _axpair(h, axis, op):
    """op(shift(h, -1, axis), shift(h, +1, axis)) cropped by 1 on ``axis``
    (valid region shrinks; callers track the remaining pad)."""
    V2 = h.shape[axis + 1]
    lo = jax.lax.slice_in_dim(h, 0, V2 - 2, axis=axis + 1)
    hi = jax.lax.slice_in_dim(h, 2, V2, axis=axis + 1)
    return op(lo, hi)


def _center_crop(h, axis):
    V2 = h.shape[axis + 1]
    return jax.lax.slice_in_dim(h, 1, V2 - 1, axis=axis + 1)


def neighborhood_extrema(halo, op):
    """Class-wise 26-neighborhood extrema of a (nb, V+2, V+2, V+2) halo:
    returns (faces, edges, corners), each (nb, V, V, V), where ``faces`` is
    op over the 6 face neighbors, etc. Built from separable 2-shift axis
    extrema — a few fused elementwise passes total."""
    # single-axis pairs, other axes center-cropped progressively
    ax = _axpair(halo, 0, op)           # (nb, V,   V+2, V+2)
    ay = _axpair(halo, 1, op)           # (nb, V+2, V,   V+2)
    az = _axpair(halo, 2, op)
    faces = op(op(_center_crop(_center_crop(ax, 1), 2),
                  _center_crop(_center_crop(ay, 0), 2)),
               _center_crop(_center_crop(az, 0), 1))
    exy = _axpair(ax, 1, op)            # x±1, y±1
    exz = _axpair(ax, 2, op)
    eyz = _axpair(ay, 2, op)
    edges = op(op(_center_crop(exy, 2), _center_crop(exz, 1)),
               _center_crop(eyz, 0))
    corners = _axpair(exy, 2, op)       # x±1, y±1, z±1
    return faces, edges, corners


# ---------------------------------------------------------------------------
# sweep-layout machinery (lane-fused halos)
#
# TPU tiles pad the two minor dims to (8, 128): a (n, 18, 18, 18) halo or a
# (n, 16, 16, 1) boundary slab expands 7-9x in HBM, and the 26-direction
# slab assembly above (fine for one-shot consumers like marching cubes)
# costs ~3.6 ms per call at cap=512 inside the sweep loop. The sweep
# therefore runs in a fused layout (n, J=18, L=324) with sublanes = j and
# lanes l = i*18 + k: lane padding is 324->384 (1.2x), i-steps are exact
# +-18 lane shifts, k-steps are +-1 lane shifts (cross-i bleed lands only
# on cropped halo positions), j-steps are sublane shifts. Halo exchange
# collapses to 6 axis passes (i slabs: contiguous 18-lane groups; j slabs:
# single sublane rows; k slabs: masked 16-lane shifts), with diagonal
# blocks picked up for free because each pass gathers from arrays whose
# earlier-axis shells are already filled (standard axis-sequential halo
# exchange).
# ---------------------------------------------------------------------------

def _to_sweep_layout(tiles, V, fill):
    """(n, V^3) flat [i,j,k] tiles -> (n, V+2, (V+2)**2) [j | i*(V+2)+k]
    with ``fill`` in the halo positions."""
    n = tiles.shape[0]
    t = jnp.transpose(tiles.reshape(n, V, V, V), (0, 2, 1, 3))  # (n,j,i,k)
    t = jnp.pad(t, ((0, 0), (1, 1), (1, 1), (1, 1)), constant_values=fill)
    return t.reshape(n, V + 2, (V + 2) * (V + 2))


def _from_sweep_layout(H, V):
    n = H.shape[0]
    t = H.reshape(n, V + 2, V + 2, V + 2)[:, 1:V + 1, 1:V + 1, 1:V + 1]
    return jnp.transpose(t, (0, 2, 1, 3)).reshape(n, V * V * V)


def _lshift(h, s, fill):
    """h shifted by ``s`` along lanes: out[..., l] = h[..., l+s]."""
    if s == 0:
        return h
    pad = jnp.full(h.shape[:-1] + (abs(s),), fill, h.dtype)
    if s > 0:
        return jnp.concatenate([h[..., s:], pad], axis=-1)
    return jnp.concatenate([pad, h[..., :s]], axis=-1)


def _jshift(h, s, fill):
    """h shifted by ``s`` along the sublane (j) dim."""
    if s == 0:
        return h
    pad = jnp.full((h.shape[0], abs(s), h.shape[2]), fill, h.dtype)
    if s > 0:
        return jnp.concatenate([h[:, s:, :], pad], axis=1)
    return jnp.concatenate([pad, h[:, :s, :]], axis=1)


@functools.lru_cache(maxsize=8)
def _k_edge_masks_np(V):
    k = np.arange((V + 2) * (V + 2)) % (V + 2)
    return (k == 0).reshape(1, 1, -1), (k == V + 1).reshape(1, 1, -1)


def _assemble_sweep(H, nsl, V, fill):
    """Fill the halo shells of sweep-layout ``H`` from neighbor blocks.

    ``nsl`` is the (n, 3, 3, 3) compact-space neighbor slot table (garbage
    row = n-1, whose values must already be ``fill``). Axis passes run
    i -> j -> k so each pass reads shells the earlier passes filled, which
    delivers all 20 edge/corner diagonals through face-only exchanges.
    """
    W = V + 2
    # i faces: our i=0 group <- neighbor(di=-1)'s i'=V group (both 18 lanes)
    g = jnp.take(H[:, :, V * W:(V + 1) * W], nsl[:, 0, 1, 1], axis=0)
    H = H.at[:, :, 0:W].set(g)
    g = jnp.take(H[:, :, W:2 * W], nsl[:, 2, 1, 1], axis=0)
    H = H.at[:, :, (V + 1) * W:(V + 2) * W].set(g)
    # j faces: single sublane rows, full lane extent (includes i shells)
    g = jnp.take(H[:, V:V + 1, :], nsl[:, 1, 0, 1], axis=0)
    H = H.at[:, 0:1, :].set(g)
    g = jnp.take(H[:, 1:2, :], nsl[:, 1, 2, 1], axis=0)
    H = H.at[:, V + 1:V + 2, :].set(g)
    # k faces: masked lane shifts (k is minor within lanes, so the slab is
    # strided; a +-V shift aligns neighbor k'=V/1 onto our k=0/V+1 lanes)
    m0_np, m1_np = _k_edge_masks_np(V)
    m0, m1 = jnp.asarray(m0_np), jnp.asarray(m1_np)
    g = jnp.take(H, nsl[:, 1, 1, 0], axis=0)
    H = jnp.where(m0, _lshift(g, V, fill), H)
    g = jnp.take(H, nsl[:, 1, 1, 2], axis=0)
    H = jnp.where(m1, _lshift(g, -V, fill), H)
    return H


def _extrema_sweep(h, op, fill, W):
    """Class-wise 26-neighborhood extrema in sweep layout: (faces, edges,
    corners), same shape as ``h``; positions whose stencil crossed an
    i-group boundary land only on halo lanes (cropped by the caller)."""
    ai = op(_lshift(h, W, fill), _lshift(h, -W, fill))
    aj = op(_jshift(h, 1, fill), _jshift(h, -1, fill))
    ak = op(_lshift(h, 1, fill), _lshift(h, -1, fill))
    faces = op(op(ai, aj), ak)
    eij = op(_jshift(ai, 1, fill), _jshift(ai, -1, fill))
    eik = op(_lshift(ai, 1, fill), _lshift(ai, -1, fill))
    ejk = op(_lshift(aj, 1, fill), _lshift(aj, -1, fill))
    edges = op(op(eij, eik), ejk)
    corners = op(_lshift(eij, 1, fill), _lshift(eij, -1, fill))
    return faces, edges, corners


# ---------------------------------------------------------------------------
# ESDF update
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(0, 1, 2))
def esdf_update(cfg: TSDFConfig, max_sweeps: int, block_cap: int, state,
                prev_esdf, prev_fixed, active_submap, dirty_blocks=None):
    """Compute the ESDF over the active submap's observed voxels.

    The sweep runs on a **compacted participating-block working set**
    (static ``block_cap``): tiles are slice-gathered into (cap+1, V, V, V)
    arrays (last row = garbage), neighbor slots remapped into the compact
    index space, and results scattered back — so per-sweep cost scales with
    the observed region, not the allocated grid.

    With ``dirty_blocks`` (a (max_blocks+1,) per-slot bool bitmap, e.g.
    integrate's ``touched_blocks`` stat), the working set shrinks to the
    26-dilation of the dirty blocks — the per-frame incremental mode — plus
    a second-dilation frozen rim serving as the Dirichlet boundary. Warm
    values elsewhere are carried through unchanged. Wavefronts (lower OR
    raise — the pure-Jacobi sweep handles receding surfaces, see module
    docstring) that reach the working-set edge are reported in the returned
    ``changed_blocks`` bitmap; feeding it into the next call's
    ``dirty_blocks`` continues the propagation, amortizing long-range
    updates across frames (the role of voxblox's raise/lower queues,
    dense_esdf.py:228-333, with static shapes and no atomics).

    Args:
        prev_esdf: (max_blocks+1, V^3) previous ESDF (zeros on first call)
        prev_fixed: same-shaped int8 previous fixed flags
    Returns (esdf, fixed, observed_mask, sweeps_run, changed_blocks,
    block_cap_overflow) — arrays full-size. A nonzero overflow means the
    working set exceeded ``block_cap`` and the caller should redo with a
    larger cap (dropped blocks kept their previous values).
    """
    from taichislam_tpu.core.compaction import compact_mask

    spec = cfg.grid
    V = spec.V
    nb = spec.max_blocks + 1
    gamma = cfg.voxel_scale
    max_ray = cfg.max_ray_length
    v1 = jnp.float32(cfg.voxel_scale)
    v2 = jnp.float32(np.sqrt(2.0) * cfg.voxel_scale)
    v3 = jnp.float32(np.sqrt(3.0) * cfg.voxel_scale)

    tsdf_full = state.channels["TSDF"].astype(jnp.float32)
    obs_full = state.channels["TSDF_observed"] > 0
    blk = state.block_active & (state.block_coords[:, 0] == active_submap)
    blk = blk.at[-1].set(False)
    participate_full = obs_full & blk[:, None]

    nslots_full = neighbor_slot_table(spec, state, active_submap)  # (nb,3,3,3)

    if dirty_blocks is None:
        work_blk = blk
        src_blk = blk
    else:
        # 26-dilation: a block is in the working set if any of its 27
        # neighborhood slots is dirty (changes propagate 1 voxel/sweep, so
        # with sweeps <= V they stay inside the dilation; anything that
        # reaches the edge is re-queued via changed_blocks). A second
        # dilation ring is gathered as a FROZEN rim: the pure-Jacobi sweep
        # recomputes every voxel from its neighbors, so edge voxels must see
        # their out-of-set support as Dirichlet boundary values or they
        # would spuriously raise.
        dirty = dirty_blocks.at[-1].set(False)
        dil = jnp.any(jnp.take(dirty, nslots_full.reshape(nb, 27), axis=0),
                      axis=1) | dirty
        work_blk = blk & dil
        rim = jnp.any(jnp.take(work_blk, nslots_full.reshape(nb, 27),
                               axis=0), axis=1) | work_blk
        src_blk = blk & rim

    # ---- compact the working-set blocks (+ frozen rim) ---------------------
    bpos, bkept, btotal = compact_mask(src_blk, block_cap)
    slot_of = jnp.full((block_cap + 1,), nb - 1, jnp.int32).at[bpos].set(
        jnp.arange(nb, dtype=jnp.int32), mode="drop")[:block_cap]
    bvalid = jnp.arange(block_cap) < bkept
    # global slot -> compact index (garbage rows -> block_cap)
    inv = jnp.full((nb,), block_cap, jnp.int32).at[slot_of].set(
        jnp.where(bvalid, jnp.arange(block_cap, dtype=jnp.int32), block_cap),
        mode="drop")

    def gcomp(arr, fill):
        out = jnp.take(arr, slot_of, axis=0)
        out = jnp.where(bvalid[:, None], out, fill)
        pad = jnp.full((1,) + out.shape[1:], fill, out.dtype)
        return jnp.concatenate([out, pad], axis=0)   # (cap+1, V^3)

    tsdf = gcomp(tsdf_full, 0.0)
    participate = gcomp(participate_full, False)
    prev_e = gcomp(prev_esdf, 0.0)
    prev_f = gcomp(prev_fixed, 0)

    fixed = participate & (jnp.abs(tsdf) < gamma)
    seed = jnp.where(fixed, tsdf, sign(tsdf) * max_ray)

    # warm start: previous values initialize the Jacobi iteration where the
    # TSDF sign is unchanged (a formerly-fixed voxel resets to its seed —
    # its near-zero warm value would just rise slowly otherwise). Any
    # remaining staleness, high OR low, is corrected by the pure-Jacobi
    # sweep below, which does not keep the voxel's own old value.
    prev_ok = (jnp.sign(prev_e) == jnp.sign(seed)) & participate & \
        (prev_e != 0) & ~((prev_f > 0) & ~fixed)
    esdf0 = jnp.where(fixed, seed,
                      jnp.where(prev_ok,
                                jnp.clip(prev_e, -max_ray, max_ray),
                                seed))
    esdf0 = jnp.where(participate, esdf0, 0.0)

    # neighbor slots in compact space
    nslots = jnp.take(inv, jnp.take(nslots_full, slot_of, axis=0), axis=0)
    nslots = jnp.where(bvalid[:, None, None, None], nslots, block_cap)
    # pad a garbage row so nslots matches the (cap+1)-row tile arrays
    nslots = jnp.concatenate(
        [nslots, jnp.full((1, 3, 3, 3), block_cap, jnp.int32)], axis=0)

    # rows holding frozen-rim blocks participate as sources but are never
    # updated (Dirichlet boundary of the working set)
    updatable = jnp.take(work_blk, slot_of, axis=0) & bvalid
    updatable = jnp.concatenate([updatable, jnp.zeros((1,), bool)])

    pos_side = participate & ~fixed & (tsdf >= 0) & updatable[:, None]
    neg_side = participate & ~fixed & (tsdf < 0) & updatable[:, None]
    pos_src = (participate & (fixed | (tsdf >= gamma))).at[-1].set(False)
    neg_src = (participate & (fixed | (tsdf <= -gamma))).at[-1].set(False)

    # sweep in the lane-fused layout (see sweep-layout machinery above);
    # masks convert once, state converts back once after the loop
    W = V + 2
    pos_side_h = _to_sweep_layout(pos_side, V, False)
    neg_side_h = _to_sweep_layout(neg_side, V, False)
    pos_src_h = _to_sweep_layout(pos_src, V, False)
    neg_src_h = _to_sweep_layout(neg_src, V, False)
    esdf0_h = _to_sweep_layout(esdf0, V, 0.0)

    max_ray_f = jnp.float32(max_ray)

    def body(carry):
        esdf, _, it = carry
        lo = _assemble_sweep(jnp.where(pos_src_h, esdf, BIG), nslots, V, BIG)
        hi = _assemble_sweep(jnp.where(neg_src_h, esdf, -BIG), nslots, V,
                             -BIG)
        fl, el, cl = _extrema_sweep(lo, jnp.minimum, BIG, W)
        fh, eh, chs = _extrema_sweep(hi, jnp.maximum, -BIG, W)
        cand_lo = jnp.minimum(jnp.minimum(fl + v1, el + v2), cl + v3)
        cand_hi = jnp.maximum(jnp.maximum(fh - v1, eh - v2), chs - v3)
        # pure Jacobi: the voxel's own previous value is NOT in the min —
        # this is what makes raise (stale-low) states self-correcting; the
        # seed (+-max_ray) bounds voxels with no supported neighbor yet
        new = jnp.where(pos_side_h, jnp.minimum(max_ray_f, cand_lo), esdf)
        new = jnp.where(neg_side_h, jnp.maximum(-max_ray_f, cand_hi), new)
        changed = jnp.any(jnp.abs(new - esdf) > 1e-6)
        return new, changed, it + 1

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_sweeps)

    esdf_h, _, sweeps = jax.lax.while_loop(
        cond, body, (esdf0_h, jnp.bool_(True), jnp.int32(0)))
    esdf_c = _from_sweep_layout(esdf_h, V)

    # scatter results back to full-size arrays; blocks outside the working
    # set (and the frozen rim) carry their previous values through
    tgt = jnp.where(updatable[:block_cap], slot_of, nb)
    esdf = jnp.where(participate_full, prev_esdf, 0.0).at[tgt].set(
        esdf_c[:block_cap], mode="drop")
    fixed_full = jnp.where(participate_full, prev_fixed,
                           0).astype(jnp.int8).at[tgt].set(
        fixed[:block_cap].astype(jnp.int8), mode="drop")

    # blocks whose final values differ from what out-of-set neighbors last
    # saw: re-queue them (and, via next call's dilation, their neighbors)
    row_changed = jnp.any(
        (jnp.abs(esdf_c - prev_e) > 1e-6) | (fixed != (prev_f > 0)),
        axis=1)
    changed_blocks = jnp.zeros((nb,), bool).at[tgt].set(
        row_changed[:block_cap], mode="drop").at[-1].set(False)
    overflow = jnp.maximum(btotal - block_cap, 0)
    return esdf, fixed_full, participate_full, sweeps, changed_blocks, \
        overflow


@partial(jax.jit, static_argnums=(0, 1, 2))
def esdf_slice_export(cfg: TSDFConfig, capacity: int, block_cap: int,
                      state, esdf, participate, base_R, base_T,
                      active_submap, z, dz):
    """cvt_ESDF_to_voxels_slice (dense_esdf.py:498-509): z-slice of the ESDF
    with jet colors over [-max_ray/4, max_ray/4] for contrast. Component
    arrays + sort-based compaction (see ops/exports.py for the TPU layout
    rationale); ``block_cap`` bucketed by the caller."""
    from taichislam_tpu.core.colormap import color_from_colormap
    from taichislam_tpu.core.compaction import compact_sort
    from taichislam_tpu.core.grid import block_origin_voxel
    from taichislam_tpu.ops.exports import (
        _compact_blocks, _gathered_ijk_c, _gathered_xyz_c, _intra_offsets_np)

    spec = cfg.grid
    nb = spec.max_blocks + 1
    V3 = spec.voxels_per_block
    base = block_origin_voxel(spec, state.block_coords)       # (nb, 3)
    kidx = (base[:, 2:3] + jnp.asarray(_intra_offsets_np(spec.V)[:, 2])
            [None, :]).astype(jnp.float32)                    # (nb, V³)
    zindex = jnp.trunc(z / cfg.voxel_scale)
    pre_mask = participate.reshape(nb, V3) & (kidx > zindex - dz) & \
        (kidx < zindex + dz)

    slot_of, bvalid, _, _ = _compact_blocks(spec, pre_mask, block_cap)
    coords, ijk_c = _gathered_ijk_c(spec, state, slot_of)
    x, y, zc = _gathered_xyz_c(spec, coords, ijk_c, base_R, base_T,
                               cfg.is_global_map)
    mask = jnp.take(pre_mask, slot_of, axis=0) & bvalid[:, None]
    esdf_g = jnp.take(esdf.reshape(nb, V3), slot_of, axis=0)

    outs, kept, _ = compact_sort(
        mask.reshape(-1), capacity,
        [x.reshape(-1), y.reshape(-1), zc.reshape(-1), esdf_g.reshape(-1)],
        [-100000.0, -100000.0, -100000.0, 0.0])
    rng = cfg.max_ray_length / 4.0
    col = color_from_colormap(outs[3], -rng, rng)
    col = jnp.where((jnp.arange(capacity) < kept)[:, None], col, 0.5)
    return outs[0], outs[1], outs[2], outs[3], col, kept


# kept for tests / debugging: the straightforward per-element formulation
def neighbor_table():
    dirs = [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
            for k in (-1, 0, 1) if (i, j, k) != (0, 0, 0)]
    d = np.asarray(dirs, np.int32)
    dist = np.linalg.norm(d, axis=-1).astype(np.float32)
    return jnp.asarray(d), jnp.asarray(dist)
