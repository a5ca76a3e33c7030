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
- **support-checked sweeps = built-in raise semantics**: each sweep computes
  the min-plus candidate ``cand[v] = min over source neighbors (esdf[n] +
  dist)``; a voxel whose current value is still *supported*
  (``cand <= esdf + eps``) relaxes monotonically (``min(esdf, cand)``),
  while an UNSUPPORTED voxel — its neighbors no longer justify the value it
  holds, i.e. its support chain was broken by a receding/erased surface —
  resets to the ±max_ray seed in one step. Broken support therefore
  propagates at one VOXEL per sweep (sweeps ~ stale-region diameter, the
  same work voxblox's raise queue does serially via parent_dir
  back-pointers, dense_esdf.py:261-273), and repair lowers in behind it.
  At any fixed point every non-fixed value heads a (within-slack)
  decreasing support chain into the fixed band, so with slack = 0 the fixed
  point is the unique true chamfer distance — the iteration converges there
  from ANY initialization (a plain monotone min keeps stale-low values
  forever; a pure Jacobi recompute raises them at only one voxel_scale per
  sweep, ~60 sweeps per frame on a moving surface). Property-tested on
  wall-deleted / wall-receded scenes against brute-force distance.
- **raise hysteresis** (``cfg.esdf_raise_slack_voxels``, default 2): the
  support tolerance. Sub-voxel sensor jitter perturbs every fixed seed by
  millimeters each frame; with zero tolerance that re-floods the full
  shadow region (up to max_ray deep) every frame — voxblox has the same
  pathology, one reason its ESDF "memory issue" was never closed. Gaps
  below the slack are tolerated, so stale values can lag the true field;
  the lag can ACCUMULATE along support chains at up to slack·voxel_scale
  per hop (a self-supporting uniformly-lagged region grants the
  tolerance at every hop). In practice the multi-hop axis scans re-root
  at fixed cells — axis-aligned chains carry the seed's exact value with
  ZERO per-hop slack — so only zig-zag/diagonal chains accumulate:
  measured worst-case residual ≈ 3·slack·voxel under adversarial
  fast-recession (tests/test_esdf.py
  test_esdf_budget_staleness_adversarial). Structural raises above the
  slack cascade exactly; slack = 0 recovers exact voxblox raise
  semantics (property-tested to the brute-force fixed point).
- warm starts: previous ESDF values initialize the iteration (kept where the
  TSDF sign is unchanged), so per-frame incremental updates converge in a
  few sweeps inside the ``lax.while_loop``; staleness of any kind is
  self-correcting per the support-check property above.
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

# debug-only (tools harnesses): set to a list to collect the loop kernel's
# per-call counter stats during TRACING (one entry per traced call)
_LOOP_STATS_HOOK = None


# ---------------------------------------------------------------------------
# halo machinery
# ---------------------------------------------------------------------------

def neighbor_slot_cols(spec, state, active_submap, rows=None):
    """(27, n) storage slot of each block's 26 neighbors (+ itself), column
    c = ((di+1)*3 + (dj+1))*3 + (dk+1); missing neighbors map to the
    garbage slot.

    ``rows=None`` covers all ``nb`` storage slots. Passing a compact (k,)
    row-index array probes only those rows — table lookups are per-element
    gathers (~7 ns/el on v5e), so probing 27·k beats 27·nb whenever the
    working set is small (the incremental-ESDF case). The neighbor ids are
    built column-wise from per-component coordinate arrays: the stacked
    (n, 3, 3, 3, 3) form pads its minor dims to 128 lanes on TPU and the
    relayout copies dominated the probe cost."""
    bc = state.block_coords  # (nb, 4)
    if rows is not None:
        s = jnp.take(bc[:, 0], rows)
        bi = jnp.take(bc[:, 1], rows)
        bj = jnp.take(bc[:, 2], rows)
        bk = jnp.take(bc[:, 3], rows)
    else:
        s, bi, bj, bk = bc[:, 0], bc[:, 1], bc[:, 2], bc[:, 3]
    base = s * spec.blocks_per_submap
    cols = []
    for di in (-1, 0, 1):
        ni = bi + di
        ok_i = (s >= 0) & (ni >= 0) & (ni < spec.bn_xy)
        for dj in (-1, 0, 1):
            nj = bj + dj
            ok_j = ok_i & (nj >= 0) & (nj < spec.bn_xy)
            for dk in (-1, 0, 1):
                nk = bk + dk
                ok = ok_j & (nk >= 0) & (nk < spec.bn_z)
                blin = (ni * spec.bn_xy + nj) * spec.bn_z + nk + base
                cols.append(jnp.where(ok, blin, -1))
    blin27 = jnp.stack(cols, axis=0)                   # (27, n): no minor pad
    return lookup_slots(spec, state.table, blin27)


# face-neighbor column ids in the (27, n) table: c = ((di+1)*3+(dj+1))*3+dk+1
_C_IM, _C_IP = 4, 22     # (-1, 0, 0) / (+1, 0, 0)
_C_JM, _C_JP = 10, 16    # (0, -1, 0) / (0, +1, 0)
_C_KM, _C_KP = 12, 14    # (0, 0, -1) / (0, 0, +1)


def neighbor_slot_table(spec, state, active_submap, rows=None):
    """(n, 3, 3, 3) view of :func:`neighbor_slot_cols` (cold-path API used
    by the mesher and the sharded gather)."""
    cols = neighbor_slot_cols(spec, state, active_submap, rows=rows)
    return cols.transpose(1, 0).reshape(-1, 3, 3, 3)


def _part1by2(x):
    """Spread the low 10 bits of x to every third bit (Morton helper)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & jnp.int32(0x030000FF)
    x = (x | (x << 8)) & jnp.int32(0x0300F00F)
    x = (x | (x << 4)) & jnp.int32(0x030C30C3)
    x = (x | (x << 2)) & jnp.int32(0x09249249)
    return x


def morton_order_rows(slot_of, bvalid, n_upd, block_coords):
    """Permute the compact working-set row list into Morton (Z-curve)
    order within each group (updatable prefix / frozen rim / garbage).

    The sweep kernels gate compute and halo-shell refresh at SLAB
    granularity (8 consecutive compact rows). Hash-slot allocation order
    is spatially random, so a spatially-tight wavefront smears across
    ~2x the slabs it occupies; Z-curve order packs spatial neighbors
    into the same slab and the gates fire on proportionally fewer rows.
    The permutation is EXACT: rows are gathered and scattered through
    ``slot_of``, the Jacobi sweep is order-independent across rows, and
    gate skips only ever drop provably-unchanged recomputes — field
    values AND sweep counts are bit-identical to any other order.
    Deterministic: stable sort on (group, morton, slot)."""
    cap = slot_of.shape[0]
    c = jnp.take(block_coords, slot_of, axis=0)
    key = (_part1by2(c[:, 1]) | (_part1by2(c[:, 2]) << 1)
           | (_part1by2(c[:, 3]) << 2))
    cpos = jnp.arange(cap, dtype=jnp.int32)
    grp = jnp.where(cpos < n_upd, 0, 1)
    grp = jnp.where(bvalid, grp, 2)
    key = jnp.where(bvalid, key, 0)
    _, _, out = jax.lax.sort((grp, key, slot_of), num_keys=2)
    return out


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

    ``nsl`` is the (27, n) compact-space neighbor column table (garbage
    row = n-1, whose values must already be ``fill``). Axis passes run
    i -> j -> k so each pass reads shells the earlier passes filled, which
    delivers all 20 edge/corner diagonals through face-only exchanges.
    """
    W = V + 2
    # i faces: our i=0 group <- neighbor(di=-1)'s i'=V group (both 18 lanes)
    g = jnp.take(H[:, :, V * W:(V + 1) * W], nsl[_C_IM], axis=0)
    H = H.at[:, :, 0:W].set(g)
    g = jnp.take(H[:, :, W:2 * W], nsl[_C_IP], axis=0)
    H = H.at[:, :, (V + 1) * W:(V + 2) * W].set(g)
    # j faces: single sublane rows, full lane extent (includes i shells)
    g = jnp.take(H[:, V:V + 1, :], nsl[_C_JM], axis=0)
    H = H.at[:, 0:1, :].set(g)
    g = jnp.take(H[:, 1:2, :], nsl[_C_JP], axis=0)
    H = H.at[:, V + 1:V + 2, :].set(g)
    # k faces: masked lane shifts (k is minor within lanes, so the slab is
    # strided; a +-V shift aligns neighbor k'=V/1 onto our k=0/V+1 lanes)
    m0_np, m1_np = _k_edge_masks_np(V)
    m0, m1 = jnp.asarray(m0_np), jnp.asarray(m1_np)
    g = jnp.take(H, nsl[_C_KM], axis=0)
    H = jnp.where(m0, _lshift(g, V, fill), H)
    g = jnp.take(H, nsl[_C_KP], axis=0)
    H = jnp.where(m1, _lshift(g, -V, fill), H)
    return H


@functools.lru_cache(maxsize=8)
def _shell_mask_np(V):
    """(V^3,) bool: voxels on a block's 1-voxel boundary shell (the
    Dirichlet support a 26-neighbor sees through halo exchange)."""
    i, j, k = np.meshgrid(*([np.arange(V)] * 3), indexing="ij")
    edge = (i == 0) | (i == V - 1) | (j == 0) | (j == V - 1) | \
        (k == 0) | (k == V - 1)
    return edge.reshape(-1)


@functools.lru_cache(maxsize=8)
def _scan_pos_np(W):
    """Per-direction coordinate arrays in the fused (n, W, W*W) layout:
    (k_pos (1,1,L), i_pos (1,1,L), j_pos (1,W,1)) as f32."""
    lane = np.arange(W * W)
    k = (lane % W).astype(np.float32).reshape(1, 1, -1)
    i = (lane // W).astype(np.float32).reshape(1, 1, -1)
    j = np.arange(W, dtype=np.float32).reshape(1, W, 1)
    return k, i, j


@functools.lru_cache(maxsize=32)
def _scan_posv_np(W, v1: float):
    """``pos * v1`` per direction, pre-multiplied in f32 NUMPY so the scan
    body contains no mul+add chain: LLVM/XLA would otherwise contract
    ``h - pos*v1`` into an FMA in some fusion contexts and not others,
    breaking bit-exactness between the single-device and block-sharded
    ESDF programs (asserted in tests/test_parallel.py)."""
    k, i, j = _scan_pos_np(W)
    v = np.float32(v1)
    return k * v, i * v, j * v


def _dbl_seg_scan(w, brk, shift_fn, n_steps, big):
    """Inclusive segmented min via Hillis-Steele doubling: ``m[k]`` = min of
    ``w`` over the positions before k (in scan direction) reachable without
    crossing a break-flagged position; a flagged position contributes its
    own value but blocks everything behind it (Dirichlet re-rooting)."""
    m, b = w, brk
    s = 1
    for _ in range(n_steps):
        m = jnp.minimum(m, jnp.where(b, big, shift_fn(m, s, big)))
        b = b | shift_fn(b, s, True)
        s *= 2
    return m


def _scan_candidates_fused(h, brk, v1, big, W):
    """Multi-hop axis-path min-plus candidates, self-EXCLUDED, computed in
    the lane-fused sweep layout (n, W, W*W) — the padded (n, W, W, W) form
    would 7x its minor dim to 128 lanes.

    For each of the 6 axis directions, a segmented min-plus scan
    (``scanmin(v - pos*d) + pos*d`` via log-doubling shifts) propagates a
    source's influence across the WHOLE block row in one pass — this is
    what lets a sweep move information V voxels instead of 1, so a receding
    surface (whose whole shadow must rise by the shift) re-converges in ~1
    sweep instead of shadow-depth sweeps.

    ``brk`` flags segment breaks: non-source positions (paths may not cross
    unobserved / other-side voxels, matching the reference's Bellman
    relaxation over active voxels only) and the FIXED band — fixed voxels
    are Dirichlet values that never update, so propagation re-roots at them
    (their own value still heads its segment) rather than tunneling a
    cheaper ray through from beyond. Structural breaks at the halo faces
    keep each scan on its spatial line (cross-block influence flows through
    the halo VALUES, exactly like the 26-stencil sweep).

    ``v1`` must be trace-time concrete: ``pos * v1`` is pre-multiplied on
    host (see _scan_posv_np) so no mul+add chain exists for XLA/LLVM to
    FMA-contract — the contraction decision varies with fusion context and
    would break single-device == sharded bit-exactness.
    """
    v1f = float(v1)
    k_np, i_np, j_np = _scan_pos_np(W)
    kv_np, iv_np, jv_np = _scan_posv_np(W, v1f)
    k_pos, i_pos, j_pos = (jnp.asarray(k_np), jnp.asarray(i_np),
                           jnp.asarray(j_np))
    k_pv, i_pv, j_pv = (jnp.asarray(kv_np), jnp.asarray(iv_np),
                        jnp.asarray(jv_np))
    v1c = jnp.float32(v1f)
    n_steps = max(1, int(np.ceil(np.log2(W))))
    out = jnp.full_like(h, big)

    def sh_k(x, s, fill):
        return _lshift(x, -s, fill)          # pull from k - s

    def sh_k_b(x, s, fill):
        return _lshift(x, s, fill)           # pull from k + s

    def sh_i(x, s, fill):
        return _lshift(x, -s * W, fill)

    def sh_i_b(x, s, fill):
        return _lshift(x, s * W, fill)

    def sh_j(x, s, fill):
        return _jshift(x, -s, fill)

    def sh_j_b(x, s, fill):
        return _jshift(x, s, fill)

    for posv, lo_face, shift_f, shift_b in (
            (k_pv, k_pos, sh_k, sh_k_b),
            (i_pv, i_pos, sh_i, sh_i_b),
            (j_pv, j_pos, sh_j, sh_j_b)):
        brk_f = brk | (lo_face == 0.0)
        brk_b = brk | (lo_face == float(W - 1))
        incl_f = _dbl_seg_scan(h - posv, brk_f, shift_f, n_steps,
                               big) + posv
        incl_b = _dbl_seg_scan(h + posv, brk_b, shift_b, n_steps,
                               big) - posv
        out = jnp.minimum(out, jnp.minimum(
            shift_f(incl_f, 1, big) + v1c,
            shift_b(incl_b, 1, big) + v1c))
    return out


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

def _use_pallas_sweep(cfg: TSDFConfig) -> bool:
    """Gate for the fused Pallas sweep kernel; on non-TPU backends "on"
    runs it in interpreter mode (tests), "auto" keeps the XLA body."""
    if cfg.pallas_esdf == "off":
        return False
    if cfg.pallas_esdf == "on":
        return True
    return jax.default_backend() == "tpu"


def _use_loop_kernel(cfg: TSDFConfig, max_sweeps: int, NROWS: int,
                     V: int) -> bool:
    """Gate for the whole-loop-in-one-kernel path: needs the Pallas sweep
    enabled, a real sweep budget, and the field to fit VMEM (the kernel
    keeps the (NROWS, V+2, (V+2)^2) f32 field resident; its padded size
    must leave room for the enc double-buffer and compute temporaries).
    "auto" engages on TPU only — interpret mode unrolls the whole grid
    into the trace, so off-TPU it is for tiny dedicated tests ("on")."""
    if cfg.esdf_loop_kernel == "off" or cfg.esdf_force_sweeps:
        return False
    if not _use_pallas_sweep(cfg):
        return False
    if max_sweeps < 2:
        return False
    W = V + 2
    padded = NROWS * (-(-W // 8) * 8) * (-(-(W * W) // 128) * 128) * 4
    if padded > 12 * 2 ** 20:
        return False
    if cfg.esdf_loop_kernel == "on":
        return True
    return jax.default_backend() == "tpu"


@partial(jax.jit, static_argnums=(0, 5))
def esdf_seed_dirty(cfg: TSDFConfig, state, seen_tsdf, seen_obs, touched,
                    touched_cap: int = 512):
    """Updated-voxel gating for the incremental ESDF.

    voxblox's ESDF integrator only processes TSDF voxels whose value moved
    by more than ``min_diff_m`` since the ESDF last consumed them
    (esdf_integrator.cc updateFromTsdfBlocks, the ``updated(kEsdf)`` flag) —
    that gate is what makes its per-cycle cost track *material* map change
    rather than camera coverage. Same idea here at block granularity: of
    the frame-``touched`` blocks, only those where some voxel's TSDF moved
    more than ``cfg.esdf_seed_eps_voxels`` (or an observed flag flipped)
    since their last consumption are ESDF-dirty. ``seen_*`` are the
    consumption snapshots; dirty rows refresh them (so sub-threshold drift
    ACCUMULATES against the snapshot and eventually triggers — no unbounded
    creep).

    The compare runs on the compacted touched rows (row gathers are
    DMA-class) rather than the full channel arrays — ~0.05 ms instead of a
    ~0.3 ms full-array pass at 2048 blocks. ``touched_cap`` rows above the
    cap degrade safely: they are treated as dirty UNCOMPARED and their
    snapshots stay STALE, so they keep re-triggering on every later touch
    until a compared pass refreshes them — conservative, never silently
    skipped.

    Returns (dirty_bitmap, seen_tsdf', seen_obs').
    """
    from taichislam_tpu.core.compaction import compact_mask

    nb = cfg.grid.max_blocks + 1
    eps = jnp.float32(max(cfg.esdf_seed_eps_voxels, 0.0) * cfg.voxel_scale)
    touched = touched.at[-1].set(False)
    pos, kept, _ = compact_mask(touched, touched_cap)
    rows = jnp.full((touched_cap,), nb - 1, jnp.int32).at[pos].set(
        jnp.arange(nb, dtype=jnp.int32), mode="drop")
    valid = jnp.arange(touched_cap) < kept

    # gather rows FIRST, convert after: .astype on the full f16 channel
    # materializes a (nb, V^3) f32 temp (~33 MB at 2048 blocks) just to
    # read ~150 rows of it
    tsdf_r = jnp.take(state.channels["TSDF"], rows, axis=0).astype(
        jnp.float32)
    obs_r = jnp.take(state.channels["TSDF_observed"] > 0, rows, axis=0)
    seen_t_r = jnp.take(seen_tsdf, rows, axis=0)
    seen_o_r = jnp.take(seen_obs, rows, axis=0)
    diff_r = jnp.any((jnp.abs(tsdf_r - seen_t_r) > eps) |
                     (obs_r != seen_o_r), axis=1) & valid

    dirty = jnp.zeros((nb,), bool).at[jnp.where(diff_r, rows, nb - 1)].set(
        True).at[-1].set(False)
    # overflowed touched rows (total > cap): dirty without comparison
    dirty = (dirty | (touched & ~jnp.zeros((nb,), bool).at[rows].set(
        valid))).at[-1].set(False)
    tgt = jnp.where(diff_r, rows, nb - 1)
    seen_tsdf = seen_tsdf.at[tgt].set(
        jnp.where(diff_r[:, None], tsdf_r, seen_t_r)).at[nb - 1].set(0.0)
    seen_obs = seen_obs.at[tgt].set(
        jnp.where(diff_r[:, None], obs_r, seen_o_r)).at[nb - 1].set(False)
    return dirty, seen_tsdf, seen_obs


@partial(jax.jit, static_argnums=(0, 1, 2, 8))
def esdf_update(cfg: TSDFConfig, max_sweeps: int, block_cap: int, state,
                prev_esdf, prev_fixed, active_submap, dirty_blocks=None,
                _ablate: str = "", tsdf_src=None, obs_src=None):
    """Compute the ESDF over the active submap's observed voxels.

    ``tsdf_src``/``obs_src`` (optional (max_blocks+1, V^3) arrays) replace
    the live TSDF/observed channels as the seed source — the
    consume-once snapshot mode: voxblox's ESDF reads TSDF values at
    updated-flag events and is then insensitive to sub-``min_diff_m``
    drift (esdf_integrator.cc); passing ``esdf_seed_dirty``'s refreshed
    ``seen_tsdf``/``seen_obs`` snapshots reproduces that. Without it,
    every re-queued block re-derives seeds from the LIVE TSDF, so
    sub-gate sensor jitter (mm per frame) re-enters through every visit
    and the re-queue cascade never settles — measured on the bench orbit:
    ~100 re-queued blocks and 20-25 drained sweeps EVERY frame, vs the
    gated-region-only work this mode restores. The ESDF then lags the
    live TSDF by at most the seed gate (``esdf_seed_eps_voxels``, default
    0.25 voxels = 12.5 mm at 5 cm — 4x tighter than voxblox's 5 cm
    default gate).

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

    # raw (possibly f16) — converted AFTER the compact row gather (gcomp);
    # a full-array .astype would materialize a (nb, V^3) f32 temp per call
    tsdf_full = (state.channels["TSDF"] if tsdf_src is None
                 else tsdf_src)
    obs_full = (state.channels["TSDF_observed"] > 0 if obs_src is None
                else obs_src)
    blk = state.block_active & (state.block_coords[:, 0] == active_submap)
    blk = blk.at[-1].set(False)
    participate_full = obs_full & blk[:, None]

    # compact rows are padded once to a multiple of 8 (the Pallas sweep
    # kernel's slab height) so no per-sweep row padding is needed
    NROWS = block_cap + 1 + ((-(block_cap + 1)) % 8)

    if dirty_blocks is None:
        work_blk = blk
        src_blk = blk
        bpos, bkept, btotal = compact_mask(src_blk, block_cap)
        slot_of = jnp.full((block_cap + 1,), nb - 1, jnp.int32).at[bpos].set(
            jnp.arange(nb, dtype=jnp.int32), mode="drop")[:block_cap]
        bvalid = jnp.arange(block_cap) < bkept
        n_upd = bkept
        overflow_in = jnp.maximum(btotal - block_cap, 0)
        ns_d = rows_d = validD = None
    else:
        # The working set is the dirty blocks THEMSELVES; their 26-ring is
        # gathered as a FROZEN rim only (the sweep recomputes every voxel
        # from its neighbors, so edge voxels must see their out-of-set
        # support as Dirichlet boundary values or they would spuriously
        # raise). Wavefronts that need to propagate INTO the rim are
        # re-queued via the boundary-shell logic below — the next update
        # picks them up, amortizing long-range propagation across frames
        # exactly like voxblox's budget-bounded queues. Keeping the update
        # ring tight (vs dilating the dirty set up front) halves the
        # compacted cap and with it every per-sweep cost.
        #
        # ONE neighbor probe serves everything: the dirty rows' 27-slot
        # table ``ns_d`` IS the src candidate list (dirty ∪ rim), the
        # kernel's halo-exchange table (only updatable rows need halos),
        # and the epilogue's shell re-queue targets — the round-2 version
        # paid two probes, a bitmap scatter round-trip, and a second
        # full-bitmap compaction here (~0.9 ms of tiny-op latency).
        dirty = dirty_blocks.at[-1].set(False)
        work_blk = blk & dirty
        posD, keptD, totalD = compact_mask(work_blk, block_cap)
        rows_d = jnp.full((block_cap,), nb - 1, jnp.int32).at[posD].set(
            jnp.arange(nb, dtype=jnp.int32), mode="drop")
        validD = jnp.arange(block_cap) < keptD
        if _ablate == "ws1":
            overflow_in = jnp.maximum(totalD - block_cap, 0)
            participate_full = participate_full
            return (prev_esdf.at[0, 0].add(
                (jnp.sum(rows_d) + jnp.sum(validD)).astype(jnp.float32)
                * 1e-30), prev_fixed.astype(jnp.int8), participate_full,
                jnp.int32(0), jnp.zeros((nb,), bool), overflow_in)
        ns_d = neighbor_slot_cols(spec, state, active_submap, rows=rows_d)
        if _ablate == "ws2":
            overflow_in = jnp.maximum(totalD - block_cap, 0)
            return (prev_esdf.at[0, 0].add(
                jnp.sum(ns_d).astype(jnp.float32) * 1e-30),
                prev_fixed.astype(jnp.int8), participate_full,
                jnp.int32(0), jnp.zeros((nb,), bool), overflow_in)
        ns_flat = jnp.where(validD[None, :], ns_d, nb - 1)    # (27, cap)
        # compact rows are ordered DIRTY-FIRST (rim after): updatable rows
        # become a prefix, so the sweep kernel can skip whole rim slabs
        # (they are Dirichlet pass-throughs — computing them was ~half the
        # per-sweep VPU work). Rim = sort-dedupe of the dirty rows'
        # neighbor slots, minus the dirty rows themselves (garbage slot
        # nb-1 sorts last and is masked); ascending slot order within each
        # group, deterministic.
        srt = jax.lax.sort(ns_flat.reshape(-1))
        head = (srt < nb - 1) & jnp.concatenate(
            [jnp.array([True]), srt[1:] != srt[:-1]])
        head &= ~jnp.take(work_blk, srt)       # exclude dirty rows
        posR, keptR, totalR = compact_mask(head, block_cap)
        posR = jnp.where(posR < block_cap, posR + keptD, block_cap)
        slot_of = jnp.full((block_cap + 1,), nb - 1, jnp.int32).at[posD].set(
            jnp.arange(nb, dtype=jnp.int32), mode="drop").at[
            jnp.minimum(posR, block_cap)].set(
            jnp.where(head, srt, nb - 1), mode="drop")[:block_cap]
        keptS = jnp.minimum(keptD + keptR, block_cap)
        bvalid = jnp.arange(block_cap) < keptS
        n_upd = keptD
        overflow_in = jnp.maximum(
            jnp.maximum(totalD, totalD + totalR) - block_cap, 0)
        if _ablate == "ws3":
            return (prev_esdf.at[0, 0].add(
                (jnp.sum(slot_of) + jnp.sum(bvalid)).astype(jnp.float32)
                * 1e-30), prev_fixed.astype(jnp.int8), participate_full,
                jnp.int32(0), jnp.zeros((nb,), bool), overflow_in)

    # spatial (Z-curve) row order within each group: the sweep kernels'
    # slab-granular activity gates fire on whole 8-row slabs, so packing
    # spatial neighbors into the same slab is pure gate efficiency (see
    # morton_order_rows — exact, deterministic)
    slot_of = morton_order_rows(slot_of, bvalid, n_upd,
                                state.block_coords)

    # global slot -> compact index (garbage rows -> block_cap)
    inv = jnp.full((nb,), block_cap, jnp.int32).at[slot_of].set(
        jnp.where(bvalid, jnp.arange(block_cap, dtype=jnp.int32), block_cap),
        mode="drop")

    def gcomp(arr, fill):
        out = jnp.take(arr, slot_of, axis=0)
        out = jnp.where(bvalid[:, None], out, fill)
        pad = jnp.full((NROWS - block_cap,) + out.shape[1:], fill, out.dtype)
        return jnp.concatenate([out, pad], axis=0)   # (NROWS, V^3)

    tsdf = gcomp(tsdf_full, 0.0).astype(jnp.float32)
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

    # neighbor slots in compact space, for ALL src rows: rim rows never
    # read their own halos (they are Dirichlet pass-throughs), but the
    # axis-sequential halo exchange (_assemble_sweep) delivers DIAGONAL
    # values into updatable rows through their face-neighbor rows' shells,
    # so rim-row halos must be populated too — with garbage halos there,
    # boundary voxels lose their diagonal rim support and spuriously
    # raise/re-queue every update.
    if ns_d is not None:
        tgtD = jnp.where(validD, jnp.take(inv, rows_d), block_cap)
    nslots = jnp.take(inv, neighbor_slot_cols(
        spec, state, active_submap, rows=slot_of), axis=0)   # (27, cap)
    nslots = jnp.where(bvalid[None, :], nslots, block_cap)
    nslots = jnp.concatenate(
        [nslots, jnp.full((27, NROWS - block_cap), block_cap,
                          jnp.int32)], axis=1)               # (27, NROWS)

    # rows holding frozen-rim blocks participate as sources but are never
    # updated (Dirichlet boundary of the working set)
    updatable = jnp.take(work_blk, slot_of, axis=0) & bvalid
    updatable = jnp.concatenate(
        [updatable, jnp.zeros((NROWS - block_cap,), bool)])

    pos_side = participate & ~fixed & (tsdf >= 0) & updatable[:, None]
    neg_side = participate & ~fixed & (tsdf < 0) & updatable[:, None]
    pos_src = (participate & (fixed | (tsdf >= gamma))).at[-1].set(False)
    neg_src = (participate & (fixed | (tsdf <= -gamma))).at[-1].set(False)

    # debug-only cost ablation (tools/exp_r3_fixed.py): return early with the
    # named stage's products folded into the output so DCE trims the rest
    def _abl_ret(*arrs):
        s = jnp.float32(0)
        for a in arrs:
            s = s + jnp.sum(a.astype(jnp.float32))
        return (prev_esdf.at[0, 0].add(s * 1e-30),
                prev_fixed.astype(jnp.int8), participate_full, jnp.int32(0),
                jnp.zeros((nb,), bool), overflow_in)

    if _ablate in ("ws", "rows"):
        if _ablate == "ws":
            arrs = [slot_of, nslots, updatable]
            if ns_d is not None:
                arrs += [ns_d, rows_d]
        else:
            arrs = [slot_of, nslots, updatable, tsdf, participate, esdf0,
                    fixed, pos_side, neg_side, pos_src, neg_src]
        return _abl_ret(*arrs)

    # sweep in the lane-fused layout (see sweep-layout machinery above);
    # masks convert once, state converts back once after the loop
    W = V + 2
    pos_side_h = _to_sweep_layout(pos_side, V, False)
    neg_side_h = _to_sweep_layout(neg_side, V, False)
    pos_src_h = _to_sweep_layout(pos_src, V, False)
    neg_src_h = _to_sweep_layout(neg_src, V, False)
    esdf0_h = _to_sweep_layout(esdf0, V, 0.0)
    # fixed cells break scan segments (Dirichlet re-rooting); the mask is
    # sweep-invariant, so its halo is assembled once
    fixed_h = _assemble_sweep(
        _to_sweep_layout(fixed.astype(jnp.float32), V, 0.0), nslots, V,
        0.0) > 0.5

    max_ray_f = jnp.float32(max_ray)
    # raise hysteresis (see TSDFConfig.esdf_raise_slack_voxels): support
    # gaps <= slack are tolerated (bounded staleness, no cascade); larger
    # gaps reset to the seed and cascade like voxblox's raise queue
    eps_py = max(cfg.esdf_raise_slack_voxels * cfg.voxel_scale, 1e-4)
    eps = jnp.float32(eps_py)

    def _scan_this_sweep(cfg, it):
        """Scan-sweep predicate: the first ``esdf_scan_sweeps`` sweeps,
        plus every ``esdf_scan_period``-th sweep (the drained-mode
        block-crossing cadence — see TSDFConfig.esdf_scan_period)."""
        pred = it < cfg.esdf_scan_sweeps
        if cfg.esdf_scan_period > 0:
            pred |= (it % cfg.esdf_scan_period) == 0
        return pred

    def body(carry):
        esdf, _, it = carry[:3]
        lo = _assemble_sweep(jnp.where(pos_src_h, esdf, BIG), nslots, V, BIG)
        hi = _assemble_sweep(jnp.where(neg_src_h, esdf, -BIG), nslots, V,
                             -BIG)
        fl, el, cl = _extrema_sweep(lo, jnp.minimum, BIG, W)
        fh, eh, chs = _extrema_sweep(hi, jnp.maximum, -BIG, W)
        cand_lo = jnp.minimum(jnp.minimum(fl + v1, el + v2), cl + v3)
        cand_hi = jnp.maximum(jnp.maximum(fh - v1, eh - v2), chs - v3)

        # multi-hop axis scans (see _scan_candidates_fused) run on the
        # first ``cfg.esdf_scan_sweeps`` sweeps (default 1): raise events
        # originate from seed changes between updates, so one scan pass
        # carries every risen seed's influence across its whole row (the
        # raise queue); the remaining sweeps are cheap 26-class
        # refinements (a scan pass costs ~2x a class sweep). Residual
        # long-range adjustments re-queue via ``changed_blocks`` and get
        # next update's scan pass. -1 = scans every sweep (drained mode:
        # converges in ~2-3 sweeps instead of ~shadow-diameter).
        def with_scans(cands):
            c_lo, c_hi = cands
            c_lo = jnp.minimum(c_lo, _scan_candidates_fused(
                lo, (lo >= BIG * 0.5) | fixed_h, float(cfg.voxel_scale),
                BIG, W))
            c_hi = jnp.maximum(c_hi, -_scan_candidates_fused(
                -hi, (hi <= -BIG * 0.5) | fixed_h, float(cfg.voxel_scale),
                BIG, W))
            return c_lo, c_hi

        if cfg.esdf_scan_sweeps < 0:
            cand_lo, cand_hi = with_scans((cand_lo, cand_hi))
        else:
            cand_lo, cand_hi = jax.lax.cond(
                _scan_this_sweep(cfg, it), with_scans, lambda c: c,
                (cand_lo, cand_hi))

        # support check (see module docstring): supported values relax
        # monotonically; an UNSUPPORTED value — its (multi-hop) neighbors
        # no longer justify what it holds, i.e. the surface receded —
        # ADOPTS the candidate (on the scan sweep it already carries the
        # risen seed's influence across the whole row)
        new = jnp.where(cand_lo <= esdf + eps,
                        jnp.minimum(esdf, cand_lo),
                        jnp.minimum(max_ray_f, cand_lo))
        new = jnp.where(pos_side_h, new, esdf)
        new_n = jnp.where(cand_hi >= esdf - eps,
                          jnp.maximum(esdf, cand_hi),
                          jnp.maximum(-max_ray_f, cand_hi))
        new = jnp.where(neg_side_h, new_n, new)
        changed = jnp.any(jnp.abs(new - esdf) > cfg.esdf_converge_eps)
        if cfg.esdf_force_sweeps:       # measurement mode: no early exit
            changed = jnp.bool_(True)
        return new, changed, it + 1, carry[3]

    if _use_pallas_sweep(cfg):
        # fused-kernel path (ops/pallas/esdf_sweep.py): the whole sweep
        # body — source masking, class extrema, scans, support check — runs
        # as ONE VMEM-resident pass; only the halo exchange stays out here.
        # All static kernel inputs collapse into ONE encoded channel:
        # ``enc = TSDF where participating else +BIG``, from which the
        # kernel derives observed / fixed / source masks on-chip, plus the
        # interior-only update-side mask (one channel assembly + one
        # elementwise pass replace the round-2 version's two assemblies and
        # three layout conversions).
        from taichislam_tpu.ops.pallas.esdf_sweep import ENC_BIG, \
            esdf_sweep_pallas
        enc_hh = _assemble_sweep(
            _to_sweep_layout(jnp.where(participate, tsdf, ENC_BIG), V,
                             ENC_BIG), nslots, V, ENC_BIG)
        side_hh = pos_side_h.astype(jnp.int8) - neg_side_h.astype(jnp.int8)
        if _ablate == "layout":
            return _abl_ret(esdf0_h, enc_hh, side_hh, nslots)

        upd_prefix = jnp.arange(NROWS) < n_upd

        def body(carry):
            esdf, _, it, act = carry
            eh = _assemble_sweep(esdf, nslots, V, 0.0)
            # per-slab activity gate: a slab computes only while some of
            # its updatable rows — or their neighbors — changed last
            # sweep; converged regions and the frozen rim pass through
            # (exact: unchanged inputs recompute to the same values).
            # This is the within-update wavefront the raise/lower queues
            # gave voxblox: late sweeps touch only the moving front.
            slab_act = jnp.any((act & upd_prefix).reshape(-1, 8),
                               axis=1).astype(jnp.int32)

            def call(with_scans):
                def f(x):
                    return esdf_sweep_pallas(
                        x, enc_hh, side_hh, slab_act, V=V,
                        v1=float(cfg.voxel_scale), gamma=float(gamma),
                        eps=float(eps_py), max_ray=float(max_ray),
                        with_scans=with_scans,
                        interpret=jax.default_backend() != "tpu")
                return f
            # scans on the first cfg.esdf_scan_sweeps sweeps (like the XLA
            # body); -1 = the scans kernel every sweep (drained mode)
            if cfg.esdf_scan_sweeps < 0:
                new = call(True)(eh)
            else:
                new = jax.lax.cond(_scan_this_sweep(cfg, it), call(True),
                                   call(False), eh)
            diff_rows = jnp.any(jnp.abs(new - eh) > cfg.esdf_converge_eps,
                                axis=(1, 2))
            changed = jnp.any(diff_rows)
            act_next = diff_rows | jnp.any(jnp.take(diff_rows, nslots),
                                           axis=0)
            if cfg.esdf_force_sweeps:   # measurement mode: no gating
                changed = jnp.bool_(True)
                act_next = jnp.ones_like(act_next)
            return new, changed, it + 1, act_next

    def cond(carry):
        _, changed, it = carry[:3]
        return changed & (it < max_sweeps)

    carry0 = (esdf0_h, jnp.bool_(True), jnp.int32(0),
              jnp.ones((NROWS,), bool))
    if _use_loop_kernel(cfg, max_sweeps, NROWS, V):
        # whole loop in ONE kernel: sweeps + in-VMEM halo exchange +
        # convergence (see esdf_sweep_loop_pallas). Eliminates the
        # measured 0.28 ms/sweep of per-sweep XLA glue (halo gather
        # passes, diff/activity reductions, while carry staging,
        # dispatch) — tools/exp_drained.py --split.
        from taichislam_tpu.ops.pallas.esdf_sweep import \
            esdf_sweep_loop_pallas
        ss = max_sweeps if cfg.esdf_scan_sweeps < 0 else \
            cfg.esdf_scan_sweeps
        esdf_h, lstats = esdf_sweep_loop_pallas(
            esdf0_h, enc_hh, nslots, updatable.astype(jnp.int32),
            V=V, v1=float(cfg.voxel_scale), gamma=float(gamma),
            eps=float(eps_py), eps_conv=float(cfg.esdf_converge_eps),
            max_ray=float(max_ray), max_sweeps=int(max_sweeps),
            scan_sweeps=int(ss), scan_period=int(cfg.esdf_scan_period),
            interpret=jax.default_backend() != "tpu")
        sweeps = lstats[0]
        # debug hook (tools/exp_* cost-model harnesses): the kernel's
        # [sweeps, changed_at_exit, computed_slabs, shell_rows] counters
        _LOOP_STATS_HOOK.append(lstats) if _LOOP_STATS_HOOK is not None \
            else None
    elif max_sweeps <= 4:
        # unrolled: a while op costs ~0.2 ms/frame in carry staging alone
        # at this size; for small budgets run the sweeps straight-line.
        # Converged-early sweeps self-gate (all slabs inactive -> the
        # kernel is a pass-through), matching the while semantics: the
        # sweep count still advances only while something changed.
        carry = carry0
        for _ in range(max_sweeps):
            new = body(carry)
            go = carry[1]   # while-cond: sweep only while still changing
            if _use_pallas_sweep(cfg):
                # the act gate already freezes a converged field exactly
                # (all slabs inactive -> the kernel passes the assembled
                # state through, shells are re-filled next sweep); only
                # the sweep counter needs the while-cond gate
                carry = (new[0], new[1],
                         jnp.where(go, new[2], carry[2]), new[3])
            else:
                # the XLA body keeps applying sub-eps drift after
                # convergence; gate everything to match while semantics
                carry = (jnp.where(go, new[0], carry[0]),
                         jnp.where(go, new[1], carry[1]),
                         jnp.where(go, new[2], carry[2]),
                         jnp.where(go, new[3], carry[3]))
        esdf_h, _, sweeps, _ = carry
    else:
        esdf_h, _, sweeps, _ = jax.lax.while_loop(cond, body, carry0)
    esdf_c = _from_sweep_layout(esdf_h, V)
    if _ablate == "noepi":
        return _abl_ret(esdf_c, fixed)

    # scatter results back to full-size arrays; blocks outside the working
    # set (and the frozen rim) carry their previous values through. The
    # updated rows themselves are masked to the participating voxels, but
    # rows outside the working set are NOT re-masked: consumers read the
    # field through the returned observed bitmap, so values in stale or
    # foreign-submap rows are never visible, and skipping the full-size
    # re-zero saves two (nb, V^3) passes per call.
    tgt = jnp.where(updatable[:block_cap], slot_of, nb)
    esdf_rows = jnp.where(participate[:block_cap], esdf_c[:block_cap], 0.0)
    esdf = prev_esdf.at[tgt].set(esdf_rows, mode="drop")
    fixed_rows = jnp.where(participate[:block_cap], fixed[:block_cap],
                           False).astype(jnp.int8)
    fixed_full = prev_fixed.astype(jnp.int8).at[tgt].set(fixed_rows,
                                                         mode="drop")

    # re-queue policy (the cross-frame half of the amortization scheme
    # described above): a block whose values still changed re-enters the
    # next update (it may not have converged within the budget); a block
    # whose BOUNDARY-SHELL voxels changed additionally re-queues its
    # 26-neighbors — the shell is their Dirichlet support, so a wavefront
    # reaching a block face propagates outward next frame. Interior-only
    # changes (the common case: seeds jittering inside a block) wake nobody
    # else, which keeps the steady-state working set at the dirty blocks.
    diff = (jnp.abs(esdf_c - prev_e) > cfg.esdf_converge_eps) | \
        (fixed != (prev_f > 0))
    row_changed = jnp.any(diff, axis=1)
    changed_blocks = jnp.zeros((nb,), bool).at[tgt].set(
        row_changed[:block_cap], mode="drop").at[-1].set(False)
    if dirty_blocks is not None:
        shell = jnp.asarray(_shell_mask_np(V))
        shell_changed = jnp.any(diff & shell[None, :], axis=1)  # (NROWS,)
        # shell-changed rows are updatable (= dirty) rows, whose 27-slot
        # neighborhoods were already probed into ``ns_flat`` — one scatter
        # re-queues them, no second dilation pass
        shell_d = jnp.take(shell_changed, jnp.minimum(tgtD, NROWS - 1)) & \
            validD
        tgt27 = jnp.where(shell_d[None, :], ns_flat, nb - 1)
        shell_blocks = jnp.zeros((nb,), bool).at[tgt27.reshape(-1)].set(
            True).at[-1].set(False)
        changed_blocks = (changed_blocks |
                          (blk & shell_blocks)).at[-1].set(False)
    # overflow_in also guards the probe inputs: a dropped dirty row would
    # silently under-build the working set
    overflow = overflow_in
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


# ---------------------------------------------------------------------------
# dense-window sweep mode
#
# The block-halo sweep above scales to HBM-sized maps, but its cross-block
# propagation is one block per sweep and every sweep pays halo assembly. When
# the OBSERVED region's bounding box fits a modest dense grid (the common
# robotics case: a 5 m room at 5 cm = ~2.4 MB), sweeping the dense window is
# strictly better: no halos, axis scans run the full window length (an
# exploration wedge fills in ~1 sweep), and each sweep is a handful of fused
# elementwise passes. DenseESDF picks the mode by window size.
# ---------------------------------------------------------------------------

def _dshift(x, s, axis, fill):
    """Shift 3-D dense array by s along axis, filling vacated cells."""
    W_ = x.shape[axis]
    pad_shape = list(x.shape)
    pad_shape[axis] = abs(s)
    pad = jnp.full(pad_shape, fill, x.dtype)
    if s > 0:
        return jnp.concatenate(
            [pad, jax.lax.slice_in_dim(x, 0, W_ - s, axis=axis)], axis=axis)
    return jnp.concatenate(
        [jax.lax.slice_in_dim(x, -s, W_, axis=axis), pad], axis=axis)


def _dense_extrema(h, op, fill):
    """Class-wise 26-neighborhood extrema on a dense (X, Y, Z) grid."""
    ax = op(_dshift(h, 1, 0, fill), _dshift(h, -1, 0, fill))
    ay = op(_dshift(h, 1, 1, fill), _dshift(h, -1, 1, fill))
    az = op(_dshift(h, 1, 2, fill), _dshift(h, -1, 2, fill))
    faces = op(op(ax, ay), az)
    exy = op(_dshift(ax, 1, 1, fill), _dshift(ax, -1, 1, fill))
    exz = op(_dshift(ax, 1, 2, fill), _dshift(ax, -1, 2, fill))
    eyz = op(_dshift(ay, 1, 2, fill), _dshift(ay, -1, 2, fill))
    edges = op(op(exy, exz), eyz)
    corners = op(_dshift(exy, 1, 2, fill), _dshift(exy, -1, 2, fill))
    return faces, edges, corners


def _dense_scan_candidates(h, brk, v1, big):
    """Full-window multi-hop axis min-plus candidates (self-excluded) on a
    dense (X, Y, Z) grid — same semantics as _scan_candidates_fused but
    with unlimited range (no block boundaries)."""
    out = jnp.full_like(h, big)
    for axis in range(3):
        W_ = h.shape[axis]
        shape = [1, 1, 1]
        shape[axis] = W_
        pos = jnp.arange(W_, dtype=h.dtype).reshape(shape)
        n_steps = max(1, int(np.ceil(np.log2(W_))))

        def sh_f(x, s, fill, axis=axis):
            return _dshift(x, s, axis, fill)      # pull from pos - s

        def sh_b(x, s, fill, axis=axis):
            return _dshift(x, -s, axis, fill)     # pull from pos + s

        incl_f = _dbl_seg_scan(h - pos * v1, brk, sh_f, n_steps,
                               big) + pos * v1
        incl_b = _dbl_seg_scan(h + pos * v1, brk, sh_b, n_steps,
                               big) - pos * v1
        out = jnp.minimum(out, jnp.minimum(
            sh_f(incl_f, 1, big) + v1, sh_b(incl_b, 1, big) + v1))
    return out


@partial(jax.jit, static_argnums=(0, 1, 2))
def esdf_update_dense(cfg: TSDFConfig, max_sweeps: int, dims_blocks, state,
                      prev_esdf, prev_fixed, active_submap,
                      dirty_blocks=None, tsdf_src=None, obs_src=None):
    """Dense-window variant of :func:`esdf_update` (same returns; same
    optional consume-once snapshot seed source).

    ``dims_blocks`` is the static (DBX, DBY, DBZ) window size in blocks; the
    window origin is the dynamic minimum of the participating blocks'
    coordinates. Participating blocks outside the window are reported in the
    overflow count (the caller grows the bucketed dims). The update itself
    is the same support-checked relaxation with adopt + multi-hop scans —
    scans run EVERY sweep here (they are as cheap as a class sweep on the
    dense grid) and span the whole window, so exploration wedges and
    receding surfaces re-converge in a few sweeps.

    With ``dirty_blocks`` (per-slot bool bitmap) the window covers the
    DIRTY blocks' bounding box plus a one-block ring; in-window non-dirty
    blocks participate as FROZEN Dirichlet sources (like the block mode's
    rim), and only dirty blocks update. Because the full-window axis scans
    run every sweep, a dirty working set converges in ~2-3 sweeps — the
    fast path for DRAINED per-frame updates, where the block-halo mode
    needs ~working-set-diameter sweeps (cross-block information moves one
    halo per sweep). Out-of-window wavefronts re-queue via the returned
    ``changed_blocks`` exactly like the block mode.
    """
    spec = cfg.grid
    V = spec.V
    nb = spec.max_blocks + 1
    V3 = spec.voxels_per_block
    DBX, DBY, DBZ = dims_blocks
    NBD = DBX * DBY * DBZ
    gamma = cfg.voxel_scale
    max_ray = cfg.max_ray_length
    v1 = jnp.float32(cfg.voxel_scale)
    v2 = jnp.float32(np.sqrt(2.0) * cfg.voxel_scale)
    v3c = jnp.float32(np.sqrt(3.0) * cfg.voxel_scale)
    max_ray_f = jnp.float32(max_ray)
    eps = jnp.float32(max(cfg.esdf_raise_slack_voxels * cfg.voxel_scale,
                          1e-4))
    BIGF = jnp.float32(1e9)

    c4 = state.block_coords
    blk = state.block_active & (c4[:, 0] == active_submap)
    blk = blk.at[-1].set(False)

    huge = jnp.int32(1 << 20)
    if dirty_blocks is None:
        anchor = blk
        ring = 0
    else:
        anchor = blk & dirty_blocks.at[-1].set(False)
        ring = 1          # one-block Dirichlet rim around the dirty bbox
    bx0 = jnp.min(jnp.where(anchor, c4[:, 1], huge)) - ring
    by0 = jnp.min(jnp.where(anchor, c4[:, 2], huge)) - ring
    bz0 = jnp.min(jnp.where(anchor, c4[:, 3], huge)) - ring
    dbi = c4[:, 1] - bx0
    dbj = c4[:, 2] - by0
    dbk = c4[:, 3] - bz0
    in_win = blk & (dbi >= 0) & (dbi < DBX) & (dbj >= 0) & (dbj < DBY) & \
        (dbk >= 0) & (dbk < DBZ)
    # every ANCHOR block must sit with its full ring inside the window (a
    # dirty block whose allocated neighbor falls outside would lose that
    # Dirichlet support and spuriously raise); non-anchor active blocks
    # outside are fine (frozen anyway, their values pass through)
    in_core = (dbi >= ring) & (dbi < DBX - ring) & (dbj >= ring) & \
        (dbj < DBY - ring) & (dbk >= ring) & (dbk < DBZ - ring)
    overflow = jnp.sum((anchor & ~in_core).astype(jnp.int32))
    dlin = (dbi * DBY + dbj) * DBZ + dbk
    dlin = jnp.where(in_win, dlin, NBD)          # out-of-window -> dropped

    X, Y, Z = DBX * V, DBY * V, DBZ * V

    def to_dense(rows, fill):
        d = jnp.full((NBD + 1, V3), fill, rows.dtype).at[dlin].set(
            rows, mode="drop")[:NBD]
        d = d.reshape(DBX, DBY, DBZ, V, V, V).transpose(0, 3, 1, 4, 2, 5)
        return d.reshape(X, Y, Z)

    def from_dense(d):
        rows = d.reshape(DBX, V, DBY, V, DBZ, V).transpose(
            0, 2, 4, 1, 3, 5).reshape(NBD, V3)
        pad = jnp.zeros((1, V3), d.dtype)
        return jnp.take(jnp.concatenate([rows, pad], axis=0),
                        jnp.minimum(dlin, NBD), axis=0)

    tsdf_full_src = (state.channels["TSDF"] if tsdf_src is None
                     else tsdf_src)
    obs_full_src = (state.channels["TSDF_observed"] > 0 if obs_src is None
                    else obs_src)
    tsdf = to_dense(tsdf_full_src, 0.0).astype(jnp.float32)
    obs = to_dense(obs_full_src & in_win[:, None], False)
    prev_e = to_dense(prev_esdf, 0.0)
    prev_f = to_dense(prev_fixed, jnp.int8(0))

    participate = obs
    fixed = participate & (jnp.abs(tsdf) < gamma)
    seed = jnp.where(fixed, tsdf, sign(tsdf) * max_ray)
    prev_ok = (jnp.sign(prev_e) == jnp.sign(seed)) & participate & \
        (prev_e != 0) & ~((prev_f > 0) & ~fixed)
    esdf0 = jnp.where(fixed, seed,
                      jnp.where(prev_ok,
                                jnp.clip(prev_e, -max_ray, max_ray), seed))
    esdf0 = jnp.where(participate, esdf0, 0.0)

    pos_side = participate & ~fixed & (tsdf >= 0)
    neg_side = participate & ~fixed & (tsdf < 0)
    pos_src = participate & (fixed | (tsdf >= gamma))
    neg_src = participate & (fixed | (tsdf <= -gamma))
    if dirty_blocks is not None:
        # freeze non-dirty in-window blocks (Dirichlet rim): they source
        # but never update. Window-block bool grid upscaled to voxels.
        wb = jnp.zeros((NBD + 1,), bool).at[dlin].set(anchor, mode="drop")
        upd = jnp.broadcast_to(
            wb[:NBD].reshape(DBX, DBY, DBZ)[:, None, :, None, :, None],
            (DBX, V, DBY, V, DBZ, V)).reshape(X, Y, Z)
        pos_side &= upd
        neg_side &= upd

    def body(carry):
        esdf, _, it = carry
        lo = jnp.where(pos_src, esdf, BIGF)
        hi = jnp.where(neg_src, esdf, -BIGF)
        fl, el, cl = _dense_extrema(lo, jnp.minimum, BIGF)
        fh, eh, ch = _dense_extrema(hi, jnp.maximum, -BIGF)
        cand_lo = jnp.minimum(jnp.minimum(fl + v1, el + v2), cl + v3c)
        cand_hi = jnp.maximum(jnp.maximum(fh - v1, eh - v2), ch - v3c)
        cand_lo = jnp.minimum(cand_lo, _dense_scan_candidates(
            lo, ~pos_src | fixed, v1, BIGF))
        cand_hi = jnp.maximum(cand_hi, -_dense_scan_candidates(
            -hi, ~neg_src | fixed, v1, BIGF))
        new = jnp.where(cand_lo <= esdf + eps,
                        jnp.minimum(esdf, cand_lo),
                        jnp.minimum(max_ray_f, cand_lo))
        new = jnp.where(pos_side, new, esdf)
        new_n = jnp.where(cand_hi >= esdf - eps,
                          jnp.maximum(esdf, cand_hi),
                          jnp.maximum(-max_ray_f, cand_hi))
        new = jnp.where(neg_side, new_n, new)
        changed = jnp.any(jnp.abs(new - esdf) > cfg.esdf_converge_eps)
        return new, changed, it + 1

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_sweeps)

    esdf_d, _, sweeps = jax.lax.while_loop(
        cond, body, (esdf0, jnp.bool_(True), jnp.int32(0)))

    esdf_rows = from_dense(esdf_d)
    fixed_rows = from_dense(fixed.astype(jnp.int8))
    part_rows = from_dense(participate)

    participate_full = obs_full_src & blk[:, None]
    keep = in_win[:, None] & part_rows
    if dirty_blocks is not None:
        keep &= anchor[:, None]        # frozen rim rows pass through
    esdf_out = jnp.where(keep, esdf_rows,
                         jnp.where(participate_full, prev_esdf, 0.0))
    fixed_out = jnp.where(keep, fixed_rows,
                          jnp.where(participate_full, prev_fixed,
                                    0).astype(jnp.int8))
    rowdiff = keep & (
        (jnp.abs(esdf_rows - prev_esdf) > cfg.esdf_converge_eps) |
        (fixed_rows != prev_fixed))
    row_changed = jnp.any(rowdiff, axis=1)
    changed_blocks = row_changed.at[-1].set(False)
    if dirty_blocks is not None:
        # boundary-shell re-queue, like the block mode: a dirty block whose
        # SHELL voxels changed wakes its 26-neighborhood next frame (the
        # shell is the neighbors' Dirichlet support). Dilation runs on the
        # dense window-block grid (6 shifted ORs), then maps back to slots.
        shell = jnp.asarray(_shell_mask_np(V))
        shell_row = jnp.any(rowdiff & shell[None, :], axis=1)
        wchg = jnp.zeros((NBD + 1,), bool).at[dlin].set(
            shell_row, mode="drop")[:NBD].reshape(DBX, DBY, DBZ)

        def dil(a, axis):
            lo = jnp.concatenate(
                [jax.lax.slice_in_dim(a, 1, a.shape[axis], axis=axis),
                 jnp.zeros_like(jax.lax.slice_in_dim(a, 0, 1, axis=axis))],
                axis=axis)
            hi = jnp.concatenate(
                [jnp.zeros_like(jax.lax.slice_in_dim(a, 0, 1, axis=axis)),
                 jax.lax.slice_in_dim(a, 0, a.shape[axis] - 1, axis=axis)],
                axis=axis)
            return a | lo | hi
        for ax in range(3):
            wchg = dil(wchg, ax)
        wake = jnp.take(wchg.reshape(-1),
                        jnp.minimum(dlin, NBD - 1)) & in_win
        changed_blocks = (changed_blocks | (blk & wake)).at[-1].set(False)
    return esdf_out, fixed_out, participate_full, sweeps, changed_blocks, \
        overflow


# kept for tests / debugging: the straightforward per-element formulation
def neighbor_table():
    dirs = [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
            for k in (-1, 0, 1) if (i, j, k) != (0, 0, 0)]
    d = np.asarray(dirs, np.int32)
    dist = np.linalg.norm(d, axis=-1).astype(np.float32)
    return jnp.asarray(d), jnp.asarray(dist)
