"""Voxblox-style TSDF integration, TPU-native.

Functional rebuild of the reference's fusion pipeline
(/root/reference/taichi_slam/mapping/dense_tsdf.py:157-270). The reference's
per-frame recipe is:

1. bin input points by sensor-local voxel (``process_point``,
   dense_tsdf.py:227-234) into a sparse "PCL" grid — its key perf trick (one
   ray per occupied voxel instead of one per pixel);
2. for every non-empty bin, ray-march from the sensor through the bin's mean
   point plus ``internal_voxels`` behind it, updating each touched voxel with
   the weighted-average TSDF rule ``TSDF ← (TSDF·W + w·d)/(W + w)``,
   ``W ← min(W + w, Wmax)`` (``process_new_pcl``, dense_tsdf.py:236-270).

The TPU rebuild replaces atomics and sparse structures with:

- **binning** = sort pixels by bin id + ``segment_sum`` (deterministic; the
  reference's f16 atomic accumulation is replaced by f32 sums);
- **ray march** = a dense ``(max_bins, max_steps)`` lattice of sample points
  with validity masks — static shapes, no data-dependent loops;
- **fusion** = one scatter-add of per-voxel ``Σ w·d`` and ``Σ w`` followed by
  a closed-form combine. Because the weighted-average update is associative,
  this is mathematically identical to the reference's sequential updates
  (modulo its racy update order and the Wmax clamp being applied once per
  frame instead of once per ray — both differences are bounded by fp
  tolerance and make the result *deterministic*, which the reference is not).

Reference quirk preserved: ``w_x_p`` receives the **unsigned** distance
``|p - x|`` (dense_tsdf.py:259-262), so the behind-surface linear drop-off
branch never fires and the weight is effectively ``1/z²`` along the whole
ray. We replicate the call exactly so SDF values stay comparable.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from taichislam_tpu.core.config import TSDFConfig
from taichislam_tpu.core import geometry
from taichislam_tpu.core.grid import (
    GridState,
    allocate_blocks,
    comp_flat_index,
    flat_voxel_index,
    lookup_slots,
    make_grid_state,
    scatter_add,
    scatter_max,
    voxel_to_block,
    voxel_to_block_c,
)

TSDF_CHANNELS = ("TSDF", "W_TSDF", "TSDF_observed", "occupy")


def make_tsdf_state(cfg: TSDFConfig) -> GridState:
    """Channel layout mirrors dense_tsdf.py:92-106 (TSDF, W_TSDF,
    TSDF_observed, occupy, optional color)."""
    dt = cfg.dtype
    defs = {
        "TSDF": (dt, ()),
        "W_TSDF": (dt, ()),
        "TSDF_observed": (jnp.int8, ()),
        "occupy": (jnp.int8, ()),
    }
    if cfg.texture_enabled:
        defs["color"] = (dt, (3,))
    return make_grid_state(cfg.grid, defs)


# ---------------------------------------------------------------------------
# weight model
# ---------------------------------------------------------------------------

def w_x_p(cfg: TSDFConfig, d, z):
    """Voxblox linear-drop-off weight (dense_tsdf.py:216-225).

    ``1/z²`` for d > -ε (ε = voxel), linear ramp on (-θ, -ε], 0 behind;
    θ = 4·voxel. NOTE: the reference calls this with unsigned d — see module
    docstring — so in practice only the first branch is live.
    """
    epi = cfg.voxel_scale
    theta = cfg.voxel_scale * 4.0
    inv_z2 = 1.0 / (z * z)
    ramp = (d + theta) * inv_z2 / (theta - epi)
    return jnp.where(d > -epi, inv_z2, jnp.where(d > -theta, ramp, 0.0))


# ---------------------------------------------------------------------------
# frame preprocessing: depth image -> gated sensor-frame points
# ---------------------------------------------------------------------------

def depth_to_points_c(cfg: TSDFConfig, depth_mm, texture, K_dep, K_color):
    """Strided unprojection with the reference's gating
    (dense_tsdf.py:188-214): drop zero depth, out-of-range depth; mm -> m.

    Returns ((x, y, z_cam) components, z (P,), color (P,3) or None,
    valid (P,)). Component arrays — a stacked (P, 3) output pads its minor
    dim 3 -> 128 lanes on TPU (measured ~0.5 ms/frame of padded HBM traffic
    at 640x480/step 2).
    """
    h, w = depth_mm.shape
    step = cfg.recast_step
    jj, ii = geometry.pixel_grid(h, w, step)
    jj, ii = jj.reshape(-1), ii.reshape(-1)
    # gather-free decimation (see geometry.strided_depth_f32)
    d_mm = geometry.strided_depth_f32(depth_mm, step)
    valid = (d_mm != 0) & (d_mm <= cfg.max_ray_length * 1000.0) & (
        d_mm >= cfg.min_ray_length * 1000.0)
    dep = d_mm / 1000.0
    fx, cx, fy, cy = K_dep[0], K_dep[2], K_dep[4], K_dep[5]
    px = (ii.astype(jnp.float32) - cx) * dep / fx
    py = (jj.astype(jnp.float32) - cy) * dep / fy
    color = None
    if cfg.texture_enabled:
        if cfg.color_same_proj:
            color = texture[:(h // step) * step:step,
                            :(w // step) * step:step, :].reshape(
                -1, 3).astype(jnp.float32)
        else:
            th, tw = texture.shape[0], texture.shape[1]
            cj, ci = geometry.color_ind_from_depth_pt(
                ii.astype(jnp.float32), jj.astype(jnp.float32),
                K_dep, K_color, tw, th)
            color = texture[cj, ci, :].astype(jnp.float32)
    return (px, py, dep), dep, color, valid


def depth_to_points(cfg: TSDFConfig, depth_mm, texture, K_dep, K_color):
    """Stacked-points wrapper over :func:`depth_to_points_c` (tools/tests).
    Returns (pts_cam (P, 3), z (P,), color (P, 3) or None, valid (P,))."""
    (px, py, pz), dep, color, valid = depth_to_points_c(
        cfg, depth_mm, texture, K_dep, K_color)
    return jnp.stack([px, py, pz], axis=-1), dep, color, valid


def pcl_to_points(cfg: TSDFConfig, xyz_array, rgb_array):
    """Point-cloud input path (dense_tsdf.py:168-186): points are rotated
    (not translated) into the map orientation by the caller; gate on range
    ``|R @ p| < max_ray_length``; z := |R @ p|."""
    pts = xyz_array.astype(jnp.float32)
    color = rgb_array.astype(jnp.float32) if cfg.texture_enabled else None
    return pts, color


# ---------------------------------------------------------------------------
# binning (the PCL grid analog)
# ---------------------------------------------------------------------------

class Bins(NamedTuple):
    count: jax.Array      # (max_bins,) f32
    sum_pos: jax.Array    # (max_bins, 3) f32  — sensor-centric positions
    sum_z: jax.Array      # (max_bins,) f32
    sum_color: jax.Array  # (max_bins, 3) f32 (zeros when texture disabled)
    valid: jax.Array      # (max_bins,) bool
    dropped: jax.Array    # () int32 — bins beyond max_bins (capacity miss)


def _use_pallas_bins(cfg: TSDFConfig) -> bool:
    """Gate for the Pallas per-bin segmented sums (same knob as the accum
    kernel; needs a 128-multiple bin bucket for the one-hot factoring)."""
    if cfg.pallas_accum == "off":
        return False
    if cfg.max_bins % 128 != 0:
        return False
    if cfg.pallas_accum == "on":
        return True
    return jax.default_backend() == "tpu"


def bin_points_c(cfg: TSDFConfig, px, py, pz, z, color, valid) -> Bins:
    """Deduplicate rays by sensor-local voxel (component-array form).

    Equivalent to ``process_point`` scatter-adds into the sparse PCL grid
    (dense_tsdf.py:227-234), built as one multi-operand ``lax.sort`` +
    segment-sums: deterministic and free of atomics. Points are
    sensor-centric, map-oriented (R @ p, no translation — matching the
    reference's bins). Component arrays keep every intermediate's minor dim
    lane-sized (a stacked (P, 3) layout pads 3 -> 128 lanes on TPU).
    """
    r = int(math.ceil(cfg.max_ray_length / cfg.voxel_scale)) + 1
    G = 2 * r + 1
    vi = geometry.round_half_away(px / cfg.voxel_scale).astype(jnp.int32)
    vj = geometry.round_half_away(py / cfg.voxel_scale).astype(jnp.int32)
    vk = geometry.round_half_away(pz / cfg.voxel_scale).astype(jnp.int32)
    inb = (jnp.abs(vi) <= r) & (jnp.abs(vj) <= r) & (jnp.abs(vk) <= r) & valid
    bin_id = ((vi + r) * G + (vj + r)) * G + (vk + r)
    bin_id = jnp.where(inb, bin_id, G * G * G)  # invalid sorts last

    ops = (bin_id, px, py, pz, z) + ((color[:, 0], color[:, 1], color[:, 2])
                                     if (cfg.texture_enabled and
                                         color is not None) else ())
    srt = jax.lax.sort(ops, num_keys=1)
    bid = srt[0]
    ok = bid < G * G * G

    head = ok & jnp.concatenate([jnp.array([True]), bid[1:] != bid[:-1]])
    rank = jnp.cumsum(head.astype(jnp.int32)) - 1
    total_bins = jnp.maximum(rank[-1] + 1, 0)

    B = cfg.max_bins
    ones = ok.astype(jnp.float32)
    nvals = 7 if (cfg.texture_enabled and color is not None) else 4

    if _use_pallas_bins(cfg):
        # per-bin sums through the sorted segmented-reduce MXU kernel
        # (ops/pallas/seg_accum.py) with ONE "block" of V3 = max_bins and
        # intra = bin rank: lanes are already in rank order (sorted by bin
        # id above; over-cap and invalid lanes have monotonically larger
        # keys), so the kernel's internal sort is skipped. Replaces the
        # searchsorted + per-value cumsum/differencing path, whose ~5
        # full-lattice prefix sums cost ~1.3 ms/frame at 640x480 on v5e
        # vs ~0.2 ms here.
        from taichislam_tpu.ops.pallas.seg_accum import (
            SENTINEL_BLOCK, segmented_block_reduce)
        lane_ok = ok & (rank < B)
        bkeyz = jnp.where(lane_ok, 0, SENTINEL_BLOCK)
        intra = jnp.where(lane_ok, rank, 0)
        vals = (ones, srt[1], srt[2], srt[3], srt[4]) + \
            (srt[5:8] if nvals == 7 else ())
        _, acc, _, _ = segmented_block_reduce(
            bkeyz, intra, vals, B, 1,
            interpret=(jax.default_backend() != "tpu"), presorted=True)
        count = acc[0, 0]
        sum_pos = jnp.stack([acc[0, 1], acc[0, 2], acc[0, 3]], axis=-1)
        sum_z = acc[0, 4]
        sum_color = (jnp.stack([acc[0, 5], acc[0, 6], acc[0, 7]], axis=-1)
                     if nvals == 7 else jnp.zeros((B, 3), jnp.float32))
        return Bins(count=count, sum_pos=sum_pos, sum_z=sum_z,
                    sum_color=sum_color, valid=count > 0,
                    dropped=jnp.maximum(total_bins - B, 0))

    # segmented sums WITHOUT scatters (segment_sum lowers to a ~10 ns/lane
    # scatter on TPU): prefix-sum each value, then difference the cumsum at
    # per-bin segment boundaries. Boundaries come from ONE searchsorted —
    # segments are contiguous so starts[b] == ends[b-1] — with
    # method="sort" (one merge-sort pass; the default binary search costs
    # ~log N rounds of B-sized gathers, ~1 ms at these shapes).
    rank_mono = jnp.where(ok, rank, B + total_bins + 1)
    bins_iota = jnp.arange(B, dtype=jnp.int32)
    ends = jnp.searchsorted(rank_mono, bins_iota + 1,
                            method="sort")  # exclusive
    starts = jnp.concatenate([jnp.zeros((1,), ends.dtype), ends[:-1]])

    def seg_sum(vals):
        cs = jnp.cumsum(vals * ones)
        end_v = jnp.take(cs, jnp.clip(ends - 1, 0, cs.shape[0] - 1))
        start_v = jnp.where(starts > 0,
                            jnp.take(cs, jnp.clip(starts - 1, 0,
                                                  cs.shape[0] - 1)), 0.0)
        return jnp.where(ends > starts, end_v - start_v, 0.0)

    count = seg_sum(jnp.ones_like(ones))
    sum_pos = jnp.stack([seg_sum(srt[1]), seg_sum(srt[2]), seg_sum(srt[3])],
                        axis=-1)
    sum_z = seg_sum(srt[4])
    if cfg.texture_enabled and color is not None:
        sum_color = jnp.stack([seg_sum(srt[5]), seg_sum(srt[6]),
                               seg_sum(srt[7])], axis=-1)
    else:
        sum_color = jnp.zeros((B, 3), jnp.float32)
    return Bins(
        count=count,
        sum_pos=sum_pos,
        sum_z=sum_z,
        sum_color=sum_color,
        valid=count > 0,
        dropped=jnp.maximum(total_bins - B, 0),
    )


def bin_points(cfg: TSDFConfig, pts_map, z, color, valid) -> Bins:
    """Stacked-points wrapper over :func:`bin_points_c`."""
    return bin_points_c(cfg, pts_map[:, 0], pts_map[:, 1], pts_map[:, 2],
                        z, color, valid)


# ---------------------------------------------------------------------------
# ray-march fusion
# ---------------------------------------------------------------------------

def _march_lattice_c(cfg: TSDFConfig, bins: Bins, T):
    """Sample points / voxel coords / weights for every (bin, step) pair,
    in component-array form, STEP-MAJOR: every lattice intermediate is
    (S, B) — the minor dim is the (lane-sized, 128-aligned) bin bucket, so
    nothing pads; the bin-major (B, S=60) layout padded 60 -> 128 lanes
    (2.1x HBM traffic on ~20 intermediates). Downstream consumers only see
    flat reshapes feeding an order-independent sort, so the transposed
    order is free.

    Vectorizes ``process_new_pcl`` (dense_tsdf.py:236-270): step j covers
    distance (j+1)·voxel along the mean-bin direction; the number of live
    steps is ``floor(min(len/voxel + internal_voxels, max_ray/voxel))``.
    """
    S = cfg.max_ray_steps
    c = jnp.maximum(bins.count, 1.0)
    p0 = bins.sum_pos[:, 0] / c
    p1 = bins.sum_pos[:, 1] / c
    p2 = bins.sum_pos[:, 2] / c
    length = jnp.sqrt(p0 * p0 + p1 * p1 + p2 * p2)
    inv_len = 1.0 / jnp.maximum(length, 1e-12)
    d0, d1, d2 = p0 * inv_len, p1 * inv_len, p2 * inv_len
    e0, e1, e2 = p0 + T[0], p1 + T[1], p2 + T[2]   # pos_p (endpoint)
    z = bins.sum_z / c

    n_steps = jnp.floor(jnp.minimum(
        length / cfg.voxel_scale + cfg.internal_voxels,
        cfg.max_ray_length / cfg.voxel_scale)).astype(jnp.int32)

    step_dist = (jnp.arange(S, dtype=jnp.float32) + 1.0) * cfg.voxel_scale
    x0 = d0[None, :] * step_dist[:, None] + T[0]   # (S, B)
    x1 = d1[None, :] * step_dist[:, None] + T[1]
    x2 = d2[None, :] * step_dist[:, None] + T[2]
    live = (jnp.arange(S)[:, None] < n_steps[None, :]) & bins.valid[None, :]

    v0 = e0[None, :] - x0
    v1 = e1[None, :] - x1
    v2 = e2[None, :] - x2
    d_x_p = jnp.sqrt(v0 * v0 + v1 * v1 + v2 * v2)
    dot = v0 * p0[None, :] + v1 * p1[None, :] + v2 * p2[None, :]
    d_signed = d_x_p * geometry.sign(dot)
    w = w_x_p(cfg, d_x_p, z[None, :])  # unsigned distance — reference quirk
    w = jnp.where(live, w, 0.0)
    return ((x0, x1, x2), live, d_signed, w, (e0, e1, e2), z)


def _march_lattice(cfg: TSDFConfig, bins: Bins, T):
    """Stacked-array wrapper over :func:`_march_lattice_c` (tests/tools)."""
    (x0, x1, x2), live, ds, w, (e0, e1, e2), z = _march_lattice_c(cfg, bins,
                                                                  T)
    x = jnp.stack([x0, x1, x2], axis=-1)
    pos_p = jnp.stack([e0, e1, e2], axis=-1)
    return x, live, ds, w, pos_p, z


def _use_pallas_accum(cfg: TSDFConfig) -> bool:
    """Gate for the Pallas sorted segmented-reduce accumulation. Textured
    integration runs through it too (color as 3 extra reduction values,
    per-frame weighted mean — see the deviation note in `integrate`)."""
    if cfg.pallas_accum == "off":
        return False
    from taichislam_tpu.ops.pallas.seg_accum import SENTINEL_BLOCK
    spec = cfg.grid
    if spec.voxels_per_block % 128 != 0:
        return False  # kernel tiles factor the voxel index as hi*128 + lo
    if spec.blocks_per_submap >= SENTINEL_BLOCK:
        return False
    if cfg.pallas_accum == "on":
        return True
    return jax.default_backend() == "tpu"


@partial(jax.jit, static_argnums=(0,))
def integrate(cfg: TSDFConfig, state: GridState, bins_pts, z, color, valid,
              T, active_submap):
    """Fuse one frame of (already rotated, sensor-centric) points.

    ``bins_pts`` = (px, py, pz) component arrays of R @ p_cam for each input
    point; ``T`` is the sensor position in the (submap) map frame; the
    caller performs the world→submap conversion exactly as
    ``BaseMap.set_pose`` does. Returns (state, stats dict).
    """
    bins = bin_points_c(cfg, bins_pts[0], bins_pts[1], bins_pts[2], z,
                        color, valid)
    (x0, x1, x2), live, d_signed, w, (e0, e1, e2), zb = \
        _march_lattice_c(cfg, bins, T)
    spec = cfg.grid

    # voxel coords for all marched samples + bin endpoints (components —
    # stacked (..., 3) arrays pad the minor dim 3 -> 128 lanes on TPU)
    rha = geometry.round_half_away
    inv_v = 1.0 / cfg.voxel_scale
    blin_m, intra_m, inb_m = voxel_to_block_c(
        spec, active_submap, rha(x0 * inv_v).astype(jnp.int32),
        rha(x1 * inv_v).astype(jnp.int32),
        rha(x2 * inv_v).astype(jnp.int32))
    blin_e, intra_e, inb_e = voxel_to_block_c(
        spec, active_submap, rha(e0 * inv_v).astype(jnp.int32),
        rha(e1 * inv_v).astype(jnp.int32),
        rha(e2 * inv_v).astype(jnp.int32))

    if _use_pallas_accum(cfg):
        # marched blocks are allocated from the kernel's compact touched
        # list below; only the (bins-sized) endpoint set is allocated here
        state = allocate_blocks(spec, state, blin_e.reshape(-1),
                                (bins.valid & inb_e).reshape(-1),
                                active_submap)
    else:
        cand = jnp.concatenate([blin_m.reshape(-1), blin_e.reshape(-1)])
        cand_ok = jnp.concatenate([
            (live & inb_m).reshape(-1), (bins.valid & inb_e).reshape(-1)])
        state = allocate_blocks(spec, state, cand, cand_ok, active_submap)

    mask_m = (live & inb_m).reshape(-1)
    garbage = (spec.max_blocks + 1) * spec.voxels_per_block - 1
    wf_raw = jnp.where(mask_m, w.reshape(-1), 0.0)
    wdf_raw = wf_raw * d_signed.reshape(-1)
    nvox = (spec.max_blocks + 1) * spec.voxels_per_block
    ch = dict(state.channels)
    touched_dropped = jnp.int32(0)
    lanes_dropped = jnp.int32(0)
    live_lanes = jnp.int32(0)

    if cfg.texture_enabled:
        c = jnp.maximum(bins.count, 1.0)
        bin_rgb = bins.sum_color / c[:, None] / 255.0  # dense_tsdf.py:268-269
        # per-lane bin color, componentwise (a (N, 3) stack pads 3 -> 128)
        # lattice is step-major (S, B): per-bin color broadcasts over steps
        rgb_m = [jnp.where(mask_m, jnp.broadcast_to(
            bin_rgb[None, :, a], live.shape).reshape(-1), 0.0)
            for a in range(3)]

    if _use_pallas_accum(cfg):
        # Pallas path: sort lanes by (block, intra) key and segmented-reduce
        # in VMEM — one tile write per touched block instead of one scatter
        # transaction per lane (2.7x faster on v5e; see ops/pallas/seg_accum)
        from taichislam_tpu.ops.pallas.seg_accum import (
            SENTINEL_BLOCK, segmented_block_reduce)
        V3 = spec.voxels_per_block
        lo = active_submap.astype(jnp.int32) * spec.blocks_per_submap
        rel = blin_m.reshape(-1) - lo
        lane_ok = mask_m & (rel >= 0) & (rel < spec.blocks_per_submap)
        bkey = jnp.where(lane_ok, rel, SENTINEL_BLOCK)
        intra_k = jnp.where(lane_ok, intra_m.reshape(-1), 0)
        vals = (wf_raw, wdf_raw)
        if cfg.texture_enabled:
            # color as 3 extra reduction values: per-frame Σw·c, combined
            # to a weighted mean below. DEVIATION from the reference's
            # per-lane scatter-set (dense_tsdf.py:268), whose "last writer"
            # is whichever atomic lands last — nondeterministic; the
            # weighted mean is deterministic and at least as faithful.
            vals = vals + tuple(wf_raw * rgb_m[a] for a in range(3))
        # vals_f16: value pairs ride the lane sort as single u32 operands
        # (~5e-4 relative each — below the reference's own f16 field
        # quantization); accumulation stays exact f32 in the kernel
        touched_rel, acc, n_touched, lanes_dropped = segmented_block_reduce(
            bkey, intra_k, vals, V3, cfg.max_touched_blocks,
            interpret=(jax.default_backend() != "tpu"),
            lane_cap=(cfg.max_march_lanes or None),
            max_bkey=spec.blocks_per_submap, vals_f16=True)
        live_lanes = jnp.sum(lane_ok.astype(jnp.int32))
        touched_dropped = jnp.maximum(n_touched - cfg.max_touched_blocks, 0)

        row_ok = touched_rel >= 0
        cand_blin = jnp.where(row_ok, lo + touched_rel, -1)
        state = allocate_blocks(spec, state, cand_blin, row_ok, active_submap)
        slots = lookup_slots(spec, state.table, cand_blin)

        w_sum_t = jnp.where(row_ok[:, None], acc[:, 0, :], 0.0)
        wd_sum_t = jnp.where(row_ok[:, None], acc[:, 1, :], 0.0)
        D_rows = jnp.take(ch["TSDF"].reshape(-1, V3), slots,
                          axis=0).astype(jnp.float32)
        W_rows = jnp.take(ch["W_TSDF"].reshape(-1, V3), slots,
                          axis=0).astype(jnp.float32)
        touched_v = w_sum_t > 0
        new_D = jnp.where(touched_v,
                          (D_rows * W_rows + wd_sum_t) / (W_rows + w_sum_t),
                          D_rows)
        new_W = jnp.where(touched_v,
                          jnp.minimum(W_rows + w_sum_t, cfg.w_max), W_rows)
        tgt = jnp.where(row_ok, slots, spec.max_blocks)
        ch["TSDF"] = ch["TSDF"].reshape(-1, V3).at[tgt].set(
            new_D.astype(cfg.dtype), mode="drop").reshape(ch["TSDF"].shape)
        ch["W_TSDF"] = ch["W_TSDF"].reshape(-1, V3).at[tgt].set(
            new_W.astype(cfg.dtype), mode="drop").reshape(ch["W_TSDF"].shape)
        obs_rows = jnp.take(ch["TSDF_observed"].reshape(-1, V3), slots,
                            axis=0)
        ch["TSDF_observed"] = ch["TSDF_observed"].reshape(-1, V3).at[tgt].set(
            jnp.maximum(obs_rows, touched_v.astype(jnp.int8)),
            mode="drop").reshape(ch["TSDF_observed"].shape)
        touched_blocks = jnp.zeros((spec.max_blocks + 1,), bool).at[tgt].max(
            jnp.any(touched_v, axis=1), mode="drop").at[-1].set(False)
        if cfg.texture_enabled:
            col2 = ch["color"].reshape(-1, V3)     # rows = slot * 3 + comp
            w_den = jnp.maximum(w_sum_t, 1e-20)
            for a in range(3):
                wc = jnp.where(row_ok[:, None], acc[:, 2 + a, :], 0.0)
                rows_a = jnp.take(col2, slots * 3 + a,
                                  axis=0).astype(jnp.float32)
                new_C = jnp.where(touched_v, wc / w_den, rows_a)
                tgt_a = jnp.where(row_ok, slots * 3 + a, col2.shape[0])
                col2 = col2.at[tgt_a].set(new_C.astype(cfg.dtype),
                                          mode="drop")
            ch["color"] = col2.reshape(ch["color"].shape)
    else:
        slots_m = lookup_slots(spec, state.table, blin_m.reshape(-1))
        flat_m = flat_voxel_index(spec, slots_m, intra_m.reshape(-1))
        flat_m = jnp.where(mask_m, flat_m, garbage)
        wf = wf_raw
        wdf = wdf_raw

        # TWO FLAT scatters for Σw and Σw·d. Measured on the v5e: a flat
        # (N,) scatter-add costs ~10 ns/update while a windowed (N, 2)
        # scatter costs ~85 ns/update — never fuse scatter columns.
        w_sum = jnp.zeros((nvox,), jnp.float32).at[flat_m].add(wf)
        wd_sum = jnp.zeros((nvox,), jnp.float32).at[flat_m].add(wdf)

        D = ch["TSDF"].reshape(nvox).astype(jnp.float32)
        W = ch["W_TSDF"].reshape(nvox).astype(jnp.float32)
        touched = w_sum > 0
        new_D = jnp.where(touched, (D * W + wd_sum) / (W + w_sum), D)
        new_W = jnp.where(touched, jnp.minimum(W + w_sum, cfg.w_max), W)
        ch["TSDF"] = new_D.astype(cfg.dtype).reshape(ch["TSDF"].shape)
        ch["W_TSDF"] = new_W.astype(cfg.dtype).reshape(ch["W_TSDF"].shape)

        # observed flag on every marched voxel (dense_tsdf.py:265). All live
        # lanes carry w > 0 (the 1/z² weight), so `touched` IS the marched
        # set — no separate scatter needed.
        obs = ch["TSDF_observed"].reshape(nvox)
        ch["TSDF_observed"] = jnp.maximum(
            obs, touched.astype(jnp.int8)).reshape(ch["TSDF_observed"].shape)
        touched_blocks = jnp.any(
            touched.reshape(-1, spec.voxels_per_block),
            axis=1).at[-1].set(False)
        if cfg.texture_enabled:
            # per-lane color scatter-set, componentwise (dense_tsdf.py:268;
            # lane order decides ties like the reference's atomics do)
            colf = ch["color"].reshape(-1)
            intra_f = intra_m.reshape(-1)
            for a in range(3):
                idx = comp_flat_index(spec, slots_m, intra_f, a)
                idx = jnp.where(mask_m, idx, colf.shape[0])
                colf = colf.at[idx].set(
                    rgb_m[a].astype(cfg.dtype), mode="drop")
            ch["color"] = colf.reshape(ch["color"].shape)

    # endpoint occupancy (dense_tsdf.py:248)
    slots_e = lookup_slots(spec, state.table, blin_e)
    flat_e = flat_voxel_index(spec, slots_e, intra_e)
    flat_e = jnp.where(bins.valid & inb_e, flat_e, garbage)
    ch["occupy"] = scatter_max(ch["occupy"], flat_e,
                               jnp.ones(flat_e.shape, jnp.int8))

    # keep the garbage row clean so exports/meshing never see absorbed writes
    for k in ch:
        ch[k] = ch[k].at[-1].set(jnp.zeros_like(ch[k][-1]))

    stats = {"bins_dropped": bins.dropped,
             "num_bins": jnp.sum(bins.valid.astype(jnp.int32)),
             "alloc_overflow": state.alloc_overflow,
             "touched_dropped": touched_dropped,
             "lanes_dropped": lanes_dropped,
             "live_lanes": live_lanes,
             # per-slot bitmap of blocks whose TSDF changed this frame —
             # feeds the incremental ESDF's dirty-block working set
             "touched_blocks": touched_blocks}
    return state._replace(channels=ch), stats


@partial(jax.jit, static_argnums=(0,))
def integrate_depth(cfg: TSDFConfig, state: GridState, depth_mm, texture,
                    R, T, K_dep, K_color, active_submap):
    """recast_depth_to_map equivalent (dense_tsdf.py:162-165, 188-214)."""
    (px, py, pz), dep, color, valid = depth_to_points_c(
        cfg, depth_mm, texture, K_dep, K_color)
    # rotate componentwise (a stacked (P, 3) matmul pads 3 -> 128 lanes)
    m0 = R[0, 0] * px + R[0, 1] * py + R[0, 2] * pz
    m1 = R[1, 0] * px + R[1, 1] * py + R[1, 2] * pz
    m2 = R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz
    return integrate(cfg, state, (m0, m1, m2), dep, color, valid, T,
                     active_submap)


@partial(jax.jit, static_argnums=(0,))
def integrate_pcl(cfg: TSDFConfig, state: GridState, xyz, rgb, R, T,
                  active_submap):
    """recast_pcl_to_map equivalent (dense_tsdf.py:157-186): points are
    rotated only; gating is ``|R @ p| < max_ray_length``; z = |R @ p|."""
    pts, color = pcl_to_points(cfg, xyz, rgb)
    px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
    m0 = R[0, 0] * px + R[0, 1] * py + R[0, 2] * pz
    m1 = R[1, 0] * px + R[1, 1] * py + R[1, 2] * pz
    m2 = R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz
    z = jnp.sqrt(m0 * m0 + m1 * m1 + m2 * m2)
    valid = z < cfg.max_ray_length
    return integrate(cfg, state, (m0, m1, m2), z, color, valid, T,
                     active_submap)


# ---------------------------------------------------------------------------
# analytic fixture
# ---------------------------------------------------------------------------

def init_sphere(cfg: TSDFConfig, state: GridState, active_submap=0,
                voxels: int = 30, radius: float = None) -> GridState:
    """Analytic sphere SDF fixture for mesher tests.

    The reference's ``init_sphere`` (dense_tsdf.py:136-146) predates the
    centered-index convention (it writes at N/2±15 with 3-D indices on a 4-D
    field); ours writes the same sphere — ``TSDF = |p| - 3·voxel`` over a
    ``voxels³`` cube — centered at the origin of the current convention.
    """
    if radius is None:
        radius = cfg.voxel_scale * 3
    half = voxels // 2
    r = jnp.arange(-half, half)
    ii, jj, kk = jnp.meshgrid(r, r, r, indexing="ij")
    ijk = jnp.stack([ii, jj, kk], axis=-1).reshape(-1, 3).astype(jnp.int32)
    p = geometry.ijk_to_xyz(ijk, cfg.voxel_scale)
    tsdf = jnp.linalg.norm(p, axis=-1) - radius

    spec = cfg.grid
    s = jnp.full((ijk.shape[0],), active_submap, jnp.int32)
    blin, intra, inb = voxel_to_block(spec, s, ijk)
    state = allocate_blocks(spec, state, blin, inb,
                            jnp.asarray(active_submap, jnp.int32))
    slots = lookup_slots(spec, state.table, blin)
    flat = flat_voxel_index(spec, slots, intra)
    ch = dict(state.channels)
    nvox = (spec.max_blocks + 1) * spec.voxels_per_block
    ch["TSDF"] = ch["TSDF"].reshape(nvox).at[flat].set(
        tsdf.astype(cfg.dtype), mode="drop").reshape(ch["TSDF"].shape)
    ch["TSDF_observed"] = ch["TSDF_observed"].reshape(nvox).at[flat].set(
        1, mode="drop").reshape(ch["TSDF_observed"].shape)
    if cfg.texture_enabled:
        from taichislam_tpu.core.colormap import color_from_colormap
        col = color_from_colormap(p[:, 2], -radius, radius)
        colf = ch["color"].reshape(-1)
        for a in range(3):
            colf = colf.at[comp_flat_index(spec, slots, intra, a)].set(
                col[:, a].astype(cfg.dtype), mode="drop")
        ch["color"] = colf.reshape(ch["color"].shape)
    for k in ch:
        ch[k] = ch[k].at[-1].set(jnp.zeros_like(ch[k][-1]))
    return state._replace(channels=ch)
