"""Pallas TPU kernel: sorted segmented block accumulation.

The voxel-grid hot loops (TSDF ray-march fusion, submap splat fusion) must
accumulate per-voxel sums from 10^5–10^6 scattered lanes. XLA's scatter costs
~10 ns per lane on the v5e (masked lanes included), which caps fusion at
~50 fps. This kernel replaces the scatters: lanes are first sorted by block
key (TPU multi-operand sorts are cheap, ~0.5 ms for 500k), then a
**sequential-grid Pallas kernel** streams the sorted lanes chunk by chunk,
accumulating each block's contributions into a VMEM-resident tile and
DMA-flushing the finished tile to a compact per-touched-block output — so
HBM sees one tile write per touched block instead of one transaction per
lane.

The per-row accumulation factors the intra-voxel index as
``hi * 128 + lo`` and computes the outer product
``(onehot_hi · value)ᵀ @ onehot_lo`` on the MXU with HIGHEST precision
(exact for f32 inputs; the bf16 default silently loses ~0.2%).

Outputs are compact: the list of touched block keys (ascending) and an f32
accumulator tile (n_vals, V³) per touched block. The caller allocates blocks
from the touched list and combines tiles into the channel arrays with
block-granular (DMA-friendly) gathers/scatters.

Constraints: V³ % 128 == 0; block keys < SENTINEL_BLOCK (2^24); invalid
lanes carry bkey = SENTINEL_BLOCK so they sort last.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENTINEL_BLOCK = 2 ** 24   # invalid-lane block key; sorts last
# retained for callers/tests that pack keys as bkey * V3 + intra
SENTINEL_KEY = 2 ** 30


def _kernel(bkey_ref, intra_ref, *rest, V3: int, rows: int, n_vals: int,
            max_touched: int):
    val_refs = rest[:n_vals]
    touched_ref, acc_ref, count_ref, tile, cur_blk, tile_idx, sem = \
        rest[n_vals:]

    step = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init():
        cur_blk[0] = jnp.int32(-1)
        tile_idx[0] = jnp.int32(0)
        count_ref[0] = jnp.int32(0)
        tile[...] = jnp.zeros_like(tile)

    bkey = bkey_ref[0]                     # (rows, 128)
    intra = intra_ref[0]
    HI = V3 // 128
    hi = intra // 128
    lo = intra - hi * 128
    vals = [v[0] for v in val_refs]
    valid = bkey < SENTINEL_BLOCK

    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (128, HI), 1)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)

    # one-hot factors and value scalings are SEGMENT-INDEPENDENT: build
    # them once per chunk, stacked along the CONTRACTION (sublane) axis so
    # the whole chunk is ONE (rows·128)-deep MXU matmul per segment — the
    # per-row form (rows separate 128-deep matmuls) is issue-latency bound.
    # The row data transposes lanes->sublanes ONCE per chunk; per-row
    # ``x[r][:, None]`` column vectors would each be their own relayout
    # (16 rows x 3 arrays of them dominated the kernel at ~5.5 us/chunk).
    valid_f = jnp.where(valid, 1.0, 0.0)
    hiT = hi.T                                   # (128, rows)
    loT = lo.T
    valTs = [vals[v].T for v in range(n_vals)]
    B_cat = jnp.concatenate(
        [jnp.where(iota_lo == loT[:, r:r + 1], 1.0, 0.0)
         for r in range(rows)], axis=0)          # (rows*128, 128)
    bkeyT = bkey.T                               # (128, rows)
    validT_f = valid_f.T

    def flush():
        idx = tile_idx[0]

        @pl.when((cur_blk[0] >= 0) & (idx < max_touched))
        def _do():
            copy = pltpu.make_async_copy(tile, acc_ref.at[idx], sem)
            copy.start()
            copy.wait()
            touched_ref[idx] = cur_blk[0]

        @pl.when(cur_blk[0] >= 0)
        def _count():
            tile_idx[0] = idx + 1

    def body(last_done):
        sel_lanes = valid & (bkey > last_done)
        cur = jnp.min(jnp.where(sel_lanes, bkey, SENTINEL_BLOCK))

        @pl.when(cur != cur_blk[0])
        def _new_block():
            flush()
            tile[...] = jnp.zeros_like(tile)
            cur_blk[0] = cur

        # f32 mask arithmetic: Mosaic cannot minor-dim-broadcast i1 vectors.
        # The segment mask folds into the value scaling of the hi one-hot;
        # each concat piece is an offset-0 `where` result (concatenating
        # strided lane-slices directly is not lowerable).
        in_seg_fT = jnp.where(bkeyT == cur, validT_f, 0.0)   # (128, rows)
        valTs_m = [valTs[v] * in_seg_fT for v in range(n_vals)]
        A_seg = jnp.concatenate(
            [jnp.concatenate(
                [jnp.where(iota_hi == hiT[:, r:r + 1],
                           valTs_m[v][:, r:r + 1], 0.0)
                 for v in range(n_vals)], axis=1)
             for r in range(rows)], axis=0)      # (rows*128, n_vals*HI)
        a = jnp.dot(A_seg.T, B_cat,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        HI_ = V3 // 128
        for v in range(n_vals):
            tile[v] = tile[v] + a[v * HI_:(v + 1) * HI_]
        return cur

    def cond(last_done):
        return jnp.any(valid & (bkey > last_done))

    jax.lax.while_loop(cond, body, jnp.int32(-1))

    @pl.when(step == nsteps - 1)
    def _finish():
        flush()
        cur_blk[0] = jnp.int32(-1)
        count_ref[0] = tile_idx[0]


def _f16_bits(x):
    return jax.lax.bitcast_convert_type(
        x.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)


def _from_f16_bits(u):
    return jax.lax.bitcast_convert_type(
        u.astype(jnp.uint16), jnp.float16).astype(jnp.float32)


def segmented_block_reduce(bkey, intra, vals, V3: int, max_touched: int,
                           rows: int = 16, interpret: bool = False,
                           lane_cap: int | None = None,
                           max_bkey: int | None = None,
                           presorted: bool = False,
                           vals_f16: bool = False):
    """Sort lanes by block key and accumulate per-block (n_vals, V3) tiles.

    Args:
        bkey: (N,) int32 block keys (< SENTINEL_BLOCK; SENTINEL_BLOCK for
            invalid lanes).
        intra: (N,) int32 intra-block voxel index in [0, V3).
        vals: tuple of (N,) f32 lane values.
        lane_cap: optional static cap on post-sort lanes fed to the kernel.
            The sort moves all VALID lanes to the front, so slicing at
            ``lane_cap >= n_valid`` is lossless while the kernel skips the
            dead-lane tail (~30-50% of a march lattice). Dropped VALID
            lanes (cap too small) are counted in the returned
            ``lanes_dropped`` so callers can grow the cap / assert zero.
        max_bkey: optional static bound on valid block keys. When
            ``max_bkey * V3 < SENTINEL_KEY`` the sort runs on a PACKED
            ``bkey * V3 + intra`` key (one i32 operand instead of two —
            the multi-operand sort's cost scales with total bytes moved)
            and unpacks afterwards with two cheap elementwise passes.
    Returns (touched (max_touched,) int32 block keys (-1 padded),
             acc (max_touched, n_vals, V3) f32, n_touched — may exceed
             max_touched on overflow; overflowed tiles are dropped,
             lanes_dropped).
    """
    assert V3 % 128 == 0, V3
    n_vals = len(vals)
    chunk = rows * 128
    pad = (-bkey.shape[0]) % chunk
    if pad:
        bkey = jnp.pad(bkey, (0, pad), constant_values=SENTINEL_BLOCK)
        intra = jnp.pad(intra, (0, pad))
        vals = tuple(jnp.pad(v, (0, pad)) for v in vals)
    N = bkey.shape[0]
    packed = (not presorted and
              max_bkey is not None and max_bkey * V3 < SENTINEL_KEY)
    # f16-pack value PAIRS into single u32 sort operands: the
    # multi-operand sort's cost scales with total bytes, so 2 f32 values
    # ride as one u32 at f16 precision (~5e-4 relative on each — below
    # the f16 channel storage quantization the reference itself uses)
    f16_pairs = vals_f16 and not presorted and len(vals) >= 2
    if f16_pairs:
        pv = tuple(_f16_bits(vals[i]) | (_f16_bits(vals[i + 1]) << 16)
                   for i in range(0, len(vals) - 1, 2))
        if len(vals) % 2:
            pv = pv + (vals[-1],)
        vals_in = pv
    else:
        vals_in = tuple(vals)
    if presorted:
        # caller guarantees lanes already ordered by (bkey, intra) with
        # invalid lanes (bkey == SENTINEL_BLOCK) last — e.g. the binning
        # path, whose rank keys are nondecreasing by construction
        srt = (bkey, intra) + vals_in
    elif packed:
        pk = jnp.where(bkey < SENTINEL_BLOCK, bkey * V3 + intra,
                       SENTINEL_KEY)
        srt = jax.lax.sort((pk,) + vals_in, num_keys=1)
    else:
        srt = jax.lax.sort((bkey, intra) + vals_in, num_keys=1)
    lanes_dropped = jnp.int32(0)
    if lane_cap is not None and lane_cap < N:
        lane_cap = max((lane_cap + chunk - 1) // chunk * chunk, chunk)
        if lane_cap < N:
            n_valid = jnp.sum((bkey < SENTINEL_BLOCK).astype(jnp.int32))
            lanes_dropped = jnp.maximum(n_valid - lane_cap, 0)
            srt = tuple(a[:lane_cap] for a in srt)
            N = lane_cap
    if packed:
        pk_s = srt[0]
        bk_s = pk_s // V3
        invalid_s = pk_s >= SENTINEL_KEY
        srt = (jnp.where(invalid_s, SENTINEL_BLOCK, bk_s),
               jnp.where(invalid_s, 0, pk_s - bk_s * V3)) + srt[1:]
    if f16_pairs:
        vi = srt[2:]
        out_vals, k = [], 0
        for i in range(0, len(vals) - 1, 2):
            u = vi[k]
            k += 1
            out_vals.append(_from_f16_bits(u & jnp.uint32(0xFFFF)))
            out_vals.append(_from_f16_bits(u >> 16))
        if len(vals) % 2:
            out_vals.append(vi[k])
        srt = srt[:2] + tuple(out_vals)
    ops = [a.reshape(-1, rows, 128) for a in srt]

    grid = (N // chunk,)
    kern = functools.partial(_kernel, V3=V3, rows=rows, n_vals=n_vals,
                             max_touched=max_touched)
    spec = pl.BlockSpec((1, rows, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    touched, acc, count = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[spec] * (2 + n_vals),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((max_touched,), jnp.int32),
            jax.ShapeDtypeStruct((max_touched, n_vals, V3 // 128, 128),
                                 jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_vals, V3 // 128, 128), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*ops)
    touched_keys = jnp.where(
        jnp.arange(max_touched) < jnp.minimum(count[0], max_touched),
        touched, -1)
    return (touched_keys, acc.reshape(max_touched, n_vals, V3), count[0],
            lanes_dropped)


def segmented_block_accumulate(keys, w, wd, V3: int, max_touched: int,
                               chunk: int = 4096, interpret: bool = False):
    """Back-compat wrapper over packed keys (``bkey * V3 + intra``;
    ``SENTINEL_KEY`` for invalid lanes)."""
    invalid = keys >= SENTINEL_KEY
    bk = keys // V3
    bkey = jnp.where(invalid, SENTINEL_BLOCK, bk)
    intra = jnp.where(invalid, 0, keys - bk * V3)
    return segmented_block_reduce(bkey, intra, (w, wd), V3, max_touched,
                                  rows=chunk // 128,
                                  interpret=interpret)[:3]
