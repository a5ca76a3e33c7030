"""Pallas TPU kernel: one fused ESDF relaxation sweep.

The XLA formulation of a sweep (ops/esdf.py body: source masking, class-wise
26-stencil extrema, segmented min-plus axis scans, support check) lowers to
~40-180 separate elementwise passes over the (cap+1, W, W²) sweep-layout
state — ~0.5-1 GB of HBM traffic per sweep for a 6 MB field, i.e. the sweep
is pure bandwidth waste. This kernel computes the whole sweep body in ONE
pass: each grid step loads an 8-row slab of the field plus its static
source/side/fixed masks into VMEM, evaluates every stencil shift and scan
step on-chip (`pltpu.roll` + iota edge masks), and writes the updated slab
once. HBM traffic per sweep drops to ~reading the field + masks + writing
the field (~20 MB), a ~25x reduction; the cross-block halo exchange stays
outside (ops/esdf.py _assemble_sweep — 6 DMA-class row gathers).

Unlike the XLA path (which runs the expensive multi-hop scans only on the
first sweep), the fused kernel includes the scans in EVERY sweep — on-chip
they cost VPU cycles, not bandwidth — so each sweep moves information a
whole block-row instead of one voxel and the budget can be smaller.

Numerical semantics match the XLA body exactly (same shift orientations,
fills, support-check thresholds); tests/test_esdf.py::test_pallas_sweep_
matches_xla asserts bit-level agreement on random fields.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9
# participation encoding: enc = TSDF where observed-and-active, +ENC_BIG
# otherwise — one f32 channel carries what used to be separate TSDF and
# observed inputs (ENC_BIG is far outside any real TSDF, which is bounded
# by max_ray)
ENC_BIG = 1e6


def _kernel(esdf_ref, enc_ref, side_ref, act_ref, out_ref, *,
            W: int, R: int, v1: float, gamma: float, eps: float,
            max_ray: float, with_scans: bool):
    # per-slab activity gate (ops/esdf.py): a slab computes only if some
    # of its rows might still change — updatable AND (self or a neighbor
    # changed last sweep). Frozen-rim slabs and already-converged regions
    # are Dirichlet/steady pass-throughs; recomputing them is wasted VPU
    # work and skipping them is EXACT (their inputs are unchanged).
    step = pl.program_id(0)

    @pl.when(act_ref[step] == 0)
    def _copy():
        out_ref[...] = esdf_ref[...]

    @pl.when(act_ref[step] != 0)
    def _compute():
        _sweep_body(esdf_ref, enc_ref, side_ref, out_ref, W=W, R=R, v1=v1,
                    gamma=gamma, eps=eps, max_ray=max_ray,
                    with_scans=with_scans)


def _sweep_body(esdf_ref, enc_ref, side_ref, out_ref, *,
                W: int, R: int, v1: float, gamma: float, eps: float,
                max_ray: float, with_scans: bool):
    h = esdf_ref[...]                       # (R, W, L) f32
    enc = enc_ref[...]                      # (R, W, L) f32, halo-assembled
    side_f = side_ref[...].astype(jnp.float32)  # +1 pos side, -1 neg side
    out_ref[...] = _sweep_math(h, enc, side_f, W=W, v1=v1, gamma=gamma,
                               eps=eps, max_ray=max_ray,
                               with_scans=with_scans)


def _sweep_math(h, enc, side_f, *, W: int, v1: float, gamma: float,
                eps: float, max_ray: float, with_scans: bool):
    """One relaxation-sweep update of a slab: pure array math shared by the
    single-sweep kernel and the fused loop kernel (esdf_sweep_loop_pallas).
    ``h``/``enc`` are (R, W, W²) with halos assembled; ``side_f`` is the
    ±1/0 interior update-side mask as f32."""
    R = h.shape[0]
    L = W * W
    # masks stay f32 0/1 arithmetic: i8 tiles are (32, 128) vs f32 (8, 128),
    # and comparisons across the two layouts produce i1 vectors Mosaic
    # cannot relayout ("(0,0)" -> replicated). Source/fixed/observed masks
    # derive on-chip from the single encoded channel (see ENC_BIG).
    gammaf = jnp.float32(gamma)
    obs_f = jnp.where(enc < jnp.float32(ENC_BIG * 0.5), 1.0, 0.0)
    tsdf = jnp.where(obs_f > 0.5, enc, 0.0)
    fixed_f = jnp.where(jnp.abs(tsdf) < gammaf, obs_f, 0.0)
    psrc_f = jnp.where(tsdf >= gammaf, obs_f, fixed_f)
    nsrc_f = jnp.where(tsdf <= -gammaf, obs_f, fixed_f)

    # iotas take the ARRAY shape (which may carry tile padding beyond
    # (W, W²) — the loop kernel works on physically-padded slabs so DMAs
    # stay tile-aligned); the lane→(i,k) arithmetic keeps the logical W.
    # Pad positions are harmless by construction: their enc is ENC_BIG,
    # so they are non-sources (lo=BIG/hi=-BIG) and non-sides.
    lane = jax.lax.broadcasted_iota(jnp.int32, h.shape, 2)
    sub = jax.lax.broadcasted_iota(jnp.int32, h.shape, 1)
    k_id = lane % W
    i_id = lane // W

    def lsh(x, s, fill):
        """out[l] = x[l+s] within each row-slab, vacated lanes = fill.
        Slice+concat, exactly like ops/esdf.py _lshift — pltpu.roll with
        large shift amounts (the ±W·2^k scan steps) stalls the Mosaic
        compiler, concatenation lowers cleanly."""
        if s == 0:
            return x
        pad = jnp.full(x.shape[:-1] + (abs(s),), fill, x.dtype)
        if s > 0:
            return jnp.concatenate([x[..., s:], pad], axis=2)
        return jnp.concatenate([pad, x[..., :s]], axis=2)

    def jsh(x, s, fill):
        """out[j] = x[j+s] along sublanes."""
        if s == 0:
            return x
        pad = jnp.full((x.shape[0], abs(s), x.shape[2]), fill, x.dtype)
        if s > 0:
            return jnp.concatenate([x[:, s:, :], pad], axis=1)
        return jnp.concatenate([pad, x[:, :s, :]], axis=1)

    def extrema(x, op, fill):
        """(faces, edges, corners) class extrema of the 26-stencil; i steps
        are +-W lane shifts, k steps +-1 lane shifts (cross-i bleed lands on
        halo lanes only, cropped by the side mask), j steps sublane shifts —
        identical to ops/esdf.py _extrema_sweep."""
        ai = op(lsh(x, W, fill), lsh(x, -W, fill))
        aj = op(jsh(x, 1, fill), jsh(x, -1, fill))
        ak = op(lsh(x, 1, fill), lsh(x, -1, fill))
        faces = op(op(ai, aj), ak)
        eij = op(jsh(ai, 1, fill), jsh(ai, -1, fill))
        eik = op(lsh(ai, 1, fill), lsh(ai, -1, fill))
        ejk = op(lsh(aj, 1, fill), lsh(aj, -1, fill))
        edges = op(op(eij, eik), ejk)
        corners = op(lsh(eij, 1, fill), lsh(eij, -1, fill))
        return faces, edges, corners

    v1f = jnp.float32(v1)
    v2f = jnp.float32(np.sqrt(2.0) * v1)
    v3f = jnp.float32(np.sqrt(3.0) * v1)
    bigf = jnp.float32(BIG)

    lo = jnp.where(psrc_f > 0.5, h, bigf)
    hi = jnp.where(nsrc_f > 0.5, h, -bigf)
    fl, el, cl = extrema(lo, jnp.minimum, bigf)
    fh, eh, ch = extrema(hi, jnp.maximum, -bigf)
    cand_lo = jnp.minimum(jnp.minimum(fl + v1f, el + v2f), cl + v3f)
    cand_hi = jnp.maximum(jnp.maximum(fh - v1f, eh - v2f), ch - v3f)

    if with_scans:
        n_steps = max(1, int(np.ceil(np.log2(W))))

        def dbl(w, brk, shift_fn, fill):
            """Inclusive segmented min via Hillis-Steele doubling (matches
            ops/esdf.py _dbl_seg_scan; breaks as f32 0/1 — Mosaic cannot
            minor-broadcast i1 vectors)."""
            m, b = w, brk
            s = 1
            for _ in range(n_steps):
                m = jnp.minimum(m, jnp.where(b > 0.5, fill,
                                             shift_fn(m, s, fill)))
                b = jnp.maximum(b, shift_fn(b, s, 1.0))
                s *= 2
            return m

        def scans(x, brk01):
            """Multi-hop axis-path min-plus candidates of x, self-excluded
            (matches ops/esdf.py _scan_candidates_fused). Measured
            negative result (round 5): extending these to all 13 chamfer
            direction classes (plane/space diagonals) left the drained
            sweep count unchanged (1116 -> 1111 on the bench orbit) and
            cost ~3 ms/frame — drained convergence is not staircase-run
            limited."""
            out = jnp.full_like(x, bigf)
            k_pos = k_id.astype(jnp.float32)
            i_pos = i_id.astype(jnp.float32)
            j_pos = sub.astype(jnp.float32)
            for pos, step, sh in ((k_pos, 1, lsh), (i_pos, W, lsh),
                                  (j_pos, 1, jsh)):
                if sh is lsh:
                    def sh_f(xx, s, f, step=step):
                        return lsh(xx, -s * step, f)

                    def sh_b(xx, s, f, step=step):
                        return lsh(xx, s * step, f)
                else:
                    def sh_f(xx, s, f):
                        return jsh(xx, -s, f)

                    def sh_b(xx, s, f):
                        return jsh(xx, s, f)
                brk_f = jnp.maximum(brk01, jnp.where(pos == 0.0, 1.0, 0.0))
                brk_b = jnp.maximum(brk01, jnp.where(pos == float(W - 1),
                                                     1.0, 0.0))
                incl_f = dbl(x - pos * v1f, brk_f, sh_f, bigf) + pos * v1f
                incl_b = dbl(x + pos * v1f, brk_b, sh_b, bigf) - pos * v1f
                out = jnp.minimum(out, jnp.minimum(
                    sh_f(incl_f, 1, bigf) + v1f, sh_b(incl_b, 1, bigf)
                    + v1f))
            return out

        brk_lo = jnp.maximum(1.0 - psrc_f, fixed_f)
        brk_hi = jnp.maximum(1.0 - nsrc_f, fixed_f)
        cand_lo = jnp.minimum(cand_lo, scans(lo, brk_lo))
        cand_hi = jnp.maximum(cand_hi, -scans(-hi, brk_hi))

    epsf = jnp.float32(eps)
    mrf = jnp.float32(max_ray)
    new = jnp.where(cand_lo <= h + epsf, jnp.minimum(h, cand_lo),
                    jnp.minimum(mrf, cand_lo))
    new = jnp.where(side_f > 0.5, new, h)
    new_n = jnp.where(cand_hi >= h - epsf, jnp.maximum(h, cand_hi),
                      jnp.maximum(-mrf, cand_hi))
    new = jnp.where(side_f < -0.5, new_n, new)
    return new


# ---------------------------------------------------------------------------
# whole-while-loop-in-one-kernel: sweeps + halo exchange + convergence all
# inside a single pallas_call, the field VMEM-resident across sweeps.
#
# Measured motivation (tools/exp_drained.py --split, v5e): with the
# orchestrated per-sweep design the ENTIRE 0.28 ms/sweep cost is XLA glue —
# an identity kernel times the same as the real one. Halo assembly (6
# gather passes over the full working set), the diff/activity reductions,
# while-loop carry staging, and per-call dispatch all disappear when the
# loop lives in the kernel; per-sweep cost drops to the VPU stencil work.
# ---------------------------------------------------------------------------


def _loop_kernel(nsl_ref, upd_ref, adj_ref, adjs_ref, acts0_ref, shell0_ref,
                 esdf_any, enc_any,
                 out_any, stats_ref, fld, encb, sems, st, slabchg, acts,
                 shellact, *, W: int, R: int, NSLAB: int, v1: float,
                 gamma: float, eps: float, eps_conv: float, max_ray: float,
                 max_sweeps: int, scan_sweeps: int, scan_period: int):
    """Single-invocation kernel (no grid): the sweep loop is an in-kernel
    ``lax.while_loop`` over [3 halo-shell passes, per-slab compute], so
    convergence is a REAL early exit. The previous formulation iterated a
    fixed (max_sweeps, 4, NSLAB) grid — measured on the v5e, the per-step
    grid overhead (~0.7 us x 132 steps/sweep) dominated the gated drained
    sweeps, and the quiet post-convergence sweeps of a 32-budget still
    paid ~4200 empty grid steps (~2.7 ms/frame of nothing). Here a quiet
    field costs zero and a gated sweep costs only its active slabs'
    shells + compute.

    Shell passes run axis-sequential (i -> j -> k, the same exchange as
    ops/esdf.py _assemble_sweep, so diagonals arrive through face reads
    of earlier-phase shells) as ``fori_loop``s over rows; the field lives
    in VMEM scratch ``fld`` for the whole call; ``enc`` streams per
    active slab from HBM (synchronous copy, ~3 us per 300 kB slab).
    Convergence: a sweep with no voxel moving more than ``eps_conv``
    exits the while loop."""
    V = W - 2
    L = W * W
    N = NSLAB * R
    Wp, Lp = fld.shape[1], fld.shape[2]

    # st: [quiet, changed_this_sweep, sweeps_run, comp_slabs, shell_rows]
    st[0] = 0
    st[1] = 0
    st[2] = 0
    st[3] = 0
    st[4] = 0
    # sweep-0 gates from the updatable-slab set (not all-ones): rim-only
    # slabs compute nothing on any sweep (their update mask is zero), so
    # skipping them — and shells outside the dilation of the updatable
    # set — on the first sweep is exact, same as on later sweeps
    for m in range(NSLAB):
        acts[m] = acts0_ref[m]
        shellact[m] = shell0_ref[m]
        slabchg[m] = 0
    cp = pltpu.make_async_copy(esdf_any, fld, sems.at[2])
    cp.start()
    cp.wait()

    # halo-shell passes are gated one 27-hop WIDER than compute
    # (shellact): a computed row's diagonal halo values travel through
    # its neighbor rows' shells across the three axis-sequential passes,
    # so every row in the 27-neighborhood of an active slab must refresh
    # its shells; rows farther out keep stale shells that nothing reads
    # until their neighborhood reactivates — at which point this gate
    # refreshes them before compute. Interiors are always current.
    def _shells_i(g, c):
        @pl.when(shellact[g // R] != 0)
        def _():
            st[4] = st[4] + 1
            im = nsl_ref[0, g]
            fld[pl.ds(g, 1), :, 0:W] = fld[pl.ds(im, 1), :,
                                           V * W:(V + 1) * W]
            ip = nsl_ref[1, g]
            fld[pl.ds(g, 1), :, (V + 1) * W:(V + 2) * W] = \
                fld[pl.ds(ip, 1), :, W:2 * W]
        return c

    def _shells_j(g, c):
        @pl.when(shellact[g // R] != 0)
        def _():
            jm = nsl_ref[2, g]
            fld[pl.ds(g, 1), 0:1, :] = fld[pl.ds(jm, 1), V:V + 1, :]
            jp = nsl_ref[3, g]
            fld[pl.ds(g, 1), V + 1:V + 2, :] = fld[pl.ds(jp, 1), 1:2, :]
        return c

    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, Wp, Lp), 2)
    k_id1 = lane1 % W
    mk0 = k_id1 == 0
    mk1 = (k_id1 == W - 1) & (lane1 < L)

    def _shells_k(g, c):
        @pl.when(shellact[g // R] != 0)
        def _():
            km = nsl_ref[4, g]
            rkm = fld[pl.ds(km, 1)]
            cur = fld[pl.ds(g, 1)]
            # +V lane shift aligns neighbor k'=V onto our k=0 lanes
            sh = jnp.concatenate(
                [rkm[..., V:], jnp.zeros((1, Wp, V), jnp.float32)],
                axis=-1)
            cur = jnp.where(mk0, sh, cur)
            kp = nsl_ref[5, g]
            rkp = fld[pl.ds(kp, 1)]
            sh = jnp.concatenate(
                [jnp.zeros((1, Wp, V), jnp.float32), rkp[..., :Lp - V]],
                axis=-1)
            cur = jnp.where(mk1, sh, cur)
            fld[pl.ds(g, 1)] = cur
        return c

    # enc slab copies run through TWO revolving buffers: each active slab
    # starts the NEXT active slab's copy before computing its own, so the
    # HBM fetch latency (the old synchronous start+wait stalled every
    # active slab, every sweep) hides behind the current slab's VPU work.
    # Semaphore indices must be static — the parity branches duplicate
    # only the tiny start/wait calls, not the compute.
    def _enc_start(m, parity0):
        @pl.when(parity0)
        def _():
            pltpu.make_async_copy(enc_any.at[pl.ds(m * R, R)],
                                  encb.at[pl.ds(0, R)], sems.at[0]).start()

        @pl.when(jnp.logical_not(parity0))
        def _():
            pltpu.make_async_copy(enc_any.at[pl.ds(m * R, R)],
                                  encb.at[pl.ds(R, R)], sems.at[1]).start()

    def _enc_wait(m, parity0):
        @pl.when(parity0)
        def _():
            pltpu.make_async_copy(enc_any.at[pl.ds(m * R, R)],
                                  encb.at[pl.ds(0, R)], sems.at[0]).wait()

        @pl.when(jnp.logical_not(parity0))
        def _():
            pltpu.make_async_copy(enc_any.at[pl.ds(m * R, R)],
                                  encb.at[pl.ds(R, R)], sems.at[1]).wait()

    def _compute_slab(n, s):
        # per-slab activity gate (same wavefront the orchestrated path's
        # slab_act gives): a slab recomputes only while a slab holding
        # some row of its updatable rows' 26-neighborhoods changed last
        # sweep. Skipping is exact — unchanged inputs recompute to the
        # same values. adj is precomputed outside (see caller).
        nxt = jnp.minimum(n + 1, NSLAB - 1)

        @pl.when((n + 1 < NSLAB) & (acts[nxt] != 0))
        def _():
            _enc_start(nxt, (n + 1) % 2 == 0)

        @pl.when(acts[n] != 0)
        def _():
            st[3] = st[3] + 1
            g0 = n * R
            boR = (n % 2) * R
            _enc_wait(n, n % 2 == 0)
            pred = s < scan_sweeps
            if scan_period > 0:
                pred |= s % scan_period == 0

            # the sweep math holds ~40 live (rows, Wp, Lp) temporaries in
            # Mosaic's VMEM stack (the scan chains); at 8 rows that stack
            # plus the resident field overflows VMEM, so compute runs in
            # row CHUNKS — exact, since every sweep-math op acts within a
            # row (i/k = lane shifts, j = sublane shifts; nothing crosses
            # the leading dim)
            RC = 2

            def run(with_scans):
                def f():
                    for c in range(0, R, RC):
                        h = fld[pl.ds(g0 + c, RC)]
                        enc = encb[pl.ds(boR + c, RC)]
                        # interior update-side mask derived on-chip: ±1
                        # on observed, non-fixed interior voxels of
                        # updatable rows (sign = TSDF side)
                        lane = jax.lax.broadcasted_iota(jnp.int32,
                                                        h.shape, 2)
                        sub = jax.lax.broadcasted_iota(jnp.int32,
                                                       h.shape, 1)
                        row = jax.lax.broadcasted_iota(jnp.int32,
                                                       h.shape, 0)
                        k_id = lane % W
                        i_id = lane // W
                        inter = jnp.where(
                            (lane < L) & (i_id >= 1) & (i_id <= V) &
                            (sub >= 1) & (sub <= V) & (k_id >= 1) &
                            (k_id <= V), 1.0, 0.0)
                        updm = jnp.zeros(h.shape, jnp.float32)
                        for r in range(RC):
                            updm += jnp.where(
                                (row == r) & (upd_ref[g0 + c + r] > 0),
                                1.0, 0.0)
                        obs_f = jnp.where(enc < jnp.float32(ENC_BIG * 0.5),
                                          1.0, 0.0)
                        tsdf = jnp.where(obs_f > 0.5, enc, 0.0)
                        fixed_f = jnp.where(
                            jnp.abs(tsdf) < jnp.float32(gamma), obs_f, 0.0)
                        sgn = jnp.where(tsdf >= 0.0, 1.0, -1.0)
                        side_f = sgn * obs_f * (1.0 - fixed_f) * inter \
                            * updm
                        new = _sweep_math(h, enc, side_f, W=W, v1=v1,
                                          gamma=gamma, eps=eps,
                                          max_ray=max_ray,
                                          with_scans=with_scans)
                        fld[pl.ds(g0 + c, RC)] = new
                        chg = jnp.any(jnp.abs(new - h) >
                                      jnp.float32(eps_conv))

                        @pl.when(chg)
                        def _mark():
                            st[1] = 1
                            slabchg[n] = 1
                return f
            pl.when(pred)(run(True))
            pl.when(jnp.logical_not(pred))(run(False))
        return s

    def _cond(s):
        return (st[0] == 0) & (s < max_sweeps)

    def _body(s):
        jax.lax.fori_loop(0, N, _shells_i, 0)
        jax.lax.fori_loop(0, N, _shells_j, 0)
        jax.lax.fori_loop(0, N, _shells_k, 0)

        # warm up the enc pipeline: slab 0's copy in flight before the loop
        @pl.when(acts[0] != 0)
        def _():
            _enc_start(0, jnp.bool_(True))

        jax.lax.fori_loop(0, NSLAB, _compute_slab, s)
        st[2] = st[2] + 1
        st[0] = jnp.where(st[1] == 0, 1, 0)
        st[1] = 0
        for m in range(NSLAB):
            acc = slabchg[0] * adj_ref[m * NSLAB]
            for m2 in range(1, NSLAB):
                acc = acc | (slabchg[m2] * adj_ref[m * NSLAB + m2])
            acts[m] = acc
        # shellact = acts dilated by the full-row slab adjacency:
        # adjs[m2, m] = 1 iff slab m2 has a row whose 27-neighborhood
        # reaches slab m — those rows' shells feed m2's compute
        for m in range(NSLAB):
            acc = acts[0] * adjs_ref[m]
            for m2 in range(1, NSLAB):
                acc = acc | (acts[m2] * adjs_ref[m2 * NSLAB + m])
            shellact[m] = acc
        for m in range(NSLAB):
            slabchg[m] = 0
        return s + 1

    jax.lax.while_loop(_cond, _body, jnp.int32(0))

    cp = pltpu.make_async_copy(fld, out_any, sems.at[2])
    cp.start()
    cp.wait()
    stats_ref[0] = st[2]
    stats_ref[1] = 1 - st[0]
    stats_ref[2] = st[3]
    stats_ref[3] = st[4]


@functools.partial(jax.jit, static_argnames=(
    "V", "v1", "gamma", "eps", "eps_conv", "max_ray", "max_sweeps",
    "scan_sweeps", "scan_period", "interpret"))
def esdf_sweep_loop_pallas(esdf_h, enc_hh, nsl27, upd_rows, *, V: int,
                           v1: float, gamma: float, eps: float,
                           eps_conv: float, max_ray: float,
                           max_sweeps: int, scan_sweeps: int = 1,
                           scan_period: int = 0, interpret: bool = False):
    """Run up to ``max_sweeps`` relaxation sweeps (halo exchange included)
    in ONE kernel. ``esdf_h`` needs valid interiors only (shells are
    assembled in-kernel every sweep); ``enc_hh`` is the halo-assembled
    encoded TSDF/participation channel; ``nsl27`` is the (27, N)
    compact-space neighbor row table in flattened 3x3x3 order (garbage
    row for missing neighbors — its enc must be ENC_BIG); ``upd_rows``
    is the (N,) i32 updatable-row mask. Returns (esdf_out, stats) with
    stats = [sweeps_run, changed_at_exit] i32."""
    N = esdf_h.shape[0]
    W = V + 2
    R = 8
    assert N % R == 0
    NSLAB = N // R
    # face-neighbor table for the in-kernel halo-shell passes
    # (flat-3x3x3 columns: i-=4, i+=22, j-=10, j+=16, k-=12, k+=14)
    nsl_face = nsl27[jnp.array([4, 22, 10, 16, 12, 14])]
    # slab-adjacency for the per-slab activity gate: adj[m, m2] = 1 iff
    # slab m has an updatable row with some 26-neighbor (or itself) in
    # slab m2 — built with one-hot matmuls (tiny MXU work, no scatter)
    slab_of = jnp.arange(N, dtype=jnp.int32) // R
    nbr_slab = jnp.take(slab_of, nsl27)                      # (27, N)
    src_m = jnp.where(upd_rows.astype(bool), slab_of, NSLAB)
    a_src = (src_m[:, None] ==
             jnp.arange(NSLAB, dtype=jnp.int32)[None, :]).astype(
                 jnp.float32)                                # (N, NSLAB)
    nbr_oh = (nbr_slab[:, :, None] ==
              jnp.arange(NSLAB, dtype=jnp.int32)[None, None, :]).astype(
                  jnp.float32).sum(axis=0)                   # (N, NSLAB)
    adj = (jnp.dot(a_src.T, nbr_oh,
                   preferred_element_type=jnp.float32) > 0.5)
    adj = adj.astype(jnp.int32).reshape(-1)                  # (NSLAB²,)
    # full-row adjacency (not just updatable rows) for the shell gate:
    # adjS[m, m2] = 1 iff ANY row of slab m has a 27-neighbor in slab m2
    a_all = (slab_of[:, None] ==
             jnp.arange(NSLAB, dtype=jnp.int32)[None, :]).astype(
                 jnp.float32)                                # (N, NSLAB)
    adjS_m = (jnp.dot(a_all.T, nbr_oh,
                      preferred_element_type=jnp.float32) > 0.5)
    adjS = adjS_m.astype(jnp.int32).reshape(-1)              # (NSLAB²,)
    # sweep-0 gates (see _loop_kernel): a slab with no updatable rows is
    # a no-op compute on EVERY sweep incl. the first, so the initial act
    # set is the updatable slabs and the initial shell set its dilation
    acts0 = jnp.any(adj.reshape(NSLAB, NSLAB) > 0, axis=1)
    shell0 = (jnp.dot(acts0.astype(jnp.float32),
                      adjS_m.astype(jnp.float32),
                      preferred_element_type=jnp.float32) > 0.5)
    # DMAs require tile-aligned slices, so the kernel works on the
    # physically-padded shape (N, Wp, Lp) — identical HBM/VMEM footprint
    # to the tiled (N, W, W²) arrays. Pad lanes/rows are neutral: enc pad
    # = ENC_BIG marks them non-participating (non-source, side 0), and
    # the field's value at non-sources is never consumed.
    Wp = -(-W // 8) * 8
    Lp = -(-(W * W) // 128) * 128
    pad = ((0, 0), (0, Wp - W), (0, Lp - W * W))
    esdf_p = jnp.pad(esdf_h, pad)
    enc_p = jnp.pad(enc_hh, pad, constant_values=ENC_BIG)
    kern = functools.partial(
        _loop_kernel, W=W, R=R, NSLAB=NSLAB, v1=float(v1),
        gamma=float(gamma), eps=float(eps), eps_conv=float(eps_conv),
        max_ray=float(max_ray), max_sweeps=int(max_sweeps),
        scan_sweeps=int(scan_sweeps), scan_period=int(scan_period))
    out, stats = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct(esdf_p.shape, jnp.float32),
                   jax.ShapeDtypeStruct((4,), jnp.int32)],
        scratch_shapes=[
            pltpu.VMEM((N, Wp, Lp), jnp.float32),      # fld
            pltpu.VMEM((2 * R, Wp, Lp), jnp.float32),  # enc revolving bufs
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SMEM((5,), jnp.int32),
            pltpu.SMEM((NSLAB,), jnp.int32),           # slabchg
            pltpu.SMEM((NSLAB,), jnp.int32),           # acts
            pltpu.SMEM((NSLAB,), jnp.int32),           # shellact
        ],
        interpret=interpret,
    )(nsl_face.astype(jnp.int32), upd_rows.astype(jnp.int32), adj, adjS,
      acts0.astype(jnp.int32), shell0.astype(jnp.int32),
      esdf_p, enc_p)
    return out[:, :W, :W * W], stats


@functools.partial(jax.jit, static_argnames=("V", "v1", "gamma", "eps",
                                             "max_ray", "with_scans",
                                             "interpret"))
def esdf_sweep_pallas(esdf_h, enc_h, side_h, slab_act=None, *, V: int,
                      v1: float, gamma: float, eps: float, max_ray: float,
                      with_scans: bool = True, interpret: bool = False):
    """One fused relaxation sweep over the (N, W, W²) sweep-layout field.

    ``esdf_h`` and ``enc_h`` must have halos already assembled; ``enc_h``
    is the encoded TSDF/participation channel (TSDF where participating,
    +ENC_BIG otherwise — observed/fixed/source masks derive on-chip);
    ``side_h`` is the interior-only update-side mask (+1/-1/0, i8). N must
    be a multiple of 8 (pad with fill rows). ``slab_act`` is an (N/8,)
    i32 per-slab activity gate — inactive slabs (frozen rim or regions
    whose rows and neighbors did not change last sweep) pass through
    without compute, which is exact since their inputs are unchanged;
    None computes every slab. Returns the updated field (interior
    updated, halo lanes passed through)."""
    W = V + 2
    N = esdf_h.shape[0]
    R = 8
    assert N % R == 0, "pad rows to a multiple of 8"
    if slab_act is None:
        slab_act = jnp.ones((N // R,), jnp.int32)
    grid = (N // R,)
    bspec = lambda: pl.BlockSpec((R, W, W * W), lambda n: (n, 0, 0))
    kern = functools.partial(_kernel, W=W, R=R, v1=float(v1),
                             gamma=float(gamma), eps=float(eps),
                             max_ray=float(max_ray), with_scans=with_scans)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[bspec(), bspec(), bspec(),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=bspec(),
        out_shape=jax.ShapeDtypeStruct(esdf_h.shape, jnp.float32),
        interpret=interpret,
    )(esdf_h, enc_h, side_h, slab_act.astype(jnp.int32))
