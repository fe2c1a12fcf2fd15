"""Windowed whole-iteration fused Pallas kernel for CP-PPD on DIA operators.

The fully-fused chunk kernel (:mod:`~pysparselp_tpu.ops.cp_fused`) requires
the whole problem to stay VMEM-resident — grid LPs beyond ~2M rows exceed
that.  Round 2 ran those through the row-windowed DIA SpMV plus ~10 XLA
elementwise ops, which re-streams every vector (and two intermedate vectors)
from HBM several times per iteration.

This kernel runs ONE complete CP iteration in a single ``pallas_call`` over
row windows, reading every input from HBM exactly once and writing the state
exactly once — the streaming roofline for the iteration:

* the position space is split into ``nw`` windows of ``W`` rows; window
  ``g`` DMA-copies its slice of every vector plus a halo into VMEM
  (``x``/``y`` also carry a guard band sized by the diagonal offset span);
* inside VMEM it computes ``d = c + A'ᵀy``, the box-projected primal step,
  over-relaxation, ``r = A'x₃ − b`` and the dual ascent — diagonal taps are
  static sublane-shift + lane-rotate reads, exactly as in ``cp_fused``;
* the halo is wide enough that the window INTERIOR is exact after ``K``
  iterations even though values near the buffer edge go stale (standard
  overlapped time-tiling; ``K = 1`` suffices for grid LPs, whose offset
  span ~ 4·grid_side makes deeper tiling unprofitable);
* arrays live in a padded layout with one full window of neutral zeros on
  each side, so every window (and the grid's two pad steps) runs identical
  code and the outputs can feed the next iteration directly — the
  iteration loop is a ``lax.fori_loop`` over ``pallas_call``s with no
  re-padding traffic in between.

Equality systems (round 4): when the problem also carries an aligned DIA
equality operator, the kernel adds a second dual plane ``y_eq`` — two more
value-plane sets (A_eᵀ taps into the d-update, A_e taps over x₃), its own
``σ_eq``/``b_eq`` vectors, and an UNclamped dual ascent — so the canonical
eq+ineq LP form runs at the same one-read-per-input streaming roofline.
Both systems share the window grid (the anchor-aligned embedding places
them in a common position space).

Reference context: this is the large-scale regime of the flagship solver's
hot loop (``pysparselp/ChambollePockPPD.py:195-342``, both systems every
iteration at ``:199-217`` and ``:331-342``); the single-chip driver selects
it when the problem outgrows the fully-fused kernel
(``solvers/chambolle_pock.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cp_fused import _shift_read

LANE = 128
# VMEM budget for the window buffers.  Leaves ~5.5 MB of the 16 MB VMEM
# for the double-buffered output blocks and Mosaic's stack temporaries
# (each shift-read materializes a (qc, 2·LANE) concat before the rotate) —
# measured: a 13 MB budget compiled to a 16.41 MB scoped allocation
WINDOWED_VMEM_BUDGET = 10 * 1024 * 1024
_MIN_WQ = 64          # below this the windows are all halo: not worth it

# test hook: force interpreter mode off-TPU
_FORCE_INTERPRET = False


def _cdiv(a, b):
    return -(-a // b)


# default iterations time-tiled into one kernel launch.  K>1 is fully
# supported (halo scales with K; tests pin K=1..3 against the unfused
# iteration) but measured NEUTRAL on the Potts ladder — the smaller
# windows' per-launch overheads eat the traffic savings — while the
# K-times-unrolled body triples Mosaic compile time, so the planner
# stays at K=1 unless a caller asks otherwise.
_DEFAULT_K = 1
_MAX_K = 4


def window_layout(offsets, offsets_t, n, m, vals_itemsize, k_iters=None,
                  eq=None):
    """Static window plan ``(Wq, Hq, Gq, nw, K)`` in sublane rows, or None.

    ``Hq`` (halo) bounds the garbage growth from the buffer edges over
    ``K`` time-tiled iterations (K × the per-iteration stencil radius);
    ``Gq`` (guard) covers the largest single tap so every shifted read
    stays in-buffer.  ``Wq`` is the largest interior that fits the VMEM
    budget.  With ``k_iters=None`` the K maximizing useful rows per
    launch (``Wq·K`` — both HBM traffic and VPU work per iteration scale
    as ``Qc/(Wq·K)``) is chosen among ``1..\\_DEFAULT_K`` (currently 1 —
    see the constant's rationale); explicit ``k_iters`` callers are
    bounded by ``_MAX_K``.

    ``eq`` — optional ``(eq_offsets, eq_offsets_t, eq_itemsize)`` for a
    joint eq+ineq plan: the guard/halo cover the UNION of both stencils
    and the VMEM accounting adds the eq value planes, the ``y_eq`` state
    buffer and the ``σ_eq``/``b_eq`` vectors."""
    if not offsets or not offsets_t:
        return None
    all_o, all_t = list(offsets), list(offsets_t)
    nd_bytes = (len(offsets) + len(offsets_t)) * vals_itemsize
    n_vec, n_state, n_blocks = 6, 3, 5
    if eq is not None:
        eq_off, eq_off_t, eq_iv = eq
        if not eq_off or not eq_off_t:
            return None
        all_o += list(eq_off)
        all_t += list(eq_off_t)
        nd_bytes += (len(eq_off) + len(eq_off_t)) * eq_iv
        n_vec, n_state, n_blocks = 8, 4, 7
    min_o, max_o = min(all_o), max(all_o)
    min_t, max_t = min(all_t), max(all_t)
    g = max(abs(min_o), abs(max_o), abs(min_t), abs(max_t)) + 1
    gq = _cdiv(g, LANE * 8) * 8
    # per-iteration dependence RADIUS per side: the chained application of
    # both stencils AND every single tap's own reach.  The single-tap
    # terms matter for one-sided offset sets (e.g. all offsets ≥ 1200):
    # the y-update reads x3 at +max_o, and x3 is only computed inside the
    # compute region, so the halo itself must cover that reach — the
    # chained terms (max_o + max_t etc.) only dominate when the two
    # stencils straddle zero (review r3 finding, verified by repro).
    s = max(max_o + max_t, -(min_o + min_t),
            max_o, -min_o, max_t, -min_t, 1) + 2
    # bytes per compute row Qc: the const vectors (f32) + all vals planes
    # plus the state buffers at Qb = Qc + 2·Gq — all DOUBLE-BUFFERED (next
    # window's DMAs overlap the current window's compute) — plus the
    # pipeline-managed (Wq,L) output blocks (bounded by Qc)
    per_qc = LANE * ((n_vec * 4 + nd_bytes + n_state * 4) * 2 + n_blocks * 8)
    const = LANE * (n_state * 4) * 2 * gq * 2
    qc = (WINDOWED_VMEM_BUDGET - const) // per_qc
    qc = qc // 8 * 8

    def plan_for(k):
        assert 1 <= k <= _MAX_K, k
        hq = _cdiv(k * s, LANE * 8) * 8
        wq = qc - 2 * hq
        if wq < max(_MIN_WQ, hq + gq):
            return None
        return int(wq), int(hq), int(gq), int(_cdiv(max(n, m), wq * LANE)), k

    if k_iters is not None:
        return plan_for(k_iters)
    best = None
    for k in range(1, _DEFAULT_K + 1):
        p = plan_for(k)
        if p is not None and (best is None or p[0] * k > best[0] * best[4]):
            best = p
    return best


def _make_wcp_kernel(offsets, offsets_t, nw, wq, hq, gq, qc,
                     k_iters, theta, with_sums, emit_x3,
                     eq_offsets=None, eq_offsets_t=None):
    gpos = gq * LANE
    base = gq + hq           # buffer row where the interior starts
    has_eq = eq_offsets is not None
    nbuf = 16 if has_eq else 11   # window-buffer arrays per slot
    ndma = 15 if has_eq else 10   # HBM→VMEM copies per window

    def unpack_bufs(bset):
        """Slot arrays in DMA order; eq entries None when absent."""
        bi = iter(bset)
        xb, yb = next(bi), next(bi)
        yeb = next(bi) if has_eq else None
        x3b = next(bi)
        cb, tb, lbb, ubb, sb, bb = (next(bi) for _ in range(6))
        seb = next(bi) if has_eq else None
        beb = next(bi) if has_eq else None
        vtb, vb = next(bi), next(bi)
        vteb = next(bi) if has_eq else None
        veb = next(bi) if has_eq else None
        return (xb, yb, yeb, x3b, cb, tb, lbb, ubb, sb, bb, seb, beb,
                vtb, vb, vteb, veb)

    def kernel(*refs):
        it = iter(refs)
        x_hbm, y_hbm = next(it), next(it)
        ye_hbm = next(it) if has_eq else None
        c_hbm, t_hbm, lb_hbm, ub_hbm, s_hbm, b_hbm = (
            next(it) for _ in range(6))
        se_hbm = next(it) if has_eq else None
        be_hbm = next(it) if has_eq else None
        vt_hbm, v_hbm = next(it), next(it)
        vte_hbm = next(it) if has_eq else None
        ve_hbm = next(it) if has_eq else None
        x_out = next(it)
        x3_out = next(it) if emit_x3 else None
        y_out = next(it)
        ye_out = next(it) if has_eq else None
        sx_out = next(it) if with_sums else None
        sy_out = next(it) if with_sums else None
        sye_out = next(it) if (with_sums and has_eq) else None
        rest = tuple(it)
        bufs = (rest[0:nbuf], rest[nbuf:2 * nbuf])  # double-buffered slots
        sem = rest[2 * nbuf]                        # DMA sems, (2, ndma)
        g = pl.program_id(0)

        def window_dmas(gw, bset, p):
            """The HBM→VMEM copies for window ``gw`` into slot ``p``
            (window slot = gw % 2; reconstructable for start AND wait).
            wq/hq/gq are 8-multiples by construction, but Mosaic cannot
            prove dynamic slice starts divisible by the sublane tiling on
            its own — hint it."""
            (xb, yb, yeb, _x3b, cb, tb, lbb, ubb, sb, bb, seb, beb,
             vtb, vb, vteb, veb) = unpack_bufs(bset)
            # i32 explicitly: under jax_enable_x64 the python-int constants
            # promote the offsets to i64, which tpu.memref_slice rejects
            gw32 = jnp.asarray(gw, jnp.int32)
            r0b = pl.multiple_of(
                gw32 * jnp.int32(wq) - jnp.int32(hq + gq), 8)
            r0c = pl.multiple_of(gw32 * jnp.int32(wq) - jnp.int32(hq), 8)
            vec = [(x_hbm, xb, r0b), (y_hbm, yb, r0b)]
            if has_eq:
                vec.append((ye_hbm, yeb, r0b))
            vec += [(c_hbm, cb, r0c), (t_hbm, tb, r0c), (lb_hbm, lbb, r0c),
                    (ub_hbm, ubb, r0c), (s_hbm, sb, r0c), (b_hbm, bb, r0c)]
            if has_eq:
                vec += [(se_hbm, seb, r0c), (be_hbm, beb, r0c)]
            planes = [(vt_hbm, vtb), (v_hbm, vb)]
            if has_eq:
                planes += [(vte_hbm, vteb), (ve_hbm, veb)]
            dmas = []
            for i, (src, dst, r0) in enumerate(vec):
                dmas.append(pltpu.make_async_copy(
                    src.at[pl.ds(r0, dst.shape[0])], dst,
                    sem.at[jnp.int32(p), jnp.int32(i)]))
            nv = len(vec)
            # value planes come from the per-window PRE-TILED layout
            # (nw, nd, qc, LANE): one contiguous copy per plane set
            # instead of nd strided slices of a (nd, qtot, LANE) array —
            # measured on-chip, the strided form issues 26 sub-copies per
            # window and decays with the array footprint (P300 6.4 →
            # P1000 8.9 µs/window DMA), the tiled form holds 4.7
            for i, (src, dst) in enumerate(planes):
                dmas.append(pltpu.make_async_copy(
                    src.at[pl.ds(gw32 - jnp.int32(1), 1)], dst,
                    sem.at[jnp.int32(p), jnp.int32(nv + i)]))
            return dmas

        @pl.when(g == 0)
        def _():
            # pipeline warm-up: window 1's loads land in slot 1.  (g + 1
            # rather than a literal 1: a concrete start constant-folds to
            # a python int, which re-traces as i64 under jax_enable_x64
            # and tpu.memref_slice rejects i64 indices)
            for d in window_dmas(g + 1, bufs[1], 1):
                d.start()

        @pl.when((g == 0) | (g == nw + 1))
        def _():
            # the two permanent pad windows: all-neutral zeros
            x_out[:] = jnp.zeros_like(x_out)
            if emit_x3:
                x3_out[:] = jnp.zeros_like(x3_out)
            y_out[:] = jnp.zeros_like(y_out)
            if has_eq:
                ye_out[:] = jnp.zeros_like(ye_out)
            if with_sums:
                sx_out[:] = jnp.zeros_like(sx_out)
                sy_out[:] = jnp.zeros_like(sy_out)
                if has_eq:
                    sye_out[:] = jnp.zeros_like(sye_out)

        def compute(bset):
            (xb, yb, yeb, x3b, cb, tb, lbb, ubb, sb, bb, seb, beb,
             vtb, vb, vteb, veb) = unpack_bufs(bset)
            # x3 guard rows are never written by the update; zero once so
            # edge reads see neutral values (their garbage stays within
            # the halo shrink budget)
            x3b[:gq] = jnp.zeros((gq, LANE), jnp.float32)
            x3b[gq + qc:] = jnp.zeros((gq, LANE), jnp.float32)
            if with_sums:
                sx_out[:] = jnp.zeros_like(sx_out)
                sy_out[:] = jnp.zeros_like(sy_out)
                if has_eq:
                    sye_out[:] = jnp.zeros_like(sye_out)

            for _k in range(k_iters):
                d = cb[:]
                # eq taps first — same accumulation order as the unfused
                # iteration (_cp_iteration: d = c + A_eᵀy_e + A_iᵀy_i)
                if has_eq:
                    for j, t in enumerate(eq_offsets_t):
                        tt = t + gpos
                        d = d + vteb[0, j].astype(jnp.float32) * _shift_read(
                            yeb, tt // LANE, tt % LANE, qc)
                for j, t in enumerate(offsets_t):
                    tt = t + gpos
                    d = d + vtb[0, j].astype(jnp.float32) * _shift_read(
                        yb, tt // LANE, tt % LANE, qc)
                x_cur = xb[gq:gq + qc]
                x2 = jnp.clip(x_cur - tb[:] * d, lbb[:], ubb[:])
                x3 = (1.0 + theta) * x2 - theta * x_cur
                xb[gq:gq + qc] = x2
                x3b[gq:gq + qc] = x3
                if has_eq:
                    re_ = -beb[:]
                    for j, t in enumerate(eq_offsets):
                        tt = t + gpos
                        re_ = re_ + veb[0, j].astype(jnp.float32) * _shift_read(
                            x3b, tt // LANE, tt % LANE, qc)
                    # equality dual: plain ascent, no projection
                    ye_new = yeb[gq:gq + qc] + seb[:] * re_
                    yeb[gq:gq + qc] = ye_new
                r = -bb[:]
                for j, t in enumerate(offsets):
                    tt = t + gpos
                    r = r + vb[0, j].astype(jnp.float32) * _shift_read(
                        x3b, tt // LANE, tt % LANE, qc)
                y_new = jnp.maximum(yb[gq:gq + qc] + sb[:] * r, 0.0)
                yb[gq:gq + qc] = y_new
                if with_sums:
                    sx_out[:] += x2[hq:hq + wq]
                    sy_out[:] += y_new[hq:hq + wq]
                    if has_eq:
                        sye_out[:] += ye_new[hq:hq + wq]

            x_out[:] = xb[base:base + wq]
            if emit_x3:
                x3_out[:] = x3b[base:base + wq]
            y_out[:] = yb[base:base + wq]
            if has_eq:
                ye_out[:] = yeb[base:base + wq]

        for par in (0, 1):
            @pl.when((g > 0) & (g <= nw)
                     & (jax.lax.rem(g, jnp.int32(2)) == jnp.int32(par)))
            def _(par=par):
                # start the NEXT window's loads into the other slot before
                # blocking on this window's — the DMA engines stream the
                # next slices while the VPU computes this one
                @pl.when(g + 1 <= nw)
                def _():
                    for d in window_dmas(g + 1, bufs[1 - par], 1 - par):
                        d.start()
                for d in window_dmas(g, bufs[par], par):
                    d.wait()
                compute(bufs[par])

    return kernel


def build_windowed_call(wq, hq, gq, nw, k, theta_f, with_sums, emit_x3,
                        offsets, offsets_t, vt_dtype, v_dtype,
                        eq_offsets=None, eq_offsets_t=None, vte_dtype=None,
                        ve_dtype=None, interpret=False):
    """Construct the windowed whole-iteration ``pallas_call`` for a grid
    of ``nw`` interior windows (+2 pads).  Shared between the single-chip
    driver (:func:`_cp_windowed_call_full`) and the position-sharded
    multi-chip path (``parallel/sharded_cp_windowed``), where each shard
    runs this call over ITS windows and the pad windows carry
    halo-exchanged neighbor state."""
    has_eq = eq_offsets is not None
    qc = wq + 2 * hq
    qb = qc + 2 * gq
    qtot = (nw + 2) * wq
    i32 = jnp.int32
    iv = v_dtype.itemsize
    n_out = (1 + int(emit_x3) + 1 + int(has_eq)
             + ((2 + int(has_eq)) if with_sums else 0))
    slot = [
        pltpu.VMEM((qb, LANE), jnp.float32),           # xb
        pltpu.VMEM((qb, LANE), jnp.float32),           # yb
    ]
    if has_eq:
        slot.append(pltpu.VMEM((qb, LANE), jnp.float32))   # yeb
    slot.append(pltpu.VMEM((qb, LANE), jnp.float32))       # x3b
    slot += [pltpu.VMEM((qc, LANE), jnp.float32)           # c t lb ub
             for _ in range(6)]                            # s b
    if has_eq:
        slot += [pltpu.VMEM((qc, LANE), jnp.float32)       # se be
                 for _ in range(2)]
    slot += [
        pltpu.VMEM((1, len(offsets_t), qc, LANE), vt_dtype),
        pltpu.VMEM((1, len(offsets), qc, LANE), v_dtype),
    ]
    if has_eq:
        slot += [
            pltpu.VMEM((1, len(eq_offsets_t), qc, LANE), vte_dtype),
            pltpu.VMEM((1, len(eq_offsets), qc, LANE), ve_dtype),
        ]
    ndma = 15 if has_eq else 10
    n_in = ndma  # one HBM source per DMA
    plane_entries = nw * (len(offsets) + len(offsets_t)) * qc * LANE
    plane_bytes = plane_entries * iv
    eq_plane_entries = 0
    if has_eq:
        eq_plane_entries = (nw * (len(eq_offsets) + len(eq_offsets_t))
                            * qc * LANE)
        plane_bytes += eq_plane_entries * ve_dtype.itemsize
    return pl.pallas_call(
        _make_wcp_kernel(
            offsets, offsets_t, nw, wq, hq, gq, qc, k, theta_f,
            with_sums, emit_x3,
            eq_offsets=eq_offsets, eq_offsets_t=eq_offsets_t),
        grid=(nw + 2,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in,
        out_specs=[pl.BlockSpec((wq, LANE),
                                lambda g: (i32(g), i32(0)))] * n_out,
        out_shape=[jax.ShapeDtypeStruct((qtot, LANE), jnp.float32)
                   ] * n_out,
        scratch_shapes=(
            # two full window-buffer slots (double-buffered DMA)
            slot + slot + [pltpu.SemaphoreType.DMA((2, ndma))]),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * (plane_entries + eq_plane_entries),
            bytes_accessed=plane_bytes
            + (8 + 3 * int(has_eq)) * qtot * LANE * 4
            + n_out * qtot * LANE * 4,
            transcendentals=0,
        ),
    )


def _pad_rows_layout(vec, wq, qtot):
    """(len,) vector -> (qtot, LANE) padded layout: one window of zeros on
    the left, zeros through the right pad windows."""
    out = jnp.zeros((qtot * LANE,), jnp.float32)
    out = out.at[wq * LANE:wq * LANE + vec.shape[0]].set(
        vec.astype(jnp.float32))
    return out.reshape(qtot, LANE)


def _pad_vals_layout(vals, ndiag, size, wq, qtot):
    """Kernel-layout DIA vals (ndiag_pad, rows_pad) -> (ndiag, qtot, LANE)
    in the padded window layout (true diagonals only)."""
    q = _cdiv(size, LANE)
    v = vals[:ndiag, :q * LANE].reshape(ndiag, q, LANE)
    out = jnp.zeros((ndiag, qtot, LANE), vals.dtype)
    return out.at[:, wq:wq + q, :].set(v)


def _tile_vals_layout(vals, ndiag, size, wq, hq, qc, nw, qtot):
    """Kernel-layout DIA vals (ndiag_pad, rows_pad) -> per-window tiled
    (nw, ndiag, qc, LANE): window ``g`` (1-based) holds padded-layout rows
    ``[g*wq - hq, g*wq - hq + qc)`` as one contiguous block, so the kernel
    fetches each window's whole plane set with a single DMA.  Costs a
    ``qc/wq`` storage duplication (the halo columns appear in two windows);
    the streamed bytes per iteration are identical to the strided layout."""
    pad = _pad_vals_layout(vals, ndiag, size, wq, qtot)
    # static window starts (wq > hq keeps them >= 0; ends stay < qtot) —
    # a python loop of STATIC slices, not a general gather: XLA lowers
    # slice+stack to cheap copies while a (nw, qc) row gather is slow on
    # TPU at large nw
    starts = [wq * g - hq for g in range(1, nw + 1)]
    return jnp.stack([pad[:, s:s + qc, :] for s in starts])


@functools.partial(jax.jit, static_argnames=("nsteps", "theta_f",
                                             "interpret", "with_sums"))
def _cp_windowed_call_full(prob, pre, x, y_eq, y, nsteps, theta_f,
                           interpret=False, with_sums=False):
    """Run ``nsteps`` windowed-fused CP iterations on an (optionally
    equality-carrying) DIA problem; returns
    ``(x, x3, y_eq, y[, sum_x, sum_y_eq, sum_y])`` (sums accumulated over
    all iterations; the eq outputs are empty arrays when ``prob.a_eq`` is
    None)."""
    dia = prob.a_ineq
    n, m = prob.n, prob.m_ineq
    offsets, offsets_t = dia.offsets, dia.offsets_t
    has_eq = prob.a_eq is not None
    m_eq = prob.m_eq if has_eq else 0
    eq_args = None
    if has_eq:
        de = prob.a_eq
        eq_args = (de.offsets, de.offsets_t, de.vals.dtype.itemsize)
    plan = window_layout(offsets, offsets_t, n, max(m, m_eq),
                         dia.vals.dtype.itemsize, eq=eq_args)
    assert plan is not None, "caller must check cp_windowed_eligible"
    wq, hq, gq, nw, kk = plan
    qc = wq + 2 * hq
    qb = qc + 2 * gq
    qtot = (nw + 2) * wq

    xp = _pad_rows_layout(x, wq, qtot)
    yp = _pad_rows_layout(y, wq, qtot)
    cp_ = _pad_rows_layout(prob.c, wq, qtot)
    tp = _pad_rows_layout(pre["diag_t"], wq, qtot)
    lbp = _pad_rows_layout(prob.lb, wq, qtot)
    ubp = _pad_rows_layout(prob.ub, wq, qtot)
    sp = _pad_rows_layout(pre["sigma_ineq"], wq, qtot)
    bp = _pad_rows_layout(prob.b_upper, wq, qtot)
    vtp = _tile_vals_layout(dia.vals_t, len(offsets_t), n, wq, hq, qc, nw,
                            qtot)
    vp = _tile_vals_layout(dia.vals, len(offsets), m, wq, hq, qc, nw, qtot)
    if has_eq:
        de = prob.a_eq
        yep = _pad_rows_layout(y_eq, wq, qtot)
        sep = _pad_rows_layout(pre["sigma_eq"], wq, qtot)
        bep = _pad_rows_layout(prob.b_eq, wq, qtot)
        vtep = _tile_vals_layout(de.vals_t, len(de.offsets_t), n, wq, hq,
                                 qc, nw, qtot)
        vep = _tile_vals_layout(de.vals, len(de.offsets), m_eq, wq, hq, qc,
                                nw, qtot)

    def make_call(emit_x3, k):
        return build_windowed_call(
            wq, hq, gq, nw, k, theta_f, with_sums, emit_x3,
            offsets, offsets_t, dia.vals_t.dtype, dia.vals.dtype,
            eq_offsets=prob.a_eq.offsets if has_eq else None,
            eq_offsets_t=prob.a_eq.offsets_t if has_eq else None,
            vte_dtype=prob.a_eq.vals_t.dtype if has_eq else None,
            ve_dtype=prob.a_eq.vals.dtype if has_eq else None,
            interpret=interpret)

    # time-tiled stepping: each launch advances K iterations; the loop
    # body never needs x3 (derived state) — only the final call emits it.
    # A short tail compiles one extra kernel variant at k = remainder.
    assert nsteps >= 1, "windowed chunk advances at least one iteration"
    n_full, rem = divmod(nsteps, kk)
    n_loop = n_full if rem else n_full - 1
    k_final = rem if rem else kk
    call = make_call(False, kk)
    call_x3 = make_call(True, k_final)

    consts = (cp_, tp, lbp, ubp, sp, bp)
    if has_eq:
        consts += (sep, bep, vtp, vp, vtep, vep)
    else:
        consts += (vtp, vp)

    def split_state(outs):
        """(state..., sums...) in kernel output order -> (carry, sums)."""
        n_state = 2 + int(has_eq)       # x, y[, ye] (loop calls omit x3)
        return tuple(outs[:n_state]), tuple(outs[n_state:])

    state0 = (xp, yp) + ((yep,) if has_eq else ())
    if with_sums:
        nsum = 2 + int(has_eq)
        zero = jnp.zeros((qtot, LANE), jnp.float32)

        def body(_, carry):
            st, acc = carry
            outs = call(*st, *consts)
            st_n, sums = split_state(outs)
            return st_n, tuple(a + s for a, s in zip(acc, sums))

        st, acc = jax.lax.fori_loop(
            0, n_loop, body, (state0, (zero,) * nsum))
        outs = call_x3(*st, *consts)
        it = iter(outs)
        xpn = next(it)
        x3p = next(it)
        ypn = next(it)
        yepn = next(it) if has_eq else None
        sums = tuple(a + s for a, s in zip(acc, tuple(it)))
    else:
        def body(_, st):
            st_n, _ = split_state(call(*st, *consts))
            return st_n

        st = jax.lax.fori_loop(0, n_loop, body, state0)
        outs = call_x3(*st, *consts)
        it = iter(outs)
        xpn, x3p, ypn = next(it), next(it), next(it)
        yepn = next(it) if has_eq else None

    dt = x.dtype

    def unpad(v, size):
        return v.reshape(-1)[wq * LANE:wq * LANE + size].astype(dt)

    ye_res = unpad(yepn, m_eq) if has_eq else jnp.zeros(0, dt)
    res = (unpad(xpn, n), unpad(x3p, n), ye_res, unpad(ypn, m))
    if with_sums:
        sx = unpad(sums[0], n)
        sy = unpad(sums[1], m)
        se = unpad(sums[2], m_eq) if has_eq else jnp.zeros(0, dt)
        res += (sx, se, sy)
    return res


def _cp_windowed_call(prob, pre, x, y, nsteps, theta_f, interpret=False,
                      with_sums=False):
    """Inequality-only entry (shared call contract with
    ``ops.cp_fused._cp_fused_call``); returns ``(x, x3, y[, sx, sy])``."""
    assert prob.a_eq is None, (
        "eq-carrying problem through the ineq-only contract would "
        "silently zero its eq dual — use _cp_windowed_call_full")
    res = _cp_windowed_call_full(
        prob, pre, x, jnp.zeros(0, x.dtype), y, nsteps, theta_f,
        interpret=interpret, with_sums=with_sums)
    if with_sums:
        x_n, x3_n, _ye, y_n, sx, _se, sy = res
        return x_n, x3_n, y_n, sx, sy
    x_n, x3_n, _ye, y_n = res
    return x_n, x3_n, y_n


def cp_windowed_eligible(prob, dtype) -> bool:
    """DIA problems beyond the fully-fused VMEM budget whose offset spans
    admit a windowed plan.  Equality systems are supported when they are
    also DIA-lowered (the anchor-aligned embedding places both systems in
    one position space); the plan is then joint."""
    from ..problem import DiaMatrix

    if prob.a_ineq is None:
        return False
    if not isinstance(prob.a_ineq, DiaMatrix):
        return False
    if prob.a_ineq.vals.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    dia = prob.a_ineq
    if not dia.offsets or not dia.offsets_t:
        return False
    eq_args = None
    if prob.a_eq is not None:
        de = prob.a_eq
        if not isinstance(de, DiaMatrix):
            return False
        if de.vals.dtype not in (jnp.float32, jnp.bfloat16):
            return False
        if not de.offsets or not de.offsets_t:
            return False
        eq_args = (de.offsets, de.offsets_t, de.vals.dtype.itemsize)
    # preferred over the per-op SpMV regime everywhere beyond the
    # fully-fused budget (measured r3, double-buffered DMA: Potts-300
    # 12.7k it/s windowed vs 9.1k per-op; Potts-700 2.58k vs 1.56k)
    plan = window_layout(dia.offsets, dia.offsets_t, prob.n,
                         max(prob.m_ineq, prob.m_eq),
                         dia.vals.dtype.itemsize, eq=eq_args)
    if plan is None:
        return False
    if _FORCE_INTERPRET:
        return True
    return jax.default_backend() == "tpu"


def cp_windowed_chunk(prob, pre, state, nsteps: int, theta: float):
    """Run ``nsteps`` windowed-fused CP iterations; returns the new
    (x, x3, y_eq, y_ineq) state tuple."""
    x, _x3, y_eq, y_ineq = state
    interpret = jax.default_backend() != "tpu"
    x_n, x3_n, ye_n, y_n = _cp_windowed_call_full(
        prob, pre, x, y_eq, y_ineq, nsteps, float(theta),
        interpret=interpret)
    return (x_n, x3_n, ye_n if prob.a_eq is not None else y_eq, y_n)
