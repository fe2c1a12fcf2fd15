"""Routed gather-ELL SpMV: unstructured sparse matvec on the TPU VPU.

TPU has no scatter/gather memory unit — XLA lowers an arbitrary
``jnp.take`` at ~2 µs per thousand elements (the calibrated
``ELL_GATHER_BYTES_PER_NNZ = 2000`` in :mod:`~pysparselp_tpu.problem`),
which prices unstructured matrices out of every hot path.  What the
hardware *does* have is ``tpu.dynamic_gather``: a vector-unit gather
over a VMEM-resident 2-D tile along either the sublane axis (within a
lane) or the lane axis (within a sublane row).  Mosaic exposes exactly
two forms, both requiring the index tile to have the same shape as the
table tile (``jnp.take_along_axis(table, idx, axis=0 | 1)``).

An arbitrary gather ``out[so, lo] = x[sx, lx]`` does not fit either
form, but — exactly like routing a permutation through a 3-stage Clos
network — it factors into lane → sublane → lane moves:

*  stage A (lane shuffle in the source row):  ``tA[sx, λ] = x[sx, lx]``
*  stage B (sublane gather in lane λ):        ``tB[so, λ] = tA[sx, λ]``
*  stage C (lane shuffle in the output row):  ``out[so, lo] = tB[so, λ]``

Mosaic only lowers the sublane form when the source spans ONE vreg
along sublanes (8 rows at f32 — probed on-chip: ``(8, 128)`` compiles,
``(128, 128)`` raises "Multiple source vregs along gather dimension"),
so stage B runs TRANSPOSED: tables are (128, 128) tiles, the kernel
computes ``tBᵀ[λ, so] = gather_lanes(tAᵀ, Bᵀ)`` with the B index plane
stored pre-transposed at build time, and ``(128, 128)`` transposes are
native Mosaic ops.  The price is a 128-row tile geometry: every table
is a stack of ``(128, LANE)`` tiles and cross-tile movement rides the
plane DMA itself via per-plane ``(src_tile, dst_tile)`` tags.

for a per-demand intermediate lane ``λ`` chosen at *lowering time* (the
sparsity pattern is static) such that no two distinct elements claim the
same A-slot ``(sx, λ)`` or B-slot ``(so, λ)``.  Demands for the same
element multicast for free: within an output row through stage C, and
across output rows through stage B reading one A-slot.  The greedy
host-side colorer below assigns λs plane by plane; demands it cannot
place within 128 lanes spill to overflow planes (for uniform random
sparsity spills are rare — the expected free-lane count at a conflicted
demand is ``128·e^{-2} ≈ 17``).

The SpMV then runs as one ``pallas_call`` over ELL planes: each plane
streams three int8 index tiles and one value tile (bf16 when exactly
representable) from HBM and issues three ``dynamic_gather``s, two
``(128, 128)`` transposes and a multiply-accumulate — ~5 bytes of HBM
traffic per (padded) slot instead of the ~2000-byte effective cost of
the XLA gather.  Tables beyond one 128-row tile live in HBM as
``(tiles, 128, LANE)`` stacks with scalar-prefetched
(src_tile, dst_tile) tags per plane (see ``build_routes``).

Reference context: the reference keeps every operator in scipy CSR and
SpMV is ``scipy.sparse.csr_matrix @ vector`` (e.g. the CP-PPD hot loop,
``pysparselp/ChambollePockPPD.py:199-217``); this backend exists so the
same unstructured matrices have a TPU-native representation.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse

LANE = 128
# do not claim more than this many planes' worth of spill rounds before
# giving up — build_routes raises rather than mis-route, and the
# auto-selection path in ``problem.ell_from_scipy`` catches the raise and
# falls through to the XLA gather backends (prefer="routed" propagates it)
_MAX_SPILL_PLANES = 64
_MAX_ROUNDS = 64
# tiled-table ceiling: tables larger than the VMEM single-tile limit are
# split into (tiles, qt, LANE) HBM tiles and routed pair-by-pair (see
# build_routes); beyond this many table rows the host routing cost and
# pair-granularity padding stop paying vs the XLA fallback
_TILED_MAX_Q = 32768  # 4.19M positions


def _route_plane(so, lo, sx, lx, vals, q, rng):
    """Assign an intermediate lane λ to each demand of one plane.

    Returns ``(a, b, c, v, spilled)`` — the three i32 index tiles and the
    value tile, all ``(q, LANE)``, plus the boolean mask of demands that
    could not be placed (to be re-routed in an overflow plane).

    Claim tables are keyed by element id, so duplicates of one element
    share slots (multicast) instead of conflicting.
    """
    nd = so.shape[0]
    eid = sx.astype(np.int64) * LANE + lx
    # flat claim tables: -1 = free, else the eid routed through the slot
    a_slot = np.full(q * LANE, -1, np.int64)
    b_slot = np.full(q * LANE, -1, np.int64)
    lam = np.full(nd, -1, np.int32)

    unassigned = np.arange(nd)
    for t in range(_MAX_ROUNDS):
        if unassigned.size == 0:
            break
        u = unassigned
        if t == 0:
            prop = lx[u].astype(np.int32)  # identity-ish first try
        else:
            prop = rng.randint(0, LANE, u.size).astype(np.int32)
        key_a = sx[u].astype(np.int64) * LANE + prop
        key_b = so[u].astype(np.int64) * LANE + prop
        e = eid[u]
        # slot compatibility: free, or already carrying the same element
        ok_a = (a_slot[key_a] == -1) | (a_slot[key_a] == e)
        ok_b = (b_slot[key_b] == -1) | (b_slot[key_b] == e)
        cand = ok_a & ok_b
        # among this round's candidates, slots must also not be claimed
        # twice with different elements: keep, per key, only candidates
        # whose eid matches the first candidate's eid for that key
        ci = np.nonzero(cand)[0]
        if ci.size:
            for key in (key_a, key_b):
                k = key[ci]
                order = np.argsort(k, kind="stable")
                ks, es = k[order], e[ci][order]
                first = np.ones(ks.size, bool)
                first[1:] = ks[1:] != ks[:-1]
                # eid of the first candidate per key, broadcast down runs
                run_id = np.cumsum(first) - 1
                first_e = es[np.nonzero(first)[0]][run_id]
                keep = es == first_e
                sel = np.ones(ci.size, bool)
                sel[order] = keep
                ci = ci[sel]
        if ci.size:
            idx = u[ci]
            lam[idx] = prop[ci]
            a_slot[key_a[ci]] = e[ci]
            b_slot[key_b[ci]] = e[ci]
        unassigned = u[lam[u] == -1]

    if unassigned.size:
        _repair_plane(unassigned, so, sx, eid, lam, a_slot, b_slot)
        unassigned = unassigned[lam[unassigned] == -1]

    spilled = np.zeros(nd, bool)
    spilled[unassigned] = True

    placed = np.nonzero(~spilled)[0]
    a = np.zeros((q, LANE), np.int32)
    # b is emitted TRANSPOSED — (LANE, q), b[λ, so] = sx — because the
    # kernel's middle stage is a lane gather over tAᵀ (see module
    # docstring: multi-vreg sublane gathers do not lower on Mosaic)
    b = np.zeros((LANE, q), np.int32)
    c = np.zeros((q, LANE), np.int32)
    v = np.zeros((q, LANE), np.float64)
    pl_, pso, plo = lam[placed], so[placed], lo[placed]
    a[sx[placed], pl_] = lx[placed]
    b[pl_, pso] = sx[placed]
    c[pso, plo] = pl_
    v[pso, plo] = vals[placed]
    return a, b, c, v, spilled


def _repair_plane(unassigned, so, sx, eid, lam, a_slot, b_slot):
    """Exact alternating-path recoloring for the greedy's leftovers.

    A plane's demands form a bipartite multigraph (source sublanes x
    output sublanes) and λ is an edge color: per A-node each color is
    claimed by one element, per B-node each color by one demand.  With
    per-node degree <= 128 a 128-edge-coloring always exists (König's
    edge-coloring theorem), but the randomized greedy above strands a
    few percent of demands on dense planes — the r5 unstructured build
    paid 148 merged overflow planes (~14%) for them.  This pass places
    each leftover exactly: pick α free at the demand's A-row and β free
    at its B-row, then flip the αβ-alternating chain starting at the
    B-row (bipartiteness guarantees the chain never reaches the A-row,
    so α frees up at both ends).  Multicast slots (one A-slot shared by
    several same-element demands) have color-degree > 1 and break the
    chain argument, so walks abort on them (rare: within-plane element
    fanout is ~1.04 on the bench matrices).  Mutates ``lam`` /
    ``a_slot`` / ``b_slot`` in place.
    """
    # edge maps for chain walking: -1 free, -2 shared (unflippable),
    # else the demand id holding the slot
    a_edge = np.full(a_slot.size, -1, np.int64)
    b_edge = np.full(b_slot.size, -1, np.int64)
    placed = np.nonzero(lam >= 0)[0]
    ka = sx[placed].astype(np.int64) * LANE + lam[placed]
    kb = so[placed].astype(np.int64) * LANE + lam[placed]
    for key, edge in ((ka, a_edge), (kb, b_edge)):
        order = np.argsort(key, kind="stable")
        ks, ps = key[order], placed[order]
        dup = np.zeros(ks.size, bool)
        same = ks[1:] == ks[:-1]
        dup[1:] |= same
        dup[:-1] |= same
        edge[ks[~dup]] = ps[~dup]
        edge[ks[dup]] = -2  # multicast: >= 2 demands on one slot

    def walk(rb_base, ra_base, alpha, beta, e):
        """Collect the αβ-chain from the B-row; [] means blocked."""
        path = []
        color, node, side = alpha, rb_base, "b"
        for _ in range(2 * LANE + 2):
            j = (b_edge if side == "b" else a_edge)[node + color]
            if j == -1:
                return path
            if j == -2:
                return None
            # the OTHER endpoint's slot of j at its current color must
            # be exclusively j's (flipping j must free that slot)
            if side == "b":
                if a_edge[int(sx[j]) * LANE + color] != j:
                    return None
                path.append(j)
                node, side, color = int(sx[j]) * LANE, "a", beta
            else:
                if b_edge[int(so[j]) * LANE + color] != j:
                    return None
                path.append(j)
                node, side, color = int(so[j]) * LANE, "b", alpha
            if side == "a" and node == ra_base:
                # αβ-chains from the B-row cannot reach the A-row when
                # slots are exclusive (parity argument); a multicast
                # slot we failed to detect could — refuse to flip
                return None
        return None

    for i in unassigned:
        e = int(eid[i])
        ra = int(sx[i]) * LANE
        rb = int(so[i]) * LANE
        arow = a_slot[ra:ra + LANE]
        brow = b_slot[rb:rb + LANE]
        ok_a = (arow == -1) | (arow == e)
        free_b = brow == -1
        both = np.nonzero(ok_a & free_b)[0]
        if both.size:
            # prefer joining an existing multicast slot (costs no A-slot)
            shared = both[arow[both] == e]
            lam_i = int(shared[0] if shared.size else both[0])
        else:
            alphas = np.nonzero(ok_a)[0]
            betas = np.nonzero(free_b)[0]
            if alphas.size == 0 or betas.size == 0:
                continue  # structural capacity spill
            lam_i = -1
            for alpha in alphas[:4]:
                for beta in betas[:4]:
                    path = walk(rb, ra, int(alpha), int(beta), e)
                    if path is None:
                        continue
                    # flip the chain: j_0 α->β, j_1 β->α, ...
                    for t, j in enumerate(path):
                        old = int(alpha if t % 2 == 0 else beta)
                        new = int(beta if t % 2 == 0 else alpha)
                        kaj = int(sx[j]) * LANE
                        kbj = int(so[j]) * LANE
                        a_slot[kaj + old] = -1
                        b_slot[kbj + old] = -1
                        a_edge[kaj + old] = -1
                        b_edge[kbj + old] = -1
                        lam[j] = new
                    for t, j in enumerate(path):
                        new = int(beta if t % 2 == 0 else alpha)
                        ej = int(eid[j])
                        kaj = int(sx[j]) * LANE + new
                        kbj = int(so[j]) * LANE + new
                        a_slot[kaj] = ej
                        b_slot[kbj] = ej
                        a_edge[kaj] = j
                        b_edge[kbj] = j
                    lam_i = int(alpha)
                    break
                if lam_i >= 0:
                    break
            if lam_i < 0:
                continue
        lam[i] = lam_i
        if a_slot[ra + lam_i] == e:
            a_edge[ra + lam_i] = -2  # now shared
        else:
            a_slot[ra + lam_i] = e
            a_edge[ra + lam_i] = i
        b_slot[rb + lam_i] = e
        b_edge[rb + lam_i] = i


def _route_pool(rows, row_loc, col_loc, vals, q, rng):
    """Route one demand pool into a list of ``(a, b, c, v)`` planes.

    ``row_loc``/``col_loc`` are table-local element positions
    (``< q*LANE``); ``rows`` are the row ids used for plane binning and
    the rotation hash (global, so tiling does not change a row's plane
    rotation).  This is the single-table routing core: the untiled path
    calls it once with global == local coordinates, the tiled path once
    per (dst-tile, src-tile) demand group.
    """
    so_all = (row_loc // LANE).astype(np.int32)
    lo_all = (row_loc % LANE).astype(np.int32)
    sx_all = (col_loc // LANE).astype(np.int32)
    lx_all = (col_loc % LANE).astype(np.int32)

    # per-entry row counts and occurrence positions.  CSR entry order is
    # stable within a row, so occurrence == the original column rank —
    # identical to the indptr-derived ``pos`` of the whole-matrix path.
    nd = rows.size
    order = np.argsort(rows, kind="stable")
    rs = rows[order]
    first = np.ones(nd, bool)
    first[1:] = rs[1:] != rs[:-1]
    idx = np.arange(nd)
    occ_sorted = idx - np.maximum.accumulate(np.where(first, idx, -1))
    pos = np.empty(nd, np.int64)
    pos[order] = occ_sorted
    run_starts = np.nonzero(first)[0]
    run_lens = np.diff(np.append(run_starts, nd))
    cnt_ent = np.empty(nd, np.int64)
    cnt_ent[order] = np.repeat(run_lens, run_lens)

    # plane = per-row entry position ROTATED by a per-row hash: raw
    # column-sorted positions concentrate each plane's gathers in one
    # column region (plane 0 = every row's smallest column), overloading
    # the 128 A-slots of the busy source rows — measured 32% structural
    # spill on a 2M-nnz uniform random matrix, vs ~2% rotated.
    rot = (rows.astype(np.int64) * 40503) % cnt_ent
    plane0 = (pos + rot) % cnt_ent
    k_max = int(plane0.max()) + 1 if nd else 1
    order0 = np.argsort(plane0, kind="stable")
    bounds = np.searchsorted(plane0[order0], np.arange(k_max + 1))
    pending_sel = [order0[bounds[k]:bounds[k + 1]] for k in range(k_max)
                   if bounds[k] < bounds[k + 1]]

    def bin_by_row_occurrence(sel):
        """Split a demand pool into selections with at most one demand
        per matrix row each (one (so, lo) output slot per plane)."""
        srows = rows[sel]
        order = np.argsort(srows, kind="stable")
        s_sorted = sel[order]
        rr = srows[order]
        first = np.ones(sel.size, bool)
        first[1:] = rr[1:] != rr[:-1]
        # occurrence index within each equal-row run
        idx = np.arange(sel.size)
        occ = idx - np.maximum.accumulate(np.where(first, idx, -1))
        out = []
        for o in range(int(occ.max()) + 1):
            grp = s_sorted[occ == o]
            if grp.size:
                out.append(grp)
        return out

    planes = []
    spill_pool = []
    spill_planes = 0
    side = []
    # an overflow plane streams q*LANE slots at ~32 B each while the COO
    # side path (XLA gather + scatter-add) costs ~2 kB effective per
    # demand: a merged overflow plane only pays for itself above
    # ~q*LANE/64 demands — smaller residues ride the side path
    side_cut = max(64, (q * LANE) // 64)
    while pending_sel or spill_pool:
        if not pending_sel:
            # merge every plane's spills into as few overflow planes as
            # possible (routing them per source plane wastes mostly-empty
            # (q, LANE) tiles); residues below the plane-cost crossover
            # go to the COO side path instead
            merged = bin_by_row_occurrence(np.concatenate(spill_pool))
            spill_pool = []
            keep = [s for s in merged if s.size >= side_cut]
            side.extend(s for s in merged if s.size < side_cut)
            if spill_planes + len(keep) > _MAX_SPILL_PLANES:
                side.extend(keep)
                keep = []
            spill_planes += len(keep)
            pending_sel.extend(keep)
            if not pending_sel:
                break
        sel = pending_sel.pop(0)
        a, b, c, v, spilled = _route_plane(
            so_all[sel], lo_all[sel], sx_all[sel], lx_all[sel],
            vals[sel], q, rng)
        planes.append((a, b, c, v))
        sp = sel[spilled]
        if sp.size:
            spill_pool.append(sp)
    side_idx = (np.concatenate(side) if side
                else np.zeros(0, np.int64))
    return planes, len(planes) - k_max, side_idx


def _ragged_arange(counts):
    """[0..counts[0]), [0..counts[1]), ... concatenated."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    ends = np.cumsum(counts)
    return np.arange(total) - np.repeat(ends - counts, counts)


# --- tail fold: per-pool occurrence-layer cap for tiled tables ----------
# A tiled plane spans one (dst-tile, src-tile) pair and holds at most one
# demand per output row, so a pool's plane count equals its MAX per-row
# demand count while the mean is often ~2 (Poisson tail): the r5
# unstructured capture paid 1,545 planes at 7.7% slot fill.  Capping
# pools at L layers moves every demand past layer L to a dedicated
# VIRTUAL output slot — tail slots pack ~dense into fresh table tiles
# (grouped by the real row's tile, spread over the group's tiles by
# per-row rank so the collect route stays ~one layer per pool) — and a
# recursive collect route sums them into their real rows, exactly like
# the virtual-row split of the single-tile path.  Extreme skew (a
# 4000-degree row) collapses logarithmically: the collect matrix routes
# through build_routes at depth+1 and applies its own fold.
_TAIL_FOLD_CANDS = (2, 3, 4, 6, 8)
_COLLECT_SPREAD = 4   # target collect layers per (row-tile, vtile) pool
_TAIL_FOLD_MIN_GAIN = 0.8


def _occ_within(keys):
    """Occurrence index of each element within its equal-key group."""
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    first = np.ones(ks.size, bool)
    if ks.size:
        first[1:] = ks[1:] != ks[:-1]
    idx = np.arange(ks.size)
    occ = np.empty(ks.size, np.int64)
    occ[order] = idx - np.maximum.accumulate(np.where(first, idx, -1))
    return occ


def _layer_planes(rows, st, tsz, nst, unroll=1):
    """EXACT plane count a demand set costs under pair-pool routing
    (before spills): per (dst-tile, src-tile) pool, planes = max
    per-row demand count, padded to a multiple of ``unroll``."""
    if rows.size == 0:
        return 0
    key = rows * nst + st
    order = np.argsort(key, kind="stable")
    ks = key[order]
    first = np.ones(ks.size, bool)
    first[1:] = ks[1:] != ks[:-1]
    run_starts = np.nonzero(first)[0]
    run_lens = np.diff(np.append(run_starts, ks.size))
    g_rows = rows[order][run_starts]
    g_st = ks[run_starts] % nst
    pool = (g_rows // tsz) * nst + g_st
    porder = np.argsort(pool, kind="stable")
    ln = run_lens[porder]
    pfirst = np.ones(ln.size, bool)
    pfirst[1:] = pool[porder][1:] != pool[porder][:-1]
    pmax = np.maximum.reduceat(ln, np.nonzero(pfirst)[0])
    if unroll > 1:
        pmax = -(-pmax // unroll) * unroll
    return int(pmax.sum())


def _fold_alloc(t_rows, t_st, rank_row, rank_rs, base, tsz, mode):
    """Assign virtual table slots to the tail demands.

    mode "j": grouped by the real row's tile, round-robin over the
    group's virtual tiles by per-row tail rank — few collect pools
    (each row tile keeps its own virtual tiles), at the price of
    multi-src virtual tiles.  mode "s": sorted by (src tile, per-
    (row,src) rank) and filled sequentially — virtual tiles cover
    contiguous src-tile runs (few tail pools), at the price of every
    row tile reaching into every virtual tile.  Which wins is
    matrix-shape-dependent; the caller counts both exactly.
    """
    if mode == "s":
        order = np.lexsort((t_rows, rank_rs, t_st))
        slots = np.empty(t_rows.size, np.int64)
        slots[order] = base + np.arange(t_rows.size)
        return slots, -(-t_rows.size // tsz)
    slots = np.empty(t_rows.size, np.int64)
    vtiles_total = 0
    jj_of = t_rows // tsz
    for jj in np.unique(jj_of):
        sel = np.nonzero(jj_of == jj)[0]
        nj = sel.size
        mxj = int(rank_row[sel].max()) + 1
        vj = max(-(-nj // tsz), -(-mxj // _COLLECT_SPREAD))
        vj = min(vj, max(-(-nj // tsz), 16))
        pref = (rank_row[sel]
                + (t_rows[sel] * 2654435761) % (1 << 16)) % vj
        local = np.full(nj, -1, np.int64)
        used = np.zeros(vj, np.int64)
        pending = np.arange(nj)
        shift = 0
        while pending.size:
            tpref = (pref[pending] + shift) % vj
            for tt in range(vj):
                grp = pending[tpref == tt]
                space = int(tsz - used[tt])
                take = grp[:space]
                if take.size:
                    local[take] = (tt * tsz + used[tt]
                                   + np.arange(take.size))
                    used[tt] += take.size
            pending = pending[local[pending] < 0]
            shift += 1
            assert shift <= vj + 1, "tail slot allocation overflow"
        slots[sel] = base + vtiles_total * tsz + local
        vtiles_total += vj
    return slots, vtiles_total


def _fold_search(rows, st, m, base_tile, qt, depth, unroll, max_tiles):
    """(best_planes, plan) over {no fold} ∪ {cap × mode} candidates.

    Plane counts are EXACT (pure counting, no routing, spills excluded):
    a candidate's total = the capped demand set's layer planes + the
    collect matrix's cost, counted RECURSIVELY with the same search —
    the built collect route applies the same fold at depth+1, so a deep
    tail (one 4000-degree row) is priced at its log-depth collapse, not
    at a flat 4000 planes.  ``plan`` is ``(rows_eff, t_rows, slots,
    vtiles)`` or ``None`` when not folding wins.  ``unroll`` is the
    pad quantum the plane layout will pay (1 for the dst-grouped kernel,
    whose per-pool remainders pair cross-pool within each dst group);
    ``max_tiles`` bounds table growth.
    """
    tsz = qt * LANE
    nst = int(st.max()) + 1 if st.size else 1
    flat = _layer_planes(rows, st, tsz, nst, unroll)
    best = (flat, None)
    if depth >= 2 or rows.size == 0:
        return best
    occ = _occ_within(rows * nst + st)       # per-(row, src-tile) rank
    base = base_tile * tsz
    id_rows = np.arange(m)
    for cap in _TAIL_FOLD_CANDS:
        t_idx = np.nonzero(occ >= cap)[0]
        if t_idx.size == 0:
            continue
        t_rows, t_st = rows[t_idx], st[t_idx]
        rank_row = _occ_within(t_rows)       # per-row tail rank
        rank_rs = occ[t_idx] - cap           # per-(row, src-tile) rank
        for mode in ("j", "s"):
            slots, vtiles = _fold_alloc(t_rows, t_st, rank_row, rank_rs,
                                        base, tsz, mode)
            if base_tile + vtiles > max_tiles:
                continue
            rows_eff = rows.copy()
            rows_eff[t_idx] = slots
            main = _layer_planes(rows_eff, st, tsz,
                                 max(nst, base_tile + vtiles),
                                 unroll)
            # collect = identity over real rows + the tail slots,
            # recursively costed (the built collect folds too)
            c_rows = np.concatenate([id_rows, t_rows])
            c_st = np.concatenate([id_rows, slots]) // tsz
            coll, _ = _fold_search(c_rows, c_st, m,
                                   base_tile + vtiles, qt, depth + 1,
                                   unroll, max_tiles)
            total = main + coll
            if total < best[0]:
                best = (total, (rows_eff, t_rows, slots, vtiles))
    return best


def _tiled_transform(rows, cols, m, q, qt, depth):
    """Pick the cheapest demand transform for a tiled table by EXACT
    plane counting: no transform, the per-pool tail fold
    (:func:`_fold_search` — right for Poisson tails spread over many
    pools), or the global virtual-row chunk split (right for single
    DEEP rows, which the occurrence cap only collapses by a factor of
    the cap per level while chunking collapses them in one).

    Returns ``None`` or ``(rows_eff, owners, slot_positions,
    q_new_rows)`` — owners/slots feed the collect matrix, ``q_new_rows``
    the extended table size in LANE-row units."""
    tsz = qt * LANE
    st = cols // tsz
    nst = int(st.max()) + 1 if st.size else 1
    tiles_n = -(-q // qt)
    # the dst-grouped kernel pairs chains across a group's src pools, so
    # per-pool padding is gone; group-level padding (< unroll planes per
    # dst tile) is small enough to count plane totals at quantum 1
    unroll = 1
    max_tiles = _TILED_MAX_Q // qt
    baseline = _layer_planes(rows, st, tsz, nst, unroll)
    best = (baseline, None)

    total, plan = _fold_search(rows, st, m, tiles_n, qt, depth, unroll,
                               max_tiles)
    if plan is not None and total < best[0]:
        rows_eff, t_rows, slots, vtiles = plan
        best = (total, (rows_eff, t_rows, slots, (tiles_n + vtiles) * qt))

    pos = _occ_within(rows)
    cnt = np.bincount(rows, minlength=m)
    busy = cnt[cnt > 0]
    k_max = int(busy.max()) if busy.size else 0
    cands = ({int(np.percentile(busy, p)) for p in (50, 75, 90, 95)}
             if busy.size else set())
    cands.add(int(np.ceil(np.sqrt(max(k_max, 1)))))
    id_rows = np.arange(m)
    for t in sorted(tt for tt in cands if 1 <= tt < k_max):
        chunk = pos // t
        heavy = np.nonzero(cnt > t)[0]
        n_chunks = -(-cnt[heavy] // t) - 1
        nv = int(n_chunks.sum())
        if nv == 0:
            continue
        # the table must keep covering the SOURCE positions too (n may
        # exceed m + the virtual rows)
        q_new = max(q, -(-(m + nv) // LANE))
        tiles_after = -(-q_new // qt)
        if tiles_after > max_tiles:
            continue
        v_base = m + np.concatenate(([0], np.cumsum(n_chunks[:-1])))
        first_virtual = np.zeros(m, np.int64)
        first_virtual[heavy] = v_base
        rows_eff = np.where(chunk == 0, rows,
                            first_virtual[rows] + chunk - 1)
        main = _layer_planes(rows_eff, st, tsz, max(nst, tiles_after),
                             unroll)
        owners = np.repeat(heavy, n_chunks)
        vids = np.repeat(v_base, n_chunks) + _ragged_arange(n_chunks)
        c_rows = np.concatenate([id_rows, owners])
        c_st = np.concatenate([id_rows, vids]) // tsz
        coll, _ = _fold_search(c_rows, c_st, m, tiles_after, qt,
                               depth + 1, unroll, max_tiles)
        total = main + coll
        if total < best[0]:
            best = (total, (rows_eff, owners, vids, q_new))
    if best[1] is None or best[0] > _TAIL_FOLD_MIN_GAIN * baseline:
        return None
    return best[1]


def _split_plan(cnt, m, q, nnz, n_src_rows, q_cap=None):
    """Pick a virtual-row split target minimizing estimated route cost
    (planes x table rows — virtual slots may grow the table).

    Returns ``(target, q_eff)`` or ``(None, q)`` when leaving wide rows
    unsplit is estimated cheaper.  ``q_cap`` bounds how far virtual rows
    may grow the table (the single-tile VMEM limit by default; the tiled
    ceiling when the table is already beyond the single-tile limit)."""
    if q_cap is None:
        q_cap = routed_q_limit()
    busy = cnt[cnt > 0]
    if busy.size == 0:
        return None, q
    k_max = int(busy.max())
    # main-pass planes can never drop below the source-side capacity
    # bound: each plane has one A-slot per table element
    src_bound = -(-nnz // (n_src_rows * LANE))

    def est(t):
        n_virt = int(np.sum(-(-cnt[cnt > t] // t) - 1))
        q_eff = max(q, -(-(m + n_virt) // LANE))
        if q_eff > q_cap:
            return None, q
        main = max(t, src_bound)
        collect = -(-k_max // t) + 1  # identity plane + chunk tails
        return (main + collect) * q_eff, q_eff

    cands = {int(np.percentile(busy, p)) for p in (50, 75, 90, 95)}
    cands.add(int(np.ceil(np.sqrt(k_max))))
    cands = sorted(t for t in cands if 1 <= t < k_max)
    best = (None, q)
    best_cost = k_max * q  # no-split cost
    for t in cands:
        e, q_eff = est(t)
        if e is not None and e < 0.85 * best_cost:
            best, best_cost = (t, q_eff), e
    return best


def _side_coo(rows, cols, vals, side_idx):
    """COO triplet ``(out positions, in positions, values)`` — in TABLE
    coordinates — for the demands the router left to the XLA
    gather/scatter fallback; ``None`` when everything routed."""
    if side_idx.size == 0:
        return None
    return (rows[side_idx].astype(np.int64),
            cols[side_idx].astype(np.int64),
            vals[side_idx].astype(np.float64))


def build_routes(csr, seed=0, split=True, _depth=0, qt=None):
    """Route a CSR matrix's gather pattern into stacked index planes.

    Returns a dict with i32 arrays ``a, b, c`` and f64 ``v``, each shaped
    ``(n_planes, q, LANE)`` where ``q = ceil(max(nrows, ncols)/LANE)``,
    satisfying, for ``x_t = pad(x).reshape(q, LANE)``::

        A @ x == (sum_p v[p] * C-gather(B-gather(A-gather(x_t))))[:nrows]

    When wide rows were split (``split=True`` and the estimate says it
    pays), the dict carries a ``"collect"`` sub-route over the same
    table geometry: the main planes then produce PARTIAL sums (real rows
    at their own slots, virtual rows appended beyond ``nrows``) and the
    final result is the collect route applied to that ``(q, LANE)``
    buffer — ``plane count = max row degree`` becomes
    ``split target + ceil(max_degree/target) + 1`` instead.

    Tables beyond the single-tile VMEM limit (``q > routed_q_limit()``,
    or a forced ``qt``) come back TILED: planes are ``(qt, LANE)``, the
    dict gains ``qt``, ``tiles`` and a ``tags`` array of i32 rows
    ``(src_tile, dst_tile, first_visit)`` per plane, and ``q`` is padded
    to ``tiles * qt``.  Each plane gathers from exactly one source tile
    into exactly one destination tile, so padding grows with the number
    of touched tile pairs — tiling lifts the size ceiling (to
    ``_TILED_MAX_Q``), it does not come free.
    """
    qt_arg = qt
    csr = scipy.sparse.csr_matrix(csr)
    csr.sum_duplicates()
    m, n = csr.shape
    q = max(-(-m // LANE), -(-n // LANE), 1)
    if qt_arg is None and q < routed_q_limit():
        # pad single-tile tables to a full (128, LANE) tile: the middle
        # stage transposes the whole tile, and Mosaic transposes want
        # native 128x128 geometry
        q = routed_q_limit()
    rng = np.random.RandomState(seed)

    cnt = np.diff(csr.indptr)
    nnz = csr.nnz
    if nnz == 0:
        if qt_arg is None and q <= routed_q_limit():
            z = np.zeros((1, q, LANE), np.int32)
            return {"a": z, "b": np.zeros((1, LANE, q), np.int32),
                    "c": z.copy(),
                    "v": np.zeros((1, q, LANE), np.float64), "q": q,
                    "shape": (m, n), "n_planes": 1, "spill_planes": 0,
                    "collect": None}
        qt = qt_arg or _tiled_qt()
        tiles_n = -(-q // qt)
        z = np.zeros((tiles_n, qt, LANE), np.int32)
        tags = np.stack([np.zeros(tiles_n, np.int32),
                         np.arange(tiles_n, dtype=np.int32),
                         np.ones(tiles_n, np.int32)])
        return {"a": z, "b": np.zeros((tiles_n, LANE, qt), np.int32),
                "c": z.copy(),
                "v": np.zeros((tiles_n, qt, LANE), np.float64),
                "q": tiles_n * qt, "qt": qt, "tiles": tiles_n,
                "tags": tags, "shape": (m, n), "n_planes": tiles_n,
                "spill_planes": 0, "collect": None}
    rows = np.repeat(np.arange(m), cnt)
    pos = np.arange(nnz) - np.repeat(csr.indptr[:-1], cnt)

    collect = None
    target = None
    will_tile = not (qt_arg is None and q <= routed_q_limit())
    if split and _depth < 2 and not will_tile:
        # single-tile tables: global virtual-row split (planes = max row
        # degree there, so chunking wide rows is the right tool).  Tiled
        # tables use the per-pool tail fold below instead: their plane
        # count is the SUM of per-(dst-tile, src-tile) pool maxima, which
        # global degree chunking does not model.
        target, q = _split_plan(cnt, m, q, nnz, max(-(-n // LANE), 1),
                                q_cap=routed_q_limit())
    if target is not None:
        # entry j of row r -> chunk j // target; chunk 0 keeps the real
        # row slot, chunks >= 1 get freshly-numbered virtual rows
        chunk = pos // target
        heavy = np.nonzero(cnt > target)[0]
        n_chunks = -(-cnt[heavy] // target) - 1  # virtual rows per heavy row
        v_base = m + np.concatenate(([0], np.cumsum(n_chunks[:-1]))) if (
            heavy.size) else np.zeros(0, np.int64)
        first_virtual = np.zeros(m, np.int64)
        first_virtual[heavy] = v_base
        rows_eff = np.where(chunk == 0, rows,
                            first_virtual[rows] + chunk - 1)
        pos = pos % target
        cnt_eff = np.bincount(rows_eff, minlength=m + int(n_chunks.sum()))
        # collect matrix: real row <- its own slot + its virtual slots
        c_rows = np.concatenate([np.arange(m),
                                 np.repeat(heavy, n_chunks)])
        c_cols = np.concatenate([np.arange(m),
                                 np.repeat(v_base, n_chunks)
                                 + _ragged_arange(n_chunks)])
        c_mat = scipy.sparse.csr_matrix(
            (np.ones(c_rows.size), (c_rows, c_cols)),
            shape=(m, q * LANE))
        collect = build_routes(c_mat, seed=seed + 1, _depth=_depth + 1,
                               qt=qt_arg)
        # collect consumes the main pass's output table: same positions
        # (its q may carry tile padding; both derive from the same rule)
        assert collect["shape"][1] == q * LANE
        rows, cnt = rows_eff, cnt_eff

    cols = csr.indices.astype(np.int64)
    vals_all = csr.data.astype(np.float64)
    del pos, cnt  # _route_pool recomputes both per demand pool

    if qt_arg is None and q <= routed_q_limit():
        planes, n_spill, side_idx = _route_pool(rows, rows, cols,
                                                vals_all, q, rng)
        arrs = {k: np.stack([p[i] for p in planes])
                for i, k in enumerate(("a", "b", "c", "v"))}
        arrs.update(q=q, shape=(m, n), n_planes=len(planes),
                    spill_planes=n_spill, collect=collect,
                    side=_side_coo(rows, cols, vals_all, side_idx))
        return arrs

    # ------------------------------------------------------------------
    # tiled table: q exceeds the VMEM-resident limit, so the table lives
    # in HBM as (tiles, qt, LANE) and every plane is tagged with the
    # (src-tile, dst-tile) pair it gathers between — the kernel selects
    # its x and output tiles from scalar-prefetched tags.  Demands group
    # by pair; each pair routes over a (qt, LANE) geometry exactly like a
    # small table.  Padding grows with the pair count (a plane spans one
    # pair only), which the chooser's routed_cost_estimate prices.
    qt = qt_arg or _tiled_qt()
    if split and _depth < 2:
        fold = _tiled_transform(rows, cols, m, q, qt, _depth)
        if fold is not None:
            rows_eff, owners, slot_pos, q_new = fold
            # collect: every real row reads its own slot plus its
            # virtual slots (the identity part rides the diagonal
            # (j, j) pools at full fill)
            c_rows = np.concatenate([np.arange(m), owners])
            c_cols = np.concatenate([np.arange(m), slot_pos])
            c_mat = scipy.sparse.csr_matrix(
                (np.ones(c_rows.size), (c_rows, c_cols)),
                shape=(m, q_new * LANE))
            collect = build_routes(c_mat, seed=seed + 1,
                                   _depth=_depth + 1, qt=qt_arg)
            assert collect["shape"][1] == q_new * LANE
            rows, q = rows_eff, q_new
    tiles_n = -(-q // qt)
    q_pad = tiles_n * qt
    dtile = (rows // LANE) // qt
    stile = (cols // LANE) // qt
    pair = dtile * tiles_n + stile
    porder = np.argsort(pair, kind="stable")
    pp = pair[porder]
    starts = np.nonzero(np.r_[True, pp[1:] != pp[:-1]])[0]
    bounds = np.append(starts, pp.size)
    pools = []  # (dst_tile, src_tile, [(a, b, c, v), ...])
    n_spill = 0
    side_parts = []
    for gi in range(starts.size):
        sel = porder[starts[gi]:bounds[gi + 1]]
        d_t = int(dtile[sel[0]])
        s_t = int(stile[sel[0]])
        row_loc = rows[sel] - d_t * (qt * LANE)
        col_loc = cols[sel] - s_t * (qt * LANE)
        pool_planes, sp, side_local = _route_pool(
            rows[sel], row_loc, col_loc, vals_all[sel], qt, rng)
        n_spill += sp
        if side_local.size:
            side_parts.append(sel[side_local])
        pools.append((d_t, s_t, pool_planes))
    zplane = (np.zeros((qt, LANE), np.int32),
              np.zeros((LANE, qt), np.int32),
              np.zeros((qt, LANE), np.int32),
              np.zeros((qt, LANE), np.float64))
    # dst-grouped plane order: each grid step's _PLANE_UNROLL chains
    # share ONE output tile (single revolving-block accumulate) but
    # carry their own scalar-prefetched SOURCE tile.  Within a dst
    # group, each pool's planes are emitted in whole unroll quanta first
    # (a step's chains then share their src tile too, so the per-chain
    # x BlockSpecs keep hitting the same block and Pallas skips the
    # re-DMA — measured faster than strict cross-pool interleave, 761 vs
    # 747 us/pair on the r5 unstructured matrix); the per-pool REMAINDER
    # planes pair cross-pool within the group (mixed-src steps pay extra
    # 64 KB x DMAs but avoid the old per-pool zero-fill, which cost 232
    # of the r5 capture's 1,260 planes).  Only each group's tail pads
    # with zero planes.  Untouched dst tiles still need one (zeroing)
    # group so every tile of the padded table is written.
    covered = {d for d, _, _ in pools}
    by_dst = {}
    for d_t, s_t, pls in pools:
        by_dst.setdefault(d_t, []).append((s_t, pls))
    # tiles no plane writes stay garbage in the pallas output; they are
    # masked to zero OUTSIDE the kernel (a (tiles, 1, 1) where-select,
    # ~3 us for the whole table) instead of paying one zeroing group of
    # _PLANE_UNROLL planes each (~0.5 us PER PLANE) inside it
    touched = None
    if len(covered) < tiles_n:
        touched = np.zeros(tiles_n, np.float32)
        touched[sorted(covered)] = 1.0
    u = _PLANE_UNROLL
    tagged = []
    for d_t in sorted(by_dst):
        group = by_dst[d_t]
        orphans = []
        for s_t, pls in group:
            whole = len(pls) - len(pls) % u
            tagged.extend((d_t, s_t, p) for p in pls[:whole])
            orphans.extend((d_t, s_t, p) for p in pls[whole:])
        orphans.extend((d_t, 0, zplane)
                       for _ in range((-len(orphans)) % u))
        tagged.extend(orphans)
    dst = np.array([d for d, _, _ in tagged], np.int32)
    src = np.array([s for _, s, _ in tagged], np.int32)
    first = np.ones(dst.size, np.int32)
    first[1:] = (dst[1:] != dst[:-1]).astype(np.int32)
    arrs = {k: np.stack([p[i] for _, _, p in tagged])
            for i, k in enumerate(("a", "b", "c", "v"))}
    side_idx = (np.concatenate(side_parts) if side_parts
                else np.zeros(0, np.int64))
    arrs.update(q=q_pad, qt=qt, tiles=tiles_n,
                tags=np.stack([src, dst, first]),
                shape=(m, n), n_planes=len(tagged),
                spill_planes=n_spill, collect=collect,
                touched=touched,
                side=_side_coo(rows, cols, vals_all, side_idx))
    return arrs


def route_gather_reference(x, route):
    """Numpy 3-stage simulation of the routed SpMV (test oracle)."""
    m, n = route["shape"]
    q = route["q"]
    xt = np.zeros(q * LANE, np.float64)
    xt[:n] = np.asarray(x, np.float64)
    tags = route.get("tags")
    if tags is None:
        xt = xt.reshape(q, LANE)
        acc = np.zeros((q, LANE), np.float64)
        for a, b, c, v in zip(route["a"], route["b"], route["c"],
                              route["v"]):
            ta = np.take_along_axis(xt, a, axis=1)
            tb = np.take_along_axis(ta.T, b, axis=1).T
            g = np.take_along_axis(tb, c, axis=1)
            acc += v * g
    else:
        qt, tiles = route["qt"], route["tiles"]
        xt = xt.reshape(tiles, qt, LANE)
        acc = np.zeros((tiles, qt, LANE), np.float64)
        for a, b, c, v, (s_t, d_t, _) in zip(
                route["a"], route["b"], route["c"], route["v"], tags.T):
            ta = np.take_along_axis(xt[s_t], a, axis=1)
            tb = np.take_along_axis(ta.T, b, axis=1).T
            g = np.take_along_axis(tb, c, axis=1)
            acc[d_t] += v * g
    side = route.get("side")
    if side is not None:
        o, i, sv = side
        np.add.at(acc.reshape(-1), o, sv * xt.reshape(-1)[i])
    if route.get("collect") is not None:
        # tile padding may extend the table beyond the collect matrix's
        # column count; the extra positions are never written
        n_coll = route["collect"]["shape"][1]
        return route_gather_reference(acc.reshape(-1)[:n_coll],
                                      route["collect"])
    return acc.reshape(-1)[:m]


# ---------------------------------------------------------------------------
# device kernel
# ---------------------------------------------------------------------------

# Hard Mosaic geometry constraint (measured on chip, 2026-08-19): the
# middle stage gathers along the table-row axis of the transposed tile
# ``(LANE, q)``, and ``tpu.dynamic_gather`` requires the gathered
# dimension to fit a SINGLE vreg — 128 lanes.  Any q > 128 fails
# apply-vector-layout with "Not implemented: Multiple source vregs along
# gather dimension" (an error the chip-free ``.lower()`` regression does
# NOT catch — it stops before the Mosaic backend passes).  Tables are
# therefore built from native 128x128 tiles: a single-tile table is one
# (128, LANE) tile, and everything larger runs the tiled kernel with
# qt = 128.  VMEM is nowhere near binding at this geometry (~160 KB per
# double-buffered plane step).
_ROUTED_TILE_Q = LANE

# independent gather chains per tiled-kernel grid step: one 3-gather +
# 2-transpose chain is latency-bound (measured 666 ns per 128x128 plane
# on the v5e), so the kernel unrolls this many chains per step.  Each
# step's chains share ONE dst tile (single revolving-block accumulate)
# but read per-chain src tiles, so the builder pads per dst GROUP —
# typically many src pools wide — not per (dst, src) pool.  Swept
# on-chip 2026-08-19 (scripts_unroll_sweep.py, slope-timed on the bench
# 1.95M-nnz matrix): u=2 580 ns/plane, u=3 528 ns/plane (best pair
# time), u=4 542 ns/plane + the most group-tail padding.
_PLANE_UNROLL = 3

# test hook: force interpreter mode off-TPU (mirrors cp_windowed)
_FORCE_INTERPRET = False


def routed_q_limit() -> int:
    """Largest table sublane count q of a single-tile (VMEM-resident)
    table: one native 128x128 tile — the Mosaic dynamic_gather single
    vreg bound, see ``_ROUTED_TILE_Q``."""
    return _ROUTED_TILE_Q


def _tiled_qt() -> int:
    """Tile sublane count for tables beyond the single-tile limit: the
    same 128-row Mosaic gather bound (also a multiple of 32, so the int8
    plane blocks stay sublane-tile-aligned)."""
    return _ROUTED_TILE_Q


def _dyn_gather(x, idx, axis):
    """``take_along_axis`` built directly on ``lax.gather`` with i32
    indices: ``jnp.take_along_axis`` promotes its index computation to
    i64 under ``jax_enable_x64`` and Mosaic rejects 64-bit types, while
    these exact dimension-number forms are the two the Mosaic lowering
    maps onto ``tpu.dynamic_gather``."""
    from jax import lax

    batch = 1 - axis
    dn = lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(axis,),
        start_index_map=(axis,), operand_batching_dims=(batch,),
        start_indices_batching_dims=(batch,))
    return lax.gather(x, idx.astype(jnp.int32)[..., None], dn, (1, 1),
                      mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _routed_kernel(x_ref, a_ref, b_ref, c_ref, v_ref, o_ref):
    from jax.experimental import pallas as pl

    p = pl.program_id(0)

    @pl.when(p == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    # middle stage transposed: lane gather over tAᵀ with the
    # pre-transposed B plane (multi-vreg sublane gathers do not lower)
    ta = _dyn_gather(x_ref[...], a_ref[0], axis=1)
    tb = _dyn_gather(ta.T, b_ref[0], axis=1).T
    g = _dyn_gather(tb, c_ref[0], axis=1)
    # value planes may be stored bf16; accumulate at table precision
    # (mirrors DiaMatrix._vals_f: bf16 is a storage format, not a
    # compute format)
    o_ref[...] += v_ref[0].astype(o_ref.dtype) * g


@functools.partial(jax.jit, static_argnames=("q", "n_planes", "interpret"))
def _routed_spmv_call(xt, a, b, c, v, q, n_planes, interpret=False):
    from jax.experimental import pallas as pl

    i32 = jnp.int32
    grid = (n_planes,)
    plane_spec = pl.BlockSpec((1, q, LANE),
                              lambda p: (i32(p), i32(0), i32(0)))
    # the B plane is stored transposed (LANE, q)
    plane_spec_t = pl.BlockSpec((1, LANE, q),
                                lambda p: (i32(p), i32(0), i32(0)))
    fixed_spec = pl.BlockSpec((q, LANE), lambda p: (i32(0), i32(0)))
    slot_bytes = (a.dtype.itemsize + b.dtype.itemsize + c.dtype.itemsize
                  + v.dtype.itemsize)
    call = pl.pallas_call(
        _routed_kernel,
        grid=grid,
        in_specs=[fixed_spec, plane_spec, plane_spec_t, plane_spec,
                  plane_spec],
        out_specs=fixed_spec,
        out_shape=jax.ShapeDtypeStruct((q, LANE), xt.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_planes * q * LANE,
            bytes_accessed=n_planes * q * LANE * slot_bytes
            + 2 * q * LANE * 4,
            transcendentals=0,
        ),
    )
    return call(xt, a, b, c, v)


def _make_tiled_kernel(u):
    """Tiled routed kernel: ``u`` gather chains per step, ONE dst tile.

    Every step's planes share one output tile (build_routes orders
    planes dst-grouped), so the accumulate is a single revolving-block
    RMW — but each chain reads its OWN source tile (per-chain
    scalar-prefetched ``src`` tags), which lets the latency-bound
    3-gather + 2-transpose chains interleave across a dst group's many
    src pools.  A dynamic per-chain dst (full read-modify-write of a
    (qt, LANE) slab per chain) was measured strictly worse: 666 ns/plane
    at u=4 vs 593 ns/plane for shared-dst pairs at u=2 — the 64 KB
    VMEM↔vreg round-trip per chain swamps the ILP gain."""
    from jax.experimental import pallas as pl

    def kernel(s_ref, d_ref, f_ref, *refs):
        del s_ref, d_ref  # consumed by the x-tile / output index maps
        x_refs = refs[:u]
        a_ref, b_ref, c_ref, v_ref, o_ref = refs[u:]
        p = pl.program_id(0)

        # first visit of this output tile (planes are dst-grouped, so
        # each tile is one contiguous run and the accumulator stays
        # VMEM-resident for the whole run)
        @pl.when(f_ref[p] == 1)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        acc = None
        for uu in range(u):
            ta = _dyn_gather(x_refs[uu][0], a_ref[uu], axis=1)
            tb = _dyn_gather(ta.T, b_ref[uu], axis=1).T
            g = _dyn_gather(tb, c_ref[uu], axis=1)
            term = v_ref[uu].astype(o_ref.dtype) * g
            acc = term if acc is None else acc + term
        o_ref[...] += acc[None]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("qt", "tiles", "n_planes", "interpret"))
def _routed_tiled_spmv_call(xt, a, b, c, v, src, dst, first, qt, tiles,
                            n_planes, interpret=False):
    """Tiled-table routed SpMV: ``xt`` is ``(tiles, qt, LANE)`` in HBM;
    each chain's source tile and each step's destination tile come from
    scalar-prefetched tags (the same mechanism as the BSR kernel's
    tile-column ids), so the grid stays one-dimensional over planes
    while the table exceeds VMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i32 = jnp.int32
    u = _PLANE_UNROLL if n_planes % _PLANE_UNROLL == 0 else 1
    plane_spec = pl.BlockSpec(
        (u, qt, LANE), lambda p, s, d, f: (i32(p), i32(0), i32(0)))
    plane_spec_t = pl.BlockSpec(
        (u, LANE, qt), lambda p, s, d, f: (i32(p), i32(0), i32(0)))

    def x_map(uu):
        return lambda p, s, d, f: (s[p * i32(u) + i32(uu)], i32(0),
                                   i32(0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_planes // u,),
        in_specs=[
            *(pl.BlockSpec((1, qt, LANE), x_map(uu)) for uu in range(u)),
            plane_spec, plane_spec_t, plane_spec, plane_spec,
        ],
        out_specs=pl.BlockSpec((1, qt, LANE),
                               lambda p, s, d, f: (d[p], i32(0), i32(0))),
    )
    slot_bytes = (a.dtype.itemsize + b.dtype.itemsize + c.dtype.itemsize
                  + v.dtype.itemsize)
    call = pl.pallas_call(
        _make_tiled_kernel(u),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tiles, qt, LANE), xt.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_planes * qt * LANE,
            bytes_accessed=n_planes * qt * LANE * slot_bytes
            + 2 * tiles * qt * LANE * 4,
            transcendentals=0,
        ),
    )
    # src tags are per PLANE (chains read distinct source tiles); dst
    # and first-visit tags are per STEP (dst groups are padded to the
    # unroll quantum, so group boundaries are step-aligned)
    return call(src, dst[::u], first[::u], *([xt] * u), a, b, c, v)


def _as_table(x, q, dtype):
    xt = jnp.zeros((q * LANE,), dtype)
    xt = xt.at[: x.shape[0]].set(x.astype(dtype))
    return xt.reshape(q, LANE)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("a", "b", "c", "v", "at", "bt", "ct", "vt",
                 "tags", "tags_t", "coll", "coll_t",
                 "side", "side_t", "touched", "touched_t"),
    meta_fields=("q", "qt", "tiles", "tiles_t", "coll_tiles",
                 "coll_tiles_t", "nrows", "ncols", "true_nnz"),
)
@dataclasses.dataclass(frozen=True)
class RoutedEllMatrix:
    """Unstructured sparse operator backed by the routed-gather kernel.

    Both orientations carry their own route stacks over the same table
    geometry (``q`` covers ``max(nrows, ncols)`` plus any virtual-row
    slots).  When the builder split wide rows, ``coll``/``coll_t`` hold
    the collect route stacks ``(a, b, c, v, tags)`` summing virtual
    partials back into real rows (``None`` otherwise).  The auxiliary
    reductions (`abs_power_*`) never gather beyond the collect — the
    value planes are already laid out per output slot.

    Tables beyond the single-tile VMEM limit are TILED: ``tiles > 1``,
    the plane arrays are ``(P, q/tiles, LANE)``, and ``tags`` carries the
    per-plane ``(src_tile, dst_tile, first_visit)`` rows consumed by the
    scalar-prefetch kernel (``None`` when the table fits one tile).
    """

    a: jax.Array   # (P, tile_q, LANE) i32 — stage-A lane shuffle
    b: jax.Array   # (P, tile_q, LANE) i32 — stage-B sublane gather
    c: jax.Array   # (P, tile_q, LANE) i32 — stage-C lane shuffle
    v: jax.Array   # (P, tile_q, LANE) values at output slots
    at: jax.Array  # transpose orientation
    bt: jax.Array
    ct: jax.Array
    vt: jax.Array
    tags: jax.Array | None    # (3, P) i32 (src, dst, first) — tiled only
    tags_t: jax.Array | None
    # chain of (a, b, c, v, tags, side, touched) collect stacks
    coll: tuple | None
    coll_t: tuple | None
    # COO fallback (out positions, in positions, values) for demands the
    # router spilled below the overflow-plane crossover (see _route_pool)
    side: tuple | None
    side_t: tuple | None
    # (tiles,) 0/1 mask when some table tiles are written by no plane
    # (their pallas output is garbage and is where-selected to zero)
    touched: jax.Array | None
    touched_t: jax.Array | None
    q: int   # forward table rows incl. virtual-row and tile padding
    qt: int  # transpose table rows (orientations grow independently)
    tiles: int        # forward table tiles (1 = single VMEM-resident tile)
    tiles_t: int
    coll_tiles: tuple | None    # per-collect-stack tile counts
    coll_tiles_t: tuple | None
    nrows: int
    ncols: int
    true_nnz: int

    @property
    def shape(self):
        return (self.nrows, self.ncols)

    @property
    def nnz_padded(self):
        n = self.v.size + self.vt.size
        for chain in (self.coll, self.coll_t):
            for stack in chain or ():
                n += stack[3].size
        return n

    @property
    def side_nnz(self):
        """Demands served by the XLA COO fallback (both orientations
        plus their collect chains); priced at the XLA gather cost."""
        n = 0
        for s in (self.side, self.side_t):
            n += 0 if s is None else int(s[0].shape[0])
        for chain in (self.coll, self.coll_t):
            for stack in chain or ():
                if stack[5] is not None:
                    n += int(stack[5][0].shape[0])
        return n

    def _interpret(self) -> bool:
        return _FORCE_INTERPRET or jax.default_backend() != "tpu"

    def _apply_stack(self, flat, a, b, c, v, tags, tiles, side=None,
                     touched=None):
        """One routed gather pass over a flat (positions,) vector."""
        tq = int(a.shape[1])
        if tags is None:
            out = _routed_spmv_call(flat.reshape(tq, LANE), a, b, c,
                                    v.astype(flat.dtype), tq,
                                    int(a.shape[0]),
                                    interpret=self._interpret())
        else:
            out = _routed_tiled_spmv_call(
                flat.reshape(tiles, tq, LANE), a, b, c,
                v.astype(flat.dtype), tags[0], tags[1], tags[2],
                tq, tiles, int(a.shape[0]), interpret=self._interpret())
            if touched is not None:
                # tiles no plane wrote hold uninitialized memory
                out = jnp.where(touched[:, None, None] > 0, out,
                                jnp.zeros((), out.dtype))
        out = out.reshape(-1)
        if side is not None:
            o, i, sv = side
            out = out.at[o].add(sv.astype(out.dtype) * flat[i])
        return out

    def _compute_dtype(self):
        # bf16 is a storage format: gather/accumulate at f32
        return (jnp.float32 if self.v.dtype == jnp.bfloat16
                else self.v.dtype)

    def _collect(self, flat, chain, chain_tiles):
        """Apply the collect chain to a flat partial-sum table."""
        for stack, tiles in zip(chain or (), chain_tiles or ()):
            a, b, c, v, tags, side, touched = stack
            flat = self._apply_stack(flat[: a.shape[1] * LANE * tiles],
                                     a, b, c, v, tags, tiles,
                                     side=side, touched=touched)
        return flat

    def _spmv(self, x, a, b, c, v, tags, tiles, n_out, chain, chain_tiles,
              q, side=None, touched=None):
        xt = _as_table(x, q, self._compute_dtype()).reshape(-1)
        out = self._apply_stack(xt, a, b, c, v, tags, tiles, side=side,
                                touched=touched)
        out = self._collect(out, chain, chain_tiles)
        return out[:n_out].astype(x.dtype)

    def matvec(self, x: jax.Array) -> jax.Array:
        return self._spmv(x, self.a, self.b, self.c, self.v, self.tags,
                          self.tiles, self.nrows, self.coll,
                          self.coll_tiles, self.q, side=self.side,
                          touched=self.touched)

    def rmatvec(self, y: jax.Array) -> jax.Array:
        return self._spmv(y, self.at, self.bt, self.ct, self.vt,
                          self.tags_t, self.tiles_t, self.ncols,
                          self.coll_t, self.coll_tiles_t, self.qt,
                          side=self.side_t, touched=self.touched_t)

    def _plane_sum(self, planes, tags, tiles):
        """Sum value planes into their output slots (tile-aware)."""
        if tags is None:
            return jnp.sum(planes, axis=0).reshape(-1)
        acc = jnp.zeros((tiles,) + planes.shape[1:], planes.dtype)
        return acc.at[tags[1]].add(planes).reshape(-1)

    def abs_power_rowsum(self, p: float) -> jax.Array:
        from ..problem import abs_pow0

        s = self._plane_sum(
            abs_pow0(self.v.astype(self._compute_dtype()), p),
            self.tags, self.tiles)
        if self.side is not None:
            o, _, sv = self.side
            s = s.at[o].add(abs_pow0(sv.astype(s.dtype), p))
        s = self._collect(s, self.coll, self.coll_tiles)
        return s[: self.nrows]

    def abs_power_colsum(self, p: float) -> jax.Array:
        from ..problem import abs_pow0

        s = self._plane_sum(
            abs_pow0(self.vt.astype(self._compute_dtype()), p),
            self.tags_t, self.tiles_t)
        if self.side_t is not None:
            o, _, sv = self.side_t
            s = s.at[o].add(abs_pow0(sv.astype(s.dtype), p))
        s = self._collect(s, self.coll_t, self.coll_tiles_t)
        return s[: self.ncols]

    def sq_rowsum_weighted(self, d: jax.Array) -> jax.Array:
        v2 = self.v.astype(self._compute_dtype()) ** 2
        side2 = (None if self.side is None else
                 (self.side[0], self.side[1],
                  self.side[2].astype(self._compute_dtype()) ** 2))
        return self._spmv(d, self.a, self.b, self.c, v2, self.tags,
                          self.tiles, self.nrows, self.coll,
                          self.coll_tiles, self.q, side=side2,
                          touched=self.touched)

    def to_scipy(self) -> scipy.sparse.csr_matrix:
        """Decode the forward routes back into the original matrix
        (explicit-zero entries are not representable and drop out)."""

        def decode(A, B, C, V, s_t, d_t, tq):
            """One plane -> (global out positions, global in positions,
            values); ``s_t``/``d_t`` offset tile-local coordinates."""
            so, lo = np.nonzero(V)
            # the device planes store narrow dtypes (int8 lanes, int16
            # sublanes): widen before any position arithmetic.  B is
            # stored pre-transposed (LANE, q): b[λ, so] = sx.
            lam = C[so, lo].astype(np.int64)
            sx = B[lam, so].astype(np.int64)
            lx = A[sx, lam].astype(np.int64)
            outp = (d_t * tq + so).astype(np.int64) * LANE + lo
            inp = (s_t * tq + sx) * LANE + lx
            return outp, inp, np.asarray(V[so, lo], np.float64)

        def plane_iter(a, b, c, v, tags):
            ts = (np.asarray(tags).T if tags is not None
                  else [(0, 0, 1)] * a.shape[0])
            tq = a.shape[1]
            for A, B, C, V, (s_t, d_t, _) in zip(
                    np.asarray(a), np.asarray(b), np.asarray(c),
                    np.asarray(v), ts):
                yield decode(A, B, C, V, s_t, d_t, tq)

        # slot -> real row, composed through the collect chain (virtual
        # rows live beyond nrows until collected)
        size = self.q * LANE
        total = np.arange(size)
        for stack in self.coll or ():
            step = np.full(size, -1, np.int64)
            for outp, inp, _ in plane_iter(*stack[:5]):
                step[inp] = outp
            if stack[5] is not None:  # COO side demands route too
                o, i, _ = (np.asarray(t) for t in stack[5])
                step[i] = o
            # positions already unrouted (-1) must stay -1, not index
            # step[] — possible from chain depth 2 onward
            total = np.where(total >= 0,
                             step[np.clip(total, 0, size - 1)], -1)
        rows, cols, vals = [], [], []
        for outp, inp, val in plane_iter(self.a, self.b, self.c, self.v,
                                         self.tags):
            rows.append(total[outp])
            cols.append(inp)
            vals.append(val)
        if self.side is not None:
            o, i, sv = (np.asarray(t) for t in self.side)
            rows.append(total[o])
            cols.append(i.astype(np.int64))
            vals.append(sv.astype(np.float64))
        return scipy.sparse.csr_matrix(
            (np.concatenate(vals),
             (np.concatenate(rows), np.concatenate(cols))),
            shape=self.shape)

    def to_dense(self) -> jax.Array:
        """Densify (small problems only): used by the MXU Cholesky paths."""
        return jnp.asarray(self.to_scipy().toarray(), self.v.dtype)

    @staticmethod
    def from_scipy(m, dtype=None, seed=0, qt=None) -> "RoutedEllMatrix":
        from ..problem import default_dtype

        dtype = dtype or default_dtype()
        csr = scipy.sparse.csr_matrix(m)
        # reject clearly (before the expensive host routing) what the
        # kernel could never run: an oversized table or a Mosaic-illegal
        # value dtype on the real chip — failing later inside Mosaic
        # surfaces as an opaque VMEM/type error
        if not routed_ell_eligible(csr.shape, dtype=dtype):
            q = max(-(-csr.shape[0] // LANE), -(-csr.shape[1] // LANE), 1)
            raise ValueError(
                f"routed ELL ineligible: shape {csr.shape} needs q={q} "
                f"(tiled limit {_TILED_MAX_Q}), dtype "
                f"{np.dtype(dtype).name} (TPU kernel supports f32/bf16)")
        fwd = build_routes(csr, seed=seed, qt=qt)
        bwd = build_routes(csr.T.tocsr(), seed=seed, qt=qt)

        # bf16-exact value storage (mirrors DiaMatrix.from_scipy): the
        # value planes are pure streaming traffic, exact halving is free
        if dtype == jnp.float32 and csr.nnz:
            import ml_dtypes

            d32 = csr.data.astype(np.float32)
            if bool(np.all(d32.astype(ml_dtypes.bfloat16)
                           .astype(np.float32) == d32)):
                dtype = jnp.bfloat16

        def narrow(route):
            """Device dtypes: a/c hold lane indices (< 128, int8), b
            holds table-local sublane indices (< qt <= 32k, int16)."""
            return (jnp.asarray(route["a"], jnp.int8),
                    jnp.asarray(route["b"], jnp.int16),
                    jnp.asarray(route["c"], jnp.int8),
                    jnp.asarray(route["v"], dtype))

        def side_of(route):
            s = route.get("side")
            if s is None:
                return None
            o, i, sv = s
            return (jnp.asarray(o, jnp.int32), jnp.asarray(i, jnp.int32),
                    jnp.asarray(sv, dtype))

        def touched_of(route):
            t = route.get("touched")
            return None if t is None else jnp.asarray(t, jnp.float32)

        def chain_of(route):
            out, out_tiles = [], []
            coll = route.get("collect")
            while coll is not None:
                tags = coll.get("tags")
                out.append(narrow(coll)
                           + (None if tags is None else jnp.asarray(tags),
                              side_of(coll), touched_of(coll)))
                out_tiles.append(coll.get("tiles", 1))
                coll = coll.get("collect")
            return (tuple(out) or None), (tuple(out_tiles) or None)

        coll_f, coll_f_tiles = chain_of(fwd)
        coll_b, coll_b_tiles = chain_of(bwd)
        ftags, btags = fwd.get("tags"), bwd.get("tags")
        fa, fb, fc, fv = narrow(fwd)
        ba, bb, bc, bv = narrow(bwd)
        return RoutedEllMatrix(
            a=fa, b=fb, c=fc, v=fv,
            at=ba, bt=bb, ct=bc, vt=bv,
            tags=None if ftags is None else jnp.asarray(ftags),
            tags_t=None if btags is None else jnp.asarray(btags),
            coll=coll_f, coll_t=coll_b,
            side=side_of(fwd), side_t=side_of(bwd),
            touched=touched_of(fwd), touched_t=touched_of(bwd),
            q=fwd["q"], qt=bwd["q"],
            tiles=fwd.get("tiles", 1), tiles_t=bwd.get("tiles", 1),
            coll_tiles=coll_f_tiles, coll_tiles_t=coll_b_tiles,
            nrows=csr.shape[0],
            ncols=csr.shape[1], true_nnz=int(csr.nnz),
        )


def routed_ell_eligible(csr_shape, q=None, dtype=None) -> bool:
    """Geometry gate: single-tile tables must fit VMEM; larger tables run
    tiled up to ``_TILED_MAX_Q`` rows.  The value dtype must be
    Mosaic-legal when running on the real chip."""
    m, n = csr_shape
    q = q or max(-(-m // LANE), -(-n // LANE), 1)
    if q > _TILED_MAX_Q:
        return False
    if dtype is not None and not (_FORCE_INTERPRET
                                  or jax.default_backend() != "tpu"):
        if dtype not in (jnp.float32, jnp.bfloat16):
            return False
    return True


# effective bytes per padded plane slot per SpMV direction pair,
# CALIBRATED ON CHIP 2026-08-19 on the bench's 150k x 100k / 1.95M-nnz
# uniform-random matrix (25.31M padded slots, v5e over the axon
# tunnel), two measurements:
#   * standalone probe (scripts_routed_probe.py), bare matvec+rmatvec
#     chain: 1527.8 us/pair = 56.25 B/slot at the 932 GB/s observed HBM
#     ceiling;
#   * END-TO-END inside the fused CP iteration (the traffic the chooser
#     actually prices): 747.3 us/iter including ~12 us of vector passes
#     over 20.64M padded slots = 33.2 B/slot — measured AFTER the
#     tail-fold transform + 2-plane chain pairing landed (the pre-fold
#     layout measured 37.5 B/slot over 25.3M slots; both the slot count
#     and the per-slot cost improved).
# The constant uses the end-to-end figure with ~4% optimism headroom so
# bench rooflines priced by it remain true floors (frac <= 1
# falsifiable).  The streamed plane traffic alone is only ~8 B/slot
# (int8 lanes + int16 sublanes + f32 values); the rest is per-plane
# issue overhead (3 dynamic_gathers + 2 transposes + tile DMA latency
# per 128x128 plane step), so the constant prices COMPUTE at byte
# equivalence, exactly like ELL_GATHER_BYTES_PER_NNZ does for the XLA
# gather paths.  Same probe, same matrix, fallback SegmentedEllMatrix:
# 32 691 us/pair — the routed kernel is 21-44x faster where both apply.
ROUTED_ELL_BYTES_PER_SLOT = 32
# auto-selection gate: ON since the 2026-08-19 on-chip calibration;
# prefer="routed" forces the backend regardless
ROUTED_ELL_ENABLED = True

# spill-plane packing margin observed on uniform random matrices
# (41 planes vs the 32-plane bound at 2M nnz → ~1.3)
_ROUTED_PACKING_FACTOR = 1.35


def _orientation_cost_rows(cnt, m, n, q, nnz):
    """Estimated (planes x table rows) for one orientation, including
    the virtual-row split option — the same model _split_plan optimizes,
    so the chooser prices what the builder will actually do."""
    if nnz == 0:
        return q
    k_max = int(cnt.max())
    src_bound = -(-nnz // (max(-(-n // LANE), 1) * LANE))
    base = max(k_max, src_bound) * q
    target, q_eff = _split_plan(cnt, m, q, nnz, max(-(-n // LANE), 1))
    if target is None:
        return base
    split = (max(target, src_bound) + -(-k_max // target) + 1) * q_eff
    return min(base, split)


def _tiled_orientation_cost_rows(rows, cols, q, qt):
    """Estimated (planes x qt rows) for one orientation of a TILED
    table: planes are pair-granular, so each (dst-tile, src-tile) pair
    costs its own max per-row entry count (or its source-capacity
    bound), with the tail-fold transform approximated in closed form —
    pools capped at 4 occurrence layers, the capped tails repriced as
    ~packed virtual-slot planes plus a collect pass (the builder's
    :func:`_tiled_transform` search realizes or beats this)."""
    tiles_n = -(-q // qt)
    tsz = qt * LANE
    st = (cols // LANE) // qt
    # per-(row, src-tile) entry counts -> per-pair maxima
    key = rows.astype(np.int64) * tiles_n + st
    uk, cts = np.unique(key, return_counts=True)
    pair = ((uk // tiles_n) // tsz) * tiles_n + uk % tiles_n
    pmax = np.zeros(tiles_n * tiles_n, np.int64)
    np.maximum.at(pmax, pair, cts)
    pnnz = np.zeros(tiles_n * tiles_n, np.int64)
    np.add.at(pnnz, pair, cts)
    src_bound = -(-pnnz // tsz)
    flat = int(np.maximum(pmax, src_bound).sum())
    cap = 4
    over = int(np.maximum(cts - cap, 0).sum())
    n_j = int(np.unique(pair // tiles_n).size)
    n_s = int(np.unique(pair % tiles_n).size)
    folded = (int(np.maximum(np.minimum(pmax, cap), src_bound).sum())
              + 2 * (-(-over // tsz)) * min(n_j + n_s, 16)  # tails+collect
              + -(-rows.size // tsz))                       # identity pass
    planes = min(flat, folded) if over else flat
    # dst-grouped layout: no per-pool unroll padding, and zeroing planes
    # only for UNTOUCHED dst tiles (rare on real demand sets) — group
    # padding (< _PLANE_UNROLL per touched tile) rides the packing factor
    return planes * qt


def routed_cost_estimate(csr) -> int:
    """Cheap (no routing) effective-bytes estimate for the chooser."""
    csr = scipy.sparse.csr_matrix(csr)
    m, n = csr.shape
    q = max(-(-m // LANE), -(-n // LANE), 1)
    if q > routed_q_limit():
        qt = _tiled_qt()
        rows = np.repeat(np.arange(m), np.diff(csr.indptr))
        cols = csr.indices.astype(np.int64)
        rows_fwd = _tiled_orientation_cost_rows(rows, cols, q, qt)
        rows_bwd = _tiled_orientation_cost_rows(cols, rows, q, qt)
    else:
        # the builder pads single-tile tables to one full 128-row tile
        # (native Mosaic transpose geometry) — price the padded planes
        q = routed_q_limit()
        cnt = np.diff(csr.indptr)
        ccnt = (np.bincount(csr.indices, minlength=n) if csr.nnz
                else np.zeros(1, np.int64))
        rows_fwd = _orientation_cost_rows(cnt, m, n, q, csr.nnz)
        rows_bwd = _orientation_cost_rows(ccnt, n, m, q, csr.nnz)
    slots = (rows_fwd + rows_bwd) * LANE * _ROUTED_PACKING_FACTOR
    return int(slots * ROUTED_ELL_BYTES_PER_SLOT)
