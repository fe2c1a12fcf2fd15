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

for a per-demand intermediate lane ``λ`` chosen at *lowering time* (the
sparsity pattern is static) such that no two distinct elements claim the
same A-slot ``(sx, λ)`` or B-slot ``(so, λ)``.  Demands for the same
element multicast for free: within an output row through stage C, and
across output rows through stage B reading one A-slot.  The greedy
host-side colorer below assigns λs plane by plane; demands it cannot
place within 128 lanes spill to overflow planes (for uniform random
sparsity spills are rare — the expected free-lane count at a conflicted
demand is ``128·e^{-2} ≈ 17``).

The SpMV then runs as one ``pallas_call`` over ELL planes: the dense
vector sits VMEM-resident while each plane streams three i32 index
tiles and one value tile from HBM and issues three ``dynamic_gather``s
plus a multiply-accumulate — ~16 bytes of HBM traffic per (padded)
nonzero instead of the ~2000-byte effective cost of the XLA gather.

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

    spilled = np.zeros(nd, bool)
    spilled[unassigned] = True

    placed = np.nonzero(~spilled)[0]
    a = np.zeros((q, LANE), np.int32)
    b = np.zeros((q, LANE), np.int32)
    c = np.zeros((q, LANE), np.int32)
    v = np.zeros((q, LANE), np.float64)
    pl_, pso, plo = lam[placed], so[placed], lo[placed]
    a[sx[placed], pl_] = lx[placed]
    b[pso, pl_] = sx[placed]
    c[pso, plo] = pl_
    v[pso, plo] = vals[placed]
    return a, b, c, v, spilled


def _ragged_arange(counts):
    """[0..counts[0]), [0..counts[1]), ... concatenated."""
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64)
    ends = np.cumsum(counts)
    return np.arange(total) - np.repeat(ends - counts, counts)


def _split_plan(cnt, m, q, nnz, n_src_rows):
    """Pick a virtual-row split target minimizing estimated route cost
    (planes x table rows — virtual slots may grow the table).

    Returns ``(target, q_eff)`` or ``(None, q)`` when leaving wide rows
    unsplit is estimated cheaper."""
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
        if q_eff > routed_q_limit():
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


def build_routes(csr, seed=0, split=True, _depth=0):
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
    """
    csr = scipy.sparse.csr_matrix(csr)
    csr.sum_duplicates()
    m, n = csr.shape
    q = max(-(-m // LANE), -(-n // LANE), 1)
    rng = np.random.RandomState(seed)

    cnt = np.diff(csr.indptr)
    nnz = csr.nnz
    if nnz == 0:
        z = np.zeros((1, q, LANE), np.int32)
        return {"a": z, "b": z.copy(), "c": z.copy(),
                "v": np.zeros((1, q, LANE), np.float64), "q": q,
                "shape": (m, n), "n_planes": 1, "spill_planes": 0,
                "collect": None}
    rows = np.repeat(np.arange(m), cnt)
    pos = np.arange(nnz) - np.repeat(csr.indptr[:-1], cnt)

    collect = None
    target = None
    if split and _depth < 2:
        target, q = _split_plan(cnt, m, q, nnz, max(-(-n // LANE), 1))
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
        collect = build_routes(c_mat, seed=seed + 1, _depth=_depth + 1)
        assert collect["q"] == q, "collect shares the table geometry"
        rows, cnt = rows_eff, cnt_eff

    cols = csr.indices.astype(np.int64)
    so_all = (rows // LANE).astype(np.int32)
    lo_all = (rows % LANE).astype(np.int32)
    sx_all = (cols // LANE).astype(np.int32)
    lx_all = (cols % LANE).astype(np.int32)
    vals_all = csr.data.astype(np.float64)

    # plane = per-row entry position ROTATED by a per-row hash: raw
    # column-sorted positions concentrate each plane's gathers in one
    # column region (plane 0 = every row's smallest column), overloading
    # the 128 A-slots of the busy source rows — measured 32% structural
    # spill on a 2M-nnz uniform random matrix, vs ~2% rotated.
    # (indexed per entry, NOT np.repeat(cnt, cnt): after virtual-row
    # splitting the entry order is no longer row-major)
    cnt_rep = np.maximum(cnt, 1)[rows]
    rot = (rows.astype(np.int64) * 40503) % cnt_rep
    plane0 = ((pos + rot) % cnt_rep).astype(np.int64)
    k_max = int(plane0.max()) + 1 if nnz else 1
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
    while pending_sel or spill_pool:
        if not pending_sel:
            # merge every plane's spills into as few overflow planes as
            # possible (routing them per source plane wastes mostly-empty
            # (q, LANE) tiles)
            if spill_planes >= _MAX_SPILL_PLANES:
                raise RuntimeError(
                    f"gather routing did not converge: "
                    f"{sum(s.size for s in spill_pool)} demands left "
                    f"after {_MAX_SPILL_PLANES} spill planes")
            merged = bin_by_row_occurrence(np.concatenate(spill_pool))
            spill_pool = []
            spill_planes += len(merged)
            pending_sel.extend(merged)
        sel = pending_sel.pop(0)
        a, b, c, v, spilled = _route_plane(
            so_all[sel], lo_all[sel], sx_all[sel], lx_all[sel],
            vals_all[sel], q, rng)
        planes.append((a, b, c, v))
        sp = sel[spilled]
        if sp.size:
            spill_pool.append(sp)
    arrs = {k: np.stack([p[i] for p in planes])
            for i, k in enumerate(("a", "b", "c", "v"))}
    arrs.update(q=q, shape=(m, n), n_planes=len(planes),
                spill_planes=len(planes) - k_max, collect=collect)
    return arrs


def route_gather_reference(x, route):
    """Numpy 3-stage simulation of the routed SpMV (test oracle)."""
    m, n = route["shape"]
    q = route["q"]
    xt = np.zeros(q * LANE, np.float64)
    xt[:n] = np.asarray(x, np.float64)
    xt = xt.reshape(q, LANE)
    acc = np.zeros((q, LANE), np.float64)
    for a, b, c, v in zip(route["a"], route["b"], route["c"], route["v"]):
        ta = np.take_along_axis(xt, a, axis=1)
        tb = np.take_along_axis(ta, b, axis=0)
        g = np.take_along_axis(tb, c, axis=1)
        acc += v * g
    if route.get("collect") is not None:
        return route_gather_reference(acc.reshape(-1), route["collect"])
    return acc.reshape(-1)[:m]


# ---------------------------------------------------------------------------
# device kernel
# ---------------------------------------------------------------------------

# VMEM budget for the plane pipeline: 4 double-buffered (q, LANE) blocks
# (a, b, c, v), the resident table and output, plus Mosaic stack
# temporaries for the three gather stages
_ROUTED_VMEM_BUDGET = 10 * 1024 * 1024
_BYTES_PER_Q_ROW = LANE * 4 * (4 * 2 + 2 + 3)

# test hook: force interpreter mode off-TPU (mirrors cp_windowed)
_FORCE_INTERPRET = False


def routed_q_limit() -> int:
    """Largest table sublane count q the plane pipeline can hold."""
    return _ROUTED_VMEM_BUDGET // _BYTES_PER_Q_ROW


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

    ta = _dyn_gather(x_ref[...], a_ref[0], axis=1)
    tb = _dyn_gather(ta, b_ref[0], axis=0)
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
    fixed_spec = pl.BlockSpec((q, LANE), lambda p: (i32(0), i32(0)))
    call = pl.pallas_call(
        _routed_kernel,
        grid=grid,
        in_specs=[fixed_spec, plane_spec, plane_spec, plane_spec,
                  plane_spec],
        out_specs=fixed_spec,
        out_shape=jax.ShapeDtypeStruct((q, LANE), xt.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_planes * q * LANE,
            bytes_accessed=n_planes * q * LANE * 16 + 2 * q * LANE * 4,
            transcendentals=0,
        ),
    )
    return call(xt, a, b, c, v)


def _as_table(x, q, dtype):
    xt = jnp.zeros((q * LANE,), dtype)
    xt = xt.at[: x.shape[0]].set(x.astype(dtype))
    return xt.reshape(q, LANE)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("a", "b", "c", "v", "at", "bt", "ct", "vt",
                 "coll", "coll_t"),
    meta_fields=("q", "qt", "nrows", "ncols", "true_nnz"),
)
@dataclasses.dataclass(frozen=True)
class RoutedEllMatrix:
    """Unstructured sparse operator backed by the routed-gather kernel.

    Both orientations carry their own route stacks over the same table
    geometry (``q`` covers ``max(nrows, ncols)`` plus any virtual-row
    slots).  When the builder split wide rows, ``coll``/``coll_t`` hold
    the collect route stacks ``(a, b, c, v)`` summing virtual partials
    back into real rows (``None`` otherwise).  The auxiliary reductions
    (`abs_power_*`) never gather beyond the collect — the value planes
    are already laid out per output slot.
    """

    a: jax.Array   # (P, q, LANE) i32 — stage-A lane shuffle
    b: jax.Array   # (P, q, LANE) i32 — stage-B sublane gather
    c: jax.Array   # (P, q, LANE) i32 — stage-C lane shuffle
    v: jax.Array   # (P, q, LANE) values at output slots
    at: jax.Array  # transpose orientation
    bt: jax.Array
    ct: jax.Array
    vt: jax.Array
    coll: tuple | None    # chain of (a, b, c, v) collect stacks
    coll_t: tuple | None
    q: int   # forward table rows (may exceed the geometric minimum
    qt: int  # by virtual-row slots; orientations grow independently)
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

    def _interpret(self) -> bool:
        return _FORCE_INTERPRET or jax.default_backend() != "tpu"

    def _compute_dtype(self):
        # bf16 is a storage format: gather/accumulate at f32
        return (jnp.float32 if self.v.dtype == jnp.bfloat16
                else self.v.dtype)

    def _collect(self, table, chain, q):
        """Apply the collect chain to a (q, LANE) partial-sum table."""
        for ca, cb, cc, cv in chain or ():
            table = _routed_spmv_call(table, ca, cb, cc,
                                      cv.astype(table.dtype), q,
                                      int(ca.shape[0]),
                                      interpret=self._interpret())
        return table

    def _spmv(self, x, a, b, c, v, n_out, chain, q):
        xt = _as_table(x, q, self._compute_dtype())
        out = _routed_spmv_call(xt, a, b, c, v, q, int(a.shape[0]),
                                interpret=self._interpret())
        out = self._collect(out, chain, q)
        return out.reshape(-1)[:n_out].astype(x.dtype)

    def matvec(self, x: jax.Array) -> jax.Array:
        return self._spmv(x, self.a, self.b, self.c, self.v, self.nrows,
                          self.coll, self.q)

    def rmatvec(self, y: jax.Array) -> jax.Array:
        return self._spmv(y, self.at, self.bt, self.ct, self.vt,
                          self.ncols, self.coll_t, self.qt)

    def abs_power_rowsum(self, p: float) -> jax.Array:
        s = jnp.sum(jnp.abs(self.v.astype(self._compute_dtype())) ** p,
                    axis=0)
        s = self._collect(s, self.coll, self.q)
        return s.reshape(-1)[: self.nrows]

    def abs_power_colsum(self, p: float) -> jax.Array:
        s = jnp.sum(jnp.abs(self.vt.astype(self._compute_dtype())) ** p,
                    axis=0)
        s = self._collect(s, self.coll_t, self.qt)
        return s.reshape(-1)[: self.ncols]

    def sq_rowsum_weighted(self, d: jax.Array) -> jax.Array:
        v2 = self.v.astype(self._compute_dtype()) ** 2
        return self._spmv(d, self.a, self.b, self.c, v2, self.nrows,
                          self.coll, self.q)

    def to_scipy(self) -> scipy.sparse.csr_matrix:
        """Decode the forward routes back into the original matrix
        (explicit-zero entries are not representable and drop out)."""
        # slot -> real row, composed through the collect chain (virtual
        # rows live beyond nrows until collected)
        size = self.q * LANE
        total = np.arange(size)
        for ca, cb, cc, cv in self.coll or ():
            step = np.full(size, -1, np.int64)
            for A, B, C, V in zip(np.asarray(ca), np.asarray(cb),
                                  np.asarray(cc), np.asarray(cv)):
                so, lo = np.nonzero(V)
                lam = C[so, lo]
                sx = B[so, lam]
                lx = A[sx, lam]
                step[sx.astype(np.int64) * LANE + lx] = so * LANE + lo
            total = step[total]
        rows, cols, vals = [], [], []
        for A, B, C, V in zip(np.asarray(self.a), np.asarray(self.b),
                              np.asarray(self.c), np.asarray(self.v)):
            so, lo = np.nonzero(V)
            lam = C[so, lo]
            sx = B[so, lam]
            lx = A[sx, lam]
            rows.append(total[so * LANE + lo])
            cols.append(sx.astype(np.int64) * LANE + lx)
            vals.append(V[so, lo])
        return scipy.sparse.csr_matrix(
            (np.concatenate(vals),
             (np.concatenate(rows), np.concatenate(cols))),
            shape=self.shape)

    def to_dense(self) -> jax.Array:
        """Densify (small problems only): used by the MXU Cholesky paths."""
        return jnp.asarray(self.to_scipy().toarray(), self.v.dtype)

    @staticmethod
    def from_scipy(m, dtype=None, seed=0) -> "RoutedEllMatrix":
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
                f"(limit {routed_q_limit()}), dtype {np.dtype(dtype).name}"
                " (TPU kernel supports f32/bf16)")
        fwd = build_routes(csr, seed=seed)
        bwd = build_routes(csr.T.tocsr(), seed=seed)

        def chain_of(route):
            out = []
            coll = route.get("collect")
            while coll is not None:
                out.append((jnp.asarray(coll["a"]), jnp.asarray(coll["b"]),
                            jnp.asarray(coll["c"]),
                            jnp.asarray(coll["v"], dtype)))
                coll = coll.get("collect")
            return tuple(out) or None

        return RoutedEllMatrix(
            a=jnp.asarray(fwd["a"]), b=jnp.asarray(fwd["b"]),
            c=jnp.asarray(fwd["c"]), v=jnp.asarray(fwd["v"], dtype),
            at=jnp.asarray(bwd["a"]), bt=jnp.asarray(bwd["b"]),
            ct=jnp.asarray(bwd["c"]), vt=jnp.asarray(bwd["v"], dtype),
            coll=chain_of(fwd), coll_t=chain_of(bwd),
            q=fwd["q"], qt=bwd["q"], nrows=csr.shape[0],
            ncols=csr.shape[1], true_nnz=int(csr.nnz),
        )


def routed_ell_eligible(csr_shape, q=None, dtype=None) -> bool:
    """Geometry gate: the table and plane pipeline must fit VMEM (and the
    value dtype must be Mosaic-legal when running on the real chip)."""
    m, n = csr_shape
    q = q or max(-(-m // LANE), -(-n // LANE), 1)
    if q > routed_q_limit():
        return False
    if dtype is not None and not (_FORCE_INTERPRET
                                  or jax.default_backend() != "tpu"):
        if dtype not in (jnp.float32, jnp.bfloat16):
            return False
    return True


# effective bytes per padded plane slot per SpMV direction pair: 16 B of
# streamed index/value traffic plus the dynamic_gather compute priced at
# the same equivalence rate.  PLACEHOLDER pending on-chip calibration
# (/tmp/gather_probe.py): until then the backend never enters
# auto-selection (ROUTED_ELL_ENABLED below), so the constant only sizes
# dispatch caps for prefer="routed" runs — 64 is deliberately pessimistic
# (4x the HBM traffic) so those dispatches stay short.
ROUTED_ELL_BYTES_PER_SLOT = 64
# auto-selection gate: flip after the on-chip probe calibrates the slot
# cost; prefer="routed" works regardless
ROUTED_ELL_ENABLED = False

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


def routed_cost_estimate(csr) -> int:
    """Cheap (no routing) effective-bytes estimate for the chooser."""
    csr = scipy.sparse.csr_matrix(csr)
    m, n = csr.shape
    q = max(-(-m // LANE), -(-n // LANE), 1)
    cnt = np.diff(csr.indptr)
    ccnt = (np.bincount(csr.indices, minlength=n) if csr.nnz
            else np.zeros(1, np.int64))
    rows_fwd = _orientation_cost_rows(cnt, m, n, q, csr.nnz)
    rows_bwd = _orientation_cost_rows(ccnt, n, m, q, csr.nnz)
    slots = (rows_fwd + rows_bwd) * LANE * _ROUTED_PACKING_FACTOR
    return int(slots * ROUTED_ELL_BYTES_PER_SLOT)
