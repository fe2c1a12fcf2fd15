"""Routed gather-ELL backend: routing completeness + kernel parity.

The route builder must reproduce ``A @ x`` exactly through the 3-stage
(lane, sublane, lane) gather factorization for arbitrary sparsity, and
the Pallas kernel (interpret mode on CPU) must match scipy through the
full operator protocol.
"""

import numpy as np
import pytest
import scipy.sparse

import jax.numpy as jnp

from pysparselp_tpu.ops.ell_routed import (
    LANE,
    RoutedEllMatrix,
    build_routes,
    route_gather_reference,
    routed_ell_eligible,
)


def _rand(m, n, density, seed, fmt="csr"):
    rng = np.random.RandomState(seed)
    return scipy.sparse.random(m, n, density=density, random_state=rng,
                               format=fmt)


@pytest.mark.parametrize(
    "m,n,density",
    [(200, 200, 0.03), (500, 120, 0.05), (90, 700, 0.02), (257, 129, 0.1)],
)
def test_route_reproduces_spmv(m, n, density):
    a = _rand(m, n, density, seed=m + n)
    route = build_routes(a)
    rng = np.random.RandomState(0)
    x = rng.randn(n)
    np.testing.assert_allclose(route_gather_reference(x, route), a @ x,
                               rtol=1e-12, atol=1e-12)


def test_route_handles_duplicate_heavy_columns():
    # a hot column (every row references column 7) exercises the
    # multicast path: one A-slot fans out across output rows via stage B
    m, n = 300, 200
    rows = np.arange(m)
    a = scipy.sparse.csr_matrix(
        (np.ones(m), (rows, np.full(m, 7))), shape=(m, n))
    a = (a + _rand(m, n, 0.02, seed=3)).tocsr()
    route = build_routes(a)
    x = np.random.RandomState(1).randn(n)
    np.testing.assert_allclose(route_gather_reference(x, route), a @ x,
                               rtol=1e-12, atol=1e-12)


def test_route_empty_and_dense_rows():
    # rows with zero entries and one fully dense row in the same matrix
    m, n = 64, 256
    a = scipy.sparse.lil_matrix((m, n))
    a[10] = 1.0  # dense row: n entries -> n planes minimum
    a[20, 5] = 3.0
    a = a.tocsr()
    route = build_routes(a)
    x = np.random.RandomState(2).randn(n)
    np.testing.assert_allclose(route_gather_reference(x, route), a @ x,
                               rtol=1e-12, atol=1e-12)
    assert route["n_planes"] >= 2


def test_routed_operator_protocol_matches_scipy():
    a = _rand(400, 250, 0.03, seed=9)
    op = RoutedEllMatrix.from_scipy(a, dtype=jnp.float32)
    rng = np.random.RandomState(4)
    x = rng.randn(250).astype(np.float32)
    y = rng.randn(400).astype(np.float32)
    d = np.abs(rng.randn(250)).astype(np.float32)
    np.testing.assert_allclose(op.matvec(jnp.asarray(x)), a @ x,
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(op.rmatvec(jnp.asarray(y)), a.T @ y,
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(op.abs_power_rowsum(1.0),
                               np.abs(a) @ np.ones(250),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(op.abs_power_colsum(2.0),
                               a.power(2).T @ np.ones(400),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(op.sq_rowsum_weighted(jnp.asarray(d)),
                               a.power(2) @ d,
                               rtol=2e-5, atol=2e-5)
    assert op.shape == (400, 250)
    assert op.true_nnz == a.nnz
    # round-trip decode: the routes ARE the matrix
    np.testing.assert_allclose(op.to_scipy().toarray(), a.toarray(),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(op.to_dense()), a.toarray(),
                               rtol=1e-6, atol=1e-7)


def test_spill_planes_bounded_on_uniform_random():
    a = _rand(1000, 1000, 0.01, seed=11)
    route = build_routes(a, split=False)
    k_max = int(np.diff(a.indptr).max())
    # uniform random sparsity routes with a small spill tail; demands
    # the alternating-path repair cannot place ride the COO side path
    # when there are too few of them to justify an overflow plane
    assert route["spill_planes"] <= max(4, k_max)
    assert route["n_planes"] == k_max + route["spill_planes"]
    side = route.get("side")
    side_n = 0 if side is None else side[0].size
    assert side_n <= a.nnz // 100  # repair places ~all demands
    x = np.random.RandomState(5).randn(1000)
    np.testing.assert_allclose(route_gather_reference(x, route), a @ x,
                               rtol=1e-12, atol=1e-10)


def test_virtual_row_split_cuts_planes():
    """Skewed rows (k-medians shape: thousands of 3-nnz rows + a few
    60-nnz rows) split into virtual rows + a collect route instead of
    paying one plane per unit of max row degree."""
    rng = np.random.RandomState(2)
    m = n = 3000
    rows = np.concatenate([np.repeat(np.arange(m), 3),
                           np.repeat(rng.choice(m, 8, replace=False), 60)])
    cols = rng.randint(0, n, rows.size)
    a = scipy.sparse.csr_matrix((rng.randn(rows.size), (rows, cols)),
                                shape=(m, n))
    a.sum_duplicates()
    k_max = int(np.diff(a.indptr).max())
    route = build_routes(a)
    assert route["collect"] is not None
    total = route["n_planes"] + route["collect"]["n_planes"]
    assert total < k_max // 2
    x = rng.randn(n)
    np.testing.assert_allclose(route_gather_reference(x, route), a @ x,
                               rtol=1e-12, atol=1e-10)
    # operator round-trip through the collect chain
    op = RoutedEllMatrix.from_scipy(a, dtype=jnp.float32)
    assert op.coll is not None
    np.testing.assert_allclose(op.to_scipy().toarray(), a.toarray(),
                               rtol=1e-6, atol=1e-7)
    y = rng.randn(m).astype(np.float32)
    np.testing.assert_allclose(op.rmatvec(jnp.asarray(y)), a.T @ y,
                               rtol=3e-5, atol=3e-5)
    d = np.abs(rng.randn(n)).astype(np.float32)
    np.testing.assert_allclose(op.sq_rowsum_weighted(jnp.asarray(d)),
                               a.power(2) @ d, rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(op.abs_power_rowsum(1.0),
                               np.abs(a) @ np.ones(n),
                               rtol=3e-5, atol=3e-5)


def test_eligibility_gate():
    assert routed_ell_eligible((10_000, 10_000))
    assert not routed_ell_eligible((10_000_000, 10))


def test_chooser_integration():
    from pysparselp_tpu import problem as pr
    from pysparselp_tpu.ops import ell_routed as er

    a = _rand(300, 200, 0.03, seed=21)
    op = pr.ell_from_scipy(a, dtype=jnp.float32, prefer="routed")
    assert isinstance(op, RoutedEllMatrix)
    # the dispatch cap prices the routed operator by its padded slots,
    # plus any COO side demands at the XLA gather cost
    cb = pr.operator_cost_bytes(op)
    assert cb == (op.nnz_padded * er.ROUTED_ELL_BYTES_PER_SLOT
                  + op.side_nnz * pr.ELL_GATHER_BYTES_PER_NNZ)
    # auto-selection is ON since the 2026-08-19 on-chip calibration
    # (end-to-end CP capture after the tail-fold + chain pairing:
    # 33.2 B/slot effective, 44x over the segmented fallback on the
    # bench's 1.95M-nnz matrix); the chooser only consults it on the
    # TPU backend, so CPU-mesh tests still lower to the XLA gather
    # layouts unless prefer="routed"
    assert er.ROUTED_ELL_ENABLED
    assert er.ROUTED_ELL_BYTES_PER_SLOT == 32
    best, _ = pr.estimate_stream_bytes(a, jnp.float32)
    assert best != "routed"
    # the cheap estimate is within a small factor of the built layout
    est = er.routed_cost_estimate(a)
    assert 0.3 * cb <= est <= 3 * cb


def test_cp_solver_end_to_end_routed():
    """Full CP-PPD solve with both systems lowered to routed operators
    (interpret mode) converges to the HiGHS optimum — the operator
    protocol is complete for the flagship solver."""
    import functools

    import pysparselp_tpu.solvers.chambolle_pock as cp_mod
    from pysparselp_tpu import SparseLP
    from pysparselp_tpu.problem import ell_from_scipy

    cost = np.random.RandomState(3).rand(6, 6)
    lp = SparseLP()
    x = lp.add_variables_array(cost.shape, 0, 1, costs=cost)
    lp.add_equality_constraints(x, np.ones_like(cost), b=np.ones(6))
    lp.add_inequality_constraints(x.T, np.ones_like(cost),
                                  upper_bounds=np.ones(6))
    ref, _ = lp.solve(method="scipy_simplex")
    orig = cp_mod.ell_from_scipy
    cp_mod.ell_from_scipy = functools.partial(ell_from_scipy,
                                              prefer="routed")
    try:
        sol, _ = lp.solve(method="chambolle_pock_ppd", nb_iter=20000,
                          nb_iter_plot=5000)
    finally:
        cp_mod.ell_from_scipy = orig
    assert abs(lp.cost(sol) - lp.cost(ref)) < 1e-2
    assert lp.max_constraint_violation(sol) < 1e-3


def test_cp_restart_mode_on_routed():
    """The PDLP restart controller's with-sums chunk path is operator-
    generic: it must run unchanged over routed operators."""
    import functools

    import pysparselp_tpu.solvers.chambolle_pock as cp_mod
    from pysparselp_tpu import SparseLP
    from pysparselp_tpu.problem import ell_from_scipy

    rng = np.random.RandomState(7)
    cost = rng.rand(6, 6)
    lp = SparseLP()
    x = lp.add_variables_array(cost.shape, 0, 1, costs=cost)
    lp.add_equality_constraints(x, np.ones_like(cost), b=np.ones(6))
    lp.add_inequality_constraints(x.T, np.ones_like(cost),
                                  upper_bounds=np.ones(6))
    ref, _ = lp.solve(method="scipy_simplex")
    orig = cp_mod.ell_from_scipy
    cp_mod.ell_from_scipy = functools.partial(ell_from_scipy,
                                              prefer="routed")
    try:
        sol, _ = lp.solve(method="chambolle_pock_ppd", nb_iter=8000,
                          nb_iter_plot=2000, restart="average",
                          restart_period=1000)
    finally:
        cp_mod.ell_from_scipy = orig
    assert abs(lp.cost(sol) - lp.cost(ref)) < 1e-2
    assert lp.max_constraint_violation(sol) < 1e-3


def test_tpu_lowering_under_x64():
    """Mosaic legalization of the kernel, checked WITHOUT a chip via
    lowering_platforms — the suite runs under jax_enable_x64, which is
    exactly the environment that broke jnp.take_along_axis (its index
    math promotes to i64; the kernel now builds lax.gather with i32)."""
    import jax

    from pysparselp_tpu.ops import ell_routed as er

    a = _rand(500, 400, 0.02, seed=17)
    op = RoutedEllMatrix.from_scipy(a, dtype=jnp.float32)
    x = jnp.zeros(400, jnp.float32)
    forced, er._FORCE_INTERPRET = er._FORCE_INTERPRET, False
    try:
        f = jax.jit(lambda x: jnp.sum(op.rmatvec(op.matvec(x))))
        f.trace(x).lower(lowering_platforms=("tpu",))
    finally:
        er._FORCE_INTERPRET = forced


def test_from_scipy_rejects_ineligible():
    import scipy.sparse as sp

    # beyond even the TILED table ceiling (_TILED_MAX_Q * LANE positions)
    big = sp.random(5_000_000, 10, density=1e-6, format="csr",
                    random_state=np.random.RandomState(0))
    with pytest.raises(ValueError, match="routed ELL ineligible"):
        RoutedEllMatrix.from_scipy(big, dtype=jnp.float32)


def test_route_plane_slots_consistent():
    # structural invariant: every (so, lo) slot with a nonzero value has
    # its element routed through matching A/B/C entries
    a = _rand(300, 300, 0.02, seed=13)
    route = build_routes(a, split=False)  # raw planes: rows are real rows
    q = route["q"]
    csr = a.tocsr()
    for p in range(route["n_planes"]):
        A, B, C, V = (route[k][p] for k in ("a", "b", "c", "v"))
        so, lo = np.nonzero(V)
        lam = C[so, lo]
        sx = B[lam, so]  # B is stored pre-transposed: b[λ, so] = sx
        lx = A[sx, lam]
        cols = sx * LANE + lx
        rows = so * LANE + lo
        vals = np.asarray(csr[rows, cols]).ravel()
        # the value stored at the slot must belong to that (row, col)
        np.testing.assert_allclose(V[so, lo], vals, rtol=0, atol=0)


# ---------------------------------------------------------------------------
# tiled tables (q beyond the single-tile VMEM limit)
# ---------------------------------------------------------------------------


def test_tiled_route_reproduces_spmv():
    """Forced tiny tiles: the pair-grouped route must reproduce A @ x
    bit-exactly through the tile-tagged oracle."""
    a = _rand(900, 700, 0.02, seed=31)
    route = build_routes(a, qt=2)
    assert route["tiles"] == -(-route["q"] // 2)
    assert route["tags"].shape == (3, route["n_planes"])
    # dst-grouped plane order, each group padded to the unroll quantum
    from pysparselp_tpu.ops import ell_routed as er

    src, dst, first = route["tags"]
    assert (np.diff(dst) >= 0).all()
    expect_first = np.r_[1, (np.diff(dst) != 0).astype(np.int32)]
    np.testing.assert_array_equal(first, expect_first)
    assert route["n_planes"] % er._PLANE_UNROLL == 0
    x = np.random.RandomState(0).randn(700)
    np.testing.assert_allclose(route_gather_reference(x, route), a @ x,
                               rtol=1e-12, atol=1e-12)


def test_tiled_operator_protocol_matches_scipy():
    """Full operator protocol through the scalar-prefetch tiled kernel
    (interpret mode), forced small tiles."""
    a = _rand(800, 500, 0.015, seed=33)
    op = RoutedEllMatrix.from_scipy(a, dtype=jnp.float32, qt=2)
    assert op.tiles > 1 and op.tiles_t > 1
    rng = np.random.RandomState(5)
    x = rng.randn(500).astype(np.float32)
    y = rng.randn(800).astype(np.float32)
    d = np.abs(rng.randn(500)).astype(np.float32)
    np.testing.assert_allclose(op.matvec(jnp.asarray(x)), a @ x,
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(op.rmatvec(jnp.asarray(y)), a.T @ y,
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(op.abs_power_rowsum(1.0),
                               np.abs(a) @ np.ones(500),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(op.abs_power_colsum(2.0),
                               a.power(2).T @ np.ones(800),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(op.sq_rowsum_weighted(jnp.asarray(d)),
                               a.power(2) @ d,
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(op.to_scipy().toarray(), a.toarray(),
                               rtol=1e-6, atol=1e-7)


def test_tiled_with_collect_chain():
    """Wide rows + forced tiles: virtual-row splitting and tile tagging
    compose (the collect stacks are tiled over the same geometry)."""
    rng = np.random.RandomState(8)
    m = n = 2000
    rows = np.concatenate([np.repeat(np.arange(m), 2),
                           np.repeat(rng.choice(m, 5, replace=False), 80)])
    cols = rng.randint(0, n, rows.size)
    a = scipy.sparse.csr_matrix((rng.randn(rows.size), (rows, cols)),
                                shape=(m, n))
    a.sum_duplicates()
    op = RoutedEllMatrix.from_scipy(a, dtype=jnp.float32, qt=8)
    assert op.coll is not None and op.tiles > 1
    x = rng.randn(n).astype(np.float32)
    np.testing.assert_allclose(op.matvec(jnp.asarray(x)), a @ x,
                               rtol=4e-5, atol=4e-5)
    np.testing.assert_allclose(op.to_scipy().toarray(), a.toarray(),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(op.abs_power_rowsum(1.0),
                               np.abs(a) @ np.ones(n),
                               rtol=4e-5, atol=4e-5)


def test_tiled_auto_beyond_single_tile_limit():
    """A table past routed_q_limit() tiles automatically (real tile
    size), including empty destination tiles getting zeroing planes."""
    from pysparselp_tpu.ops.ell_routed import _tiled_qt, routed_q_limit

    m, n = (routed_q_limit() + 200) * LANE, 3_000
    a = _rand(m, n, 6e-6, seed=41)
    route = build_routes(a)
    assert route.get("tags") is not None
    assert route["qt"] == _tiled_qt()
    assert route["q"] > routed_q_limit()
    x = np.random.RandomState(1).randn(n)
    np.testing.assert_allclose(route_gather_reference(x, route), a @ x,
                               rtol=1e-12, atol=1e-12)
    op = RoutedEllMatrix.from_scipy(a, dtype=jnp.float32)
    xf = x.astype(np.float32)
    ref = a @ xf
    got = np.asarray(op.matvec(jnp.asarray(xf)))
    scale = np.abs(ref).max() or 1.0
    np.testing.assert_allclose(got / scale, ref / scale, atol=3e-6)
    assert routed_ell_eligible((m, n))


def test_tiled_tpu_lowering_under_x64():
    """Mosaic legalization of the dst-grouped tiled kernel (per-chain
    src tags, shared-dst accumulate), checked WITHOUT a chip (x64 suite
    environment, i32 index maps)."""
    import jax

    from pysparselp_tpu.ops import ell_routed as er

    a = _rand(600, 400, 0.02, seed=43)
    op = RoutedEllMatrix.from_scipy(a, dtype=jnp.float32, qt=2)
    x = jnp.zeros(400, jnp.float32)
    forced, er._FORCE_INTERPRET = er._FORCE_INTERPRET, False
    try:
        f = jax.jit(lambda x: jnp.sum(op.rmatvec(op.matvec(x))))
        f.trace(x).lower(lowering_platforms=("tpu",))
    finally:
        er._FORCE_INTERPRET = forced


def test_tiled_cost_estimate_tracks_built_layout():
    from pysparselp_tpu.ops import ell_routed as er
    from pysparselp_tpu import problem as pr

    from pysparselp_tpu.ops.ell_routed import routed_q_limit

    m, n = (routed_q_limit() + 200) * LANE, 3_000
    a = _rand(m, n, 6e-6, seed=47)
    est = er.routed_cost_estimate(a)
    op = RoutedEllMatrix.from_scipy(a, dtype=jnp.float32)
    cb = pr.operator_cost_bytes(op)
    assert 0.2 * cb <= est <= 5 * cb


# ---------------------------------------------------------------------------
# tiled-table demand transforms (tail fold / chunk split) + plane pairing
# ---------------------------------------------------------------------------


def test_tail_fold_cuts_planes_on_poisson_tails():
    """Uniform-random tiled tables pay per-pool MAX layers while the
    mean is ~2 (Poisson tail): at the REAL tile geometry (qt=128,
    16,384 positions/tile — small-tile geometries have too many small
    pools for the fold to pay), the exact-count search must find a
    transform well below the flat layout.  Counting only — the oracle
    and interpret-kernel tests cover execution of folded routes."""
    from pysparselp_tpu.ops import ell_routed as er

    rng = np.random.RandomState(5)
    m, n, deg, qt = 150_000, 100_000, 13, 128
    nnz = m * deg
    rows = np.sort(rng.randint(0, m, nnz).astype(np.int64))
    st = rng.randint(0, -(-n // (qt * LANE)), nnz).astype(np.int64)
    tsz = qt * LANE
    nst = int(st.max()) + 1
    flat = er._layer_planes(rows, st, tsz, nst, 1)
    total, plan = er._fold_search(rows, st, m, -(-m // tsz), qt, 0, 1,
                                  er._TILED_MAX_Q // qt)
    assert plan is not None
    assert total < 0.85 * flat, (total, flat)


def test_chunk_split_beats_fold_on_single_deep_row():
    """One 600-degree row in a tiled table: the occurrence cap only
    divides its layers by the cap per level, while the global chunk
    split collapses it in one — the exact-count search must pick the
    cheaper transform and stay exact."""
    rng = np.random.RandomState(9)
    m = n = 1500
    rows = np.concatenate([np.repeat(np.arange(m), 1),
                           np.full(600, 7)])
    cols = np.concatenate([rng.randint(0, n, m),
                           rng.choice(n, 600, replace=False)])
    a = scipy.sparse.csr_matrix((rng.randn(rows.size), (rows, cols)),
                                shape=(m, n))
    a.sum_duplicates()
    route = build_routes(a, qt=4)
    total = route["n_planes"]
    coll = route.get("collect")
    assert coll is not None  # a transform fired
    while coll is not None:
        total += coll["n_planes"]
        coll = coll.get("collect")
    # untransformed: >600 layers in row 7's pools; transformed: tens
    assert total < 200, total
    x = np.random.RandomState(4).randn(n)
    np.testing.assert_allclose(route_gather_reference(x, route), a @ x,
                               rtol=1e-12, atol=1e-12)


def test_dst_groups_are_step_aligned_and_pool_major():
    """dst-grouped kernel invariants: every dst group is padded to a
    multiple of _PLANE_UNROLL (each grid step's chains share ONE output
    tile, so group boundaries — where first-visit flags fire — must be
    step-aligned), whole unroll quanta of each pool precede the group's
    cross-pool orphan tail (so most steps also share their src tile and
    the per-chain x DMA is skipped), and the oracle must reproduce
    A @ x through the per-chain tags."""
    from pysparselp_tpu.ops import ell_routed as er

    a = _rand(900, 700, 0.02, seed=31)
    route = build_routes(a, qt=2, split=False)
    u = er._PLANE_UNROLL
    assert route["n_planes"] % u == 0
    src, dst, first = route["tags"]
    group_starts = np.nonzero(np.r_[True, np.diff(dst) != 0])[0]
    assert (group_starts % u == 0).all()
    np.testing.assert_array_equal(
        first, np.r_[1, (np.diff(dst) != 0).astype(np.int32)])
    # most steps must be same-src (the x-DMA-reuse heuristic): mixed-src
    # steps only come from the cross-pool orphan tails, bounded by one
    # orphan run per (dst, src) pool
    n_steps = dst.size // u
    mixed = sum(
        len({int(s) for s in src[k * u:(k + 1) * u]}) > 1
        for k in range(n_steps))
    n_pools = len({(int(d), int(s)) for d, s in zip(dst, src)})
    assert mixed <= n_pools, (mixed, n_steps, n_pools)
    x = np.random.RandomState(0).randn(700)
    np.testing.assert_allclose(route_gather_reference(x, route), a @ x,
                               rtol=1e-12, atol=1e-12)


def test_side_path_forced_spills(monkeypatch):
    """With overflow planes disabled entirely, every demand the greedy
    plus the alternating-path repair cannot place rides the XLA COO
    side path — and the operator protocol stays exact."""
    from pysparselp_tpu.ops import ell_routed as er

    # dense enough that some planes need repair or spill
    a = _rand(600, 400, 0.08, seed=41)
    monkeypatch.setattr(er, "_MAX_SPILL_PLANES", 0)
    route = build_routes(a, split=False)
    assert route["spill_planes"] == 0
    rng = np.random.RandomState(7)
    x = rng.randn(400)
    np.testing.assert_allclose(route_gather_reference(x, route), a @ x,
                               rtol=1e-12, atol=1e-12)
    op = RoutedEllMatrix.from_scipy(a, dtype=jnp.float32)
    np.testing.assert_allclose(op.to_scipy().toarray(), a.toarray(),
                               rtol=1e-6, atol=1e-7)
    xf = x.astype(np.float32)
    np.testing.assert_allclose(op.matvec(jnp.asarray(xf)), a @ xf,
                               rtol=3e-5, atol=3e-5)
    y = rng.randn(600).astype(np.float32)
    np.testing.assert_allclose(op.rmatvec(jnp.asarray(y)), a.T @ y,
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(op.abs_power_rowsum(1.0),
                               np.abs(a) @ np.ones(400),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(op.abs_power_colsum(2.0),
                               a.power(2).T @ np.ones(600),
                               rtol=3e-5, atol=3e-5)
    d = np.abs(rng.randn(400)).astype(np.float32)
    np.testing.assert_allclose(op.sq_rowsum_weighted(jnp.asarray(d)),
                               a.power(2) @ d, rtol=3e-5, atol=3e-5)


def test_untouched_tiles_masked_to_zero():
    """A tiled table whose output has tiles no plane writes (tall
    matrix, all nnz in the top rows): the pallas output garbage must be
    masked to zero, not paid for with zeroing plane groups."""
    rng = np.random.RandomState(9)
    m, n = 1600, 400
    rows = rng.randint(0, 256, 3000)  # only the first 256 rows touched
    cols = rng.randint(0, n, 3000)
    a = scipy.sparse.csr_matrix((rng.randn(3000), (rows, cols)),
                                shape=(m, n))
    a.sum_duplicates()
    route = build_routes(a, qt=2, split=False)
    touched = route.get("touched")
    assert touched is not None and (touched == 0).any()
    # no zero-fill plane groups for untouched tiles: every all-zero
    # value plane is group-tail padding, bounded by the unroll quantum
    # per dst group
    from pysparselp_tpu.ops import ell_routed as er

    zero_planes = int((np.abs(route["v"]).sum(axis=(1, 2)) == 0).sum())
    n_groups = len(set(route["tags"][1].tolist()))
    assert zero_planes <= n_groups * (er._PLANE_UNROLL - 1)
    x = rng.randn(n)
    np.testing.assert_allclose(route_gather_reference(x, route), a @ x,
                               rtol=1e-12, atol=1e-12)
    op = RoutedEllMatrix.from_scipy(a, dtype=jnp.float32, qt=2)
    assert op.touched is not None
    xf = x.astype(np.float32)
    got = np.asarray(op.matvec(jnp.asarray(xf)))
    np.testing.assert_allclose(got, a @ xf, rtol=3e-5, atol=3e-5)
    assert np.all(got[256:] == 0.0)


def test_repair_places_greedy_leftovers():
    """The alternating-path repair (König edge coloring) must leave at
    most a sliver of demands to the side path on dense single planes:
    a full permutation plane (every output row one demand) routes with
    no spills at all."""
    from pysparselp_tpu.ops import ell_routed as er

    rng = np.random.RandomState(13)
    n = LANE * LANE  # one full (128, 128) tile, 100% fill
    perm = rng.permutation(n)
    a = scipy.sparse.csr_matrix(
        (np.ones(n), (np.arange(n), perm)), shape=(n, n))
    route = build_routes(a, split=False)
    side = route.get("side")
    assert route["spill_planes"] == 0
    assert side is None or side[0].size == 0
    assert route["n_planes"] == 1
    x = rng.randn(n)
    np.testing.assert_allclose(route_gather_reference(x, route), x[perm],
                               rtol=1e-12, atol=1e-12)
