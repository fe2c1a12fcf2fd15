"""Tests for the native constraint-propagation kernel and greedy rounding."""

import copy

import numpy as np
import scipy.sparse

from pysparselp_tpu import SparseLP
from pysparselp_tpu.integer.propagation import (
    _load_native,
    propagate_constraints,
    revert,
)
from pysparselp_tpu.integer.rounding import greedy_fix, greedy_round


def small_system():
    # x0 + x1 <= 1;  x0 + x2 >= 1, vars in [0, 1]
    a = scipy.sparse.csr_matrix(np.array([[1.0, 1, 0], [1, 0, 1]]))
    bl = np.array([-np.inf, 1.0])
    bu = np.array([1.0, np.inf])
    return a, bl, bu


def test_native_kernel_compiles():
    assert _load_native() is not None


def _check_propagation(use_native):
    a, bl, bu = small_system()
    x_l = np.zeros(3)
    x_u = np.ones(3)
    x_l[0] = x_u[0] = 0.0  # fix x0 = 0 → x2 must be 1
    ops = []
    valid, row = propagate_constraints(
        [0], x_l, x_u, a, a.tocsc(), bl, bu, ops, use_native=use_native
    )
    assert valid == 1 and row is None
    assert x_l[2] == 1.0 and x_u[2] == 1.0
    assert ops == [(0, 2, 0.0)]
    revert(ops, x_l, x_u)
    assert x_l[2] == 0.0

    # infeasible: x0 = 0 and x2 = 0 violates row 1
    x_u[0] = x_u[2] = 0.0
    valid, row = propagate_constraints(
        [0, 2], x_l, x_u, a, a.tocsc(), bl, bu, [], use_native=use_native
    )
    assert valid == 0 and row == 1


def test_propagation_native():
    _check_propagation(use_native=True)


def test_propagation_python_fallback():
    _check_propagation(use_native=False)


def test_native_matches_python_on_random_system():
    rng = np.random.RandomState(0)
    a = scipy.sparse.random(40, 25, density=0.15, random_state=rng,
                            format="csr")
    a.data = np.round(a.data * 4 - 2)
    a.eliminate_zeros()
    x_feas = rng.randint(0, 2, 25).astype(float)
    r = a @ x_feas
    bl, bu = r - 1, r + 1
    for seed in range(3):
        rs = np.random.RandomState(seed)
        fix = rs.choice(25, 5, replace=False)
        xl1 = np.zeros(25)
        xu1 = np.ones(25)
        xl1[fix] = xu1[fix] = x_feas[fix]
        xl2, xu2 = xl1.copy(), xu1.copy()
        v1, _ = propagate_constraints(fix, xl1, xu1, a, a.tocsc(), bl, bu, [],
                                      use_native=True)
        v2, _ = propagate_constraints(fix, xl2, xu2, a, a.tocsc(), bl, bu, [],
                                      use_native=False)
        assert v1 == v2
        np.testing.assert_array_equal(xl1, xl2)
        np.testing.assert_array_equal(xu1, xu2)


def test_greedy_round_on_matching():
    np.random.seed(2)
    n = 8
    cost = -np.random.rand(n, n)
    lp = SparseLP()
    idx = lp.add_variables_array(cost.shape, 0, 1, cost)
    ones = np.ones(idx.shape)
    lp.add_inequality_constraints(idx, ones, lower_bounds=None, upper_bounds=1)
    lp.add_inequality_constraints(idx.T, ones, lower_bounds=None,
                                  upper_bounds=1)
    x_lp = lp.solve(method="scipy_simplex", get_timing=False)
    rng = np.random.RandomState(0)
    x_frac = np.clip(x_lp + 0.3 * rng.rand(x_lp.size) - 0.15, 0, 1)
    xr, valid = greedy_round(x_frac, lp, maxiter=10000)
    assert valid == 1
    assert np.all(xr == np.round(xr))
    assert lp.check_solution(xr)


def test_greedy_fix_reaches_feasibility():
    np.random.seed(2)
    n = 8
    cost = -np.random.rand(n, n)
    lp = SparseLP()
    idx = lp.add_variables_array(cost.shape, 0, 1, cost)
    ones = np.ones(idx.shape)
    lp.add_inequality_constraints(idx, ones, lower_bounds=None, upper_bounds=1)
    lp.add_inequality_constraints(idx.T, ones, lower_bounds=None,
                                  upper_bounds=1)
    rng = np.random.RandomState(1)
    x_bad = (rng.rand(n * n) > 0.4).astype(float)  # likely violates rows
    xf = greedy_fix(x_bad, lp, nb_max_iter=500)
    viol = np.maximum(lp.a_inequalities.matvec(xf) - lp.b_upper, 0).sum()
    assert viol == 0.0


def test_force_integer_returns_feasible_integer_solution():
    """solve(force_integer=True) returns the best feasible integer-rounded
    iterate tracked inside the CP loop (an integral-polytope matching LP)."""
    import numpy as np

    from pysparselp_tpu import SparseLP

    rng = np.random.RandomState(0)
    nb = 6
    cost = rng.rand(nb, nb)
    lp = SparseLP()
    ids = lp.add_variables_array((nb, nb), 0.0, 1.0, costs=cost)
    lp.add_equality_constraints(ids, np.ones_like(cost), b=np.ones(nb))
    lp.add_equality_constraints(ids.T, np.ones_like(cost), b=np.ones(nb))
    x, _ = lp.solve(method="chambolle_pock_ppd", nb_iter=20000,
                    nb_iter_plot=1000, force_integer=True)
    assert np.allclose(x, np.round(x))          # integral
    assert lp.max_constraint_violation(x) < 1e-9  # a perfect matching
    # and it is the optimal assignment (LP over an integral polytope)
    import scipy.optimize

    r, c = scipy.optimize.linear_sum_assignment(cost)
    assert abs(lp.cost(x) - cost[r, c].sum()) < 1e-6


def test_greedy_fix_xor_moves_escape_bit_flip_local_minimum():
    """use_xor_moves must change behavior: a one-hot reassignment move on an
    "xors" group fixes a violation that every single bit flip would make
    worse (it breaks the weight-1000 xor constraint it touches)."""
    lp = SparseLP()
    idx = lp.add_variables_array(4, lower_bounds=0, upper_bounds=1, costs=0.0)
    cols = np.asarray(idx, dtype=int)
    # one-hot group: x0 + x1 + x2 + x3 == 1, named "xors"
    lp.start_constraint_name("xors")
    lp.add_equality_constraints(cols.reshape(1, 4), np.ones((1, 4)),
                                b=np.ones(1))
    lp.end_constraint_name("xors")
    # x0 must be 0 — but the current assignment has x0 = 1
    lp.add_inequality_constraints(cols[:1].reshape(1, 1), np.ones((1, 1)),
                                  upper_bounds=np.zeros(1))
    x_start = np.array([1.0, 0.0, 0.0, 0.0])

    def score(xr):
        lp2 = copy.deepcopy(lp)
        lp2.convert_to_all_inequalities()
        lp2.convert_to_one_sided_inequality_system()
        a = lp2.a_inequalities.tocsr()
        return float(np.maximum(a @ xr - lp2.b_upper, 0).sum())

    # bit-flip-only search is stuck at the start point
    x_flips = greedy_fix(x_start.copy(), lp, nb_max_iter=50,
                         use_xor_moves=False)
    np.testing.assert_array_equal(x_flips, x_start)
    assert score(x_flips) > 0

    # the xor move reassigns the one-hot in a single step
    x_xor = greedy_fix(x_start.copy(), lp, nb_max_iter=50,
                       use_xor_moves=True)
    assert score(x_xor) == 0.0
    assert x_xor[0] == 0.0 and x_xor.sum() == 1.0
