"""Unit tests for the host modeling layer and form conversions."""

import copy

import numpy as np
import pytest
import scipy.optimize
import scipy.sparse

from pysparselp_tpu import SparseLP, crd_matrix
from pysparselp_tpu.utils.random_lp import generate_random_lp


def scipy_solve(lp):
    lp2 = copy.deepcopy(lp)
    lp2.convert_to_one_sided_inequality_system()
    a_ineq = lp2.a_inequalities.tocsr() if lp2.a_inequalities.shape[0] else None
    a_eq = lp2.a_equalities.tocsr() if lp2.a_equalities.shape[0] else None
    sol = scipy.optimize.linprog(
        lp2.costsvector,
        A_ub=a_ineq,
        b_ub=lp2.b_upper if a_ineq is not None else None,
        A_eq=a_eq,
        b_eq=lp2.b_equalities if a_eq is not None else None,
        bounds=np.column_stack((lp2.lower_bounds, lp2.upper_bounds)),
        method="highs",
    )
    assert sol.success, sol.message
    return np.asarray(sol.x)


def test_crd_matrix_basic():
    cols = np.array([[0, 2], [1, 3]])
    vals = np.array([[1.0, -1.0], [2.0, 0.0]])
    m = crd_matrix(cols, vals)
    dense = m.toarray()
    assert dense[0, 0] == 1.0 and dense[0, 2] == -1.0
    assert dense[1, 1] == 2.0
    assert m.nnz == 3  # zero entry dropped


def test_crd_matrix_duplicate_detection():
    cols = np.array([[0, 0]])
    vals = np.array([[1.0, 2.0]])
    with pytest.raises(ValueError):
        crd_matrix(cols, vals)


def test_crd_matrix_broadcast():
    cols = np.array([[0, 1], [2, 3]])
    vals = np.array([[1.0, -1.0]])
    m = crd_matrix(cols, vals)
    assert m.shape == (2, 4)
    assert m[1, 2] == 1.0 and m[1, 3] == -1.0


def test_add_variables_and_constraints():
    lp = SparseLP()
    idx = lp.add_variables_array((2, 3), lower_bounds=0, upper_bounds=1, costs=2.0,
                                 name="grid")
    assert lp.nb_variables == 6
    assert np.all(lp.get_variables_indices("grid") == idx)
    assert np.all(lp.costsvector == 2.0)

    lp.start_constraint_name("rowsum")
    lp.add_equality_constraints(
        cols=idx, vals=np.ones_like(idx, dtype=float), b=np.ones(2)
    )
    lp.end_constraint_name("rowsum")
    assert lp.nb_equality_constraints() == 2
    assert lp.equality_constraint_names[0]["name"] == "rowsum"

    x = np.full(6, 1 / 3)
    assert lp.check_solution(x)
    assert not lp.check_solution(np.zeros(6))


def test_soft_constraints_add_aux_vars():
    lp = SparseLP()
    idx = lp.add_variables_array(3, lower_bounds=0, upper_bounds=1, costs=0)
    aux = lp.add_soft_inequality_constraints(
        idx[None, :], np.ones((1, 3)), coef_penalization=5.0,
        lower_bounds=np.array([1.0]), upper_bounds=np.array([1.0]),
    )
    assert aux is not None
    assert lp.nb_variables == 4
    assert lp.costsvector[aux[0]] == 5.0
    # two one-sided rows were added
    assert lp.nb_inequality_constraints() == 2


def test_one_sided_conversion_preserves_feasible_set():
    lp, x_feas = generate_random_lp(nbvar=20, n_eq=3, n_ineq=15, sparsity=0.3, seed=0)
    lp.add_inequality_constraints_sparse(
        scipy.sparse.eye(20).tocsr(), lower_bounds=lp.lower_bounds - 1,
        upper_bounds=lp.upper_bounds + 1,
    )
    lp2 = copy.deepcopy(lp)
    lp2.convert_to_one_sided_inequality_system()
    assert lp2.b_lower is None
    assert lp.check_solution(x_feas)
    assert lp2.check_solution(x_feas)
    x_ref = scipy_solve(lp)
    x_new = scipy_solve(lp2)
    np.testing.assert_allclose(
        lp.costsvector @ x_ref, lp2.costsvector @ x_new, rtol=1e-8
    )


def test_convert_to_all_inequalities():
    lp, x_feas = generate_random_lp(nbvar=15, n_eq=4, n_ineq=10, sparsity=0.4, seed=1)
    lp2 = copy.deepcopy(lp)
    lp2.convert_to_all_inequalities()
    assert lp2.a_equalities is None
    assert lp2.check_solution(x_feas)


def test_convert_to_all_equalities():
    lp, x_feas = generate_random_lp(nbvar=15, n_eq=4, n_ineq=10, sparsity=0.4, seed=2)
    m_i = lp.nb_inequality_constraints()
    lp2 = copy.deepcopy(lp)
    lp2.convert_to_all_equalities()
    assert lp2.nb_inequality_constraints() == 0
    x_ext = np.concatenate((x_feas, lp.a_inequalities.matvec(x_feas)))
    assert lp2.nb_variables == lp.nb_variables + m_i
    assert lp2.check_solution(x_ext)


def test_remove_fixed_variables_backmap():
    lp = SparseLP()
    lb = np.array([0.0, 2.0, -1.0, 3.0])
    ub = np.array([1.0, 2.0, 5.0, 3.0])  # vars 1 and 3 fixed
    lp.add_variables_array(4, lb, ub, costs=np.array([1.0, -1.0, 2.0, 0.5]))
    lp.add_equality_constraints_sparse(
        scipy.sparse.csr_matrix(np.array([[1.0, 1.0, 1.0, 1.0]])), np.array([5.0])
    )
    lp2 = copy.deepcopy(lp)
    m_change, shift = lp2.remove_fixed_variables()
    assert lp2.nb_variables == 2
    x_red = scipy_solve(lp2)
    x_full = m_change @ x_red + shift
    assert x_full[1] == 2.0 and x_full[3] == 3.0
    x_direct = scipy_solve(lp)
    np.testing.assert_allclose(lp.costsvector @ x_full,
                               lp.costsvector @ x_direct, rtol=1e-8)


def test_slack_form_roundtrip():
    lp, x_feas = generate_random_lp(nbvar=12, n_eq=3, n_ineq=8, sparsity=0.4, seed=3)
    x_direct = scipy_solve(lp)
    lp2 = copy.deepcopy(lp)
    m_change, shift = lp2.convert_to_slack_form()
    assert lp2.b_lower is None and lp2.b_upper is None
    assert np.all(lp2.lower_bounds == 0)
    assert np.all(np.isinf(lp2.upper_bounds))
    x_slack = scipy_solve(lp2)
    x_back = m_change @ x_slack + shift
    np.testing.assert_allclose(
        lp.costsvector @ x_back, lp.costsvector @ x_direct, rtol=1e-7, atol=1e-9
    )
    assert lp.check_solution(x_back, tol=1e-6)


def test_slack_form_with_free_and_reversed_vars():
    lp = SparseLP()
    lb = np.array([0.0, -np.inf, -np.inf])
    ub = np.array([10.0, 4.0, np.inf])  # var1 only-upper-bounded, var2 free
    lp.add_variables_array(3, lb, ub, costs=np.array([1.0, 1.0, 1.0]))
    lp.add_equality_constraints_sparse(
        scipy.sparse.csr_matrix(np.array([[1.0, 1.0, 0.0], [0.0, 1.0, 1.0]])),
        np.array([3.0, 2.0]),
    )
    x_direct = scipy_solve(lp)
    lp2 = copy.deepcopy(lp)
    m_change, shift = lp2.convert_to_slack_form()
    x_slack = scipy_solve(lp2)
    x_back = m_change @ x_slack + shift
    np.testing.assert_allclose(
        lp.costsvector @ x_back, lp.costsvector @ x_direct, rtol=1e-7, atol=1e-9
    )
    assert lp.check_solution(x_back, tol=1e-6)


def test_blocks_tracked_per_batch():
    lp = SparseLP()
    idx = lp.add_variables_array(6, 0, 1, costs=1.0)
    lp.add_equality_constraints(idx[None, :3], np.ones((1, 3)), b=np.array([1.0]))
    lp.add_equality_constraints(idx[None, 3:], np.ones((1, 3)), b=np.array([1.0]))
    assert lp.a_equalities.blocks == [(0, 1), (1, 2)]


def test_blocked_csr_check():
    import scipy.sparse

    from pysparselp_tpu.sparse_host import BlockedCSR

    b = BlockedCSR(5)
    b.append_scipy(scipy.sparse.random(3, 5, density=0.5, random_state=0))
    b.append_scipy(scipy.sparse.random(2, 5, density=0.5, random_state=1))
    assert b.check()
    assert b.blocks == [(0, 3), (3, 5)]
    # corrupt the blocks metadata -> check must fail
    b.blocks[-1] = (3, 7)
    import pytest

    with pytest.raises(AssertionError):
        b.check()


def test_solve_rejects_unknown_method():
    from pysparselp_tpu.utils.random_lp import generate_random_lp

    lp, _ = generate_random_lp(nbvar=10, n_eq=1, n_ineq=10, sparsity=0.4,
                               seed=9)
    with pytest.raises(ValueError, match="not valid"):
        lp.solve(method="no_such_solver")


def test_solve_max_time_zero_returns_after_first_chunk():
    from pysparselp_tpu.utils.random_lp import generate_random_lp

    lp, _ = generate_random_lp(nbvar=10, n_eq=1, n_ineq=10, sparsity=0.4,
                               seed=9)
    x, _ = lp.solve(method="chambolle_pock_ppd", nb_iter=100000,
                    nb_iter_plot=100, max_time=0)
    assert lp.itrn_curve == [100]
    assert np.all(np.isfinite(x))


def test_nb_iter_plot_larger_than_nb_iter():
    from pysparselp_tpu.utils.random_lp import generate_random_lp

    lp, _ = generate_random_lp(nbvar=10, n_eq=1, n_ineq=10, sparsity=0.4,
                               seed=9)
    x, _ = lp.solve(method="chambolle_pock_ppd", nb_iter=50,
                    nb_iter_plot=1000)
    assert lp.itrn_curve == [50]


def test_one_sided_conversion_remaps_name_ranges_with_dropped_rows():
    """A named range whose LAST row has an infinite upper bound must not
    overshoot into the next range after conversion (round-1 advisor bug:
    inclusive end remapped as mapping[end] instead of mapping[end+1]-1)."""
    lp = SparseLP()
    idx = lp.add_variables_array(4, lower_bounds=-10, upper_bounds=10,
                                 costs=1.0)
    cols = np.asarray(idx, dtype=int).reshape(4, 1)
    vals = np.ones((4, 1))
    # range "a": rows 0-1; row 1 has ub=+inf (dropped from the upper block)
    lp.start_constraint_name("a")
    lp.add_inequality_constraints(cols[:2], vals[:2],
                                  lower_bounds=np.array([-1.0, -1.0]),
                                  upper_bounds=np.array([1.0, np.inf]))
    lp.end_constraint_name("a")
    # range "b": rows 2-3, both sides finite
    lp.start_constraint_name("b")
    lp.add_inequality_constraints(cols[2:], vals[2:],
                                  lower_bounds=np.array([-2.0, -2.0]),
                                  upper_bounds=np.array([2.0, 2.0]))
    lp.end_constraint_name("b")

    lp.convert_to_one_sided_inequality_system()
    a_upper = lp.find_inequality_constraints_from_name("a")[0]
    b_upper = lp.find_inequality_constraints_from_name("b")[0]
    # upper block keeps rows [0 (from a), 2, 3 (from b)] in order
    assert (a_upper["start"], a_upper["end"]) == (0, 0)
    assert (b_upper["start"], b_upper["end"]) == (1, 2)
    # lower block: all 4 rows kept, appended after the 3 upper rows
    a_lower = lp.find_inequality_constraints_from_name("a")[1]
    b_lower = lp.find_inequality_constraints_from_name("b")[1]
    assert (a_lower["start"], a_lower["end"]) == (3, 4)
    assert (b_lower["start"], b_lower["end"]) == (5, 6)
