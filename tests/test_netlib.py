"""Netlib SC105 end-to-end solver tests against the perPlex exact solution.

The analogue of the reference's golden-curve netlib regression
(``tests/test_netlib.py:90-117``), strengthened: instead of matching its own
historical curves, every solver must actually reach the certified exact
optimum (mean-abs distance below threshold) within a fixed iteration budget.
The reference's first-order solvers never reach distance < 100 on SC105 in
their 10 s CI budget (``tests/netlib_curves_SC105.json``); this framework's
do — that gap is the headline performance claim, measured by bench.py.
"""

import copy
import os

import numpy as np
import pytest

from pysparselp_tpu import SparseLP
from pysparselp_tpu.io.netlib import get_problem

__folder__ = os.path.dirname(__file__)


@pytest.fixture(scope="module")
def sc105():
    d = get_problem("SC105")
    gt = d["solution"]
    lp = SparseLP()
    lp.add_variables_array(
        len(d["cost_vector"]),
        lower_bounds=d["lower_bounds"],
        upper_bounds=np.minimum(d["upper_bounds"], np.max(gt) * 2),
        costs=d["cost_vector"],
    )
    lp.add_equality_constraints_sparse(d["a_eq"], d["b_eq"])
    lp.add_inequality_constraints_sparse(d["a_ineq"], d["b_lower"], d["b_upper"])
    lp2 = copy.deepcopy(lp)
    lp2.convert_to_one_sided_inequality_system()
    assert lp2.check_solution(gt)
    return lp2, gt


def _dist(x, gt):
    return float(np.mean(np.abs(gt - x)))


def test_mps_parser_sc105_shapes(sc105):
    lp, gt = sc105
    assert lp.nb_variables == 103
    assert lp.nb_equality_constraints() == 45
    # 60 two-sided rows become 60 one-sided rows (all L-type with -inf lower)
    assert lp.nb_inequality_constraints() == 60
    np.testing.assert_allclose(lp.costsvector @ gt, -52.202061211707246)


def test_sc105_mehrotra_exact(sc105):
    lp, gt = sc105
    x, _ = lp.solve(method="mehrotra", nb_iter=100, ground_truth=gt,
                    ground_truth_indices=np.arange(len(gt)))
    assert _dist(x, gt) < 1e-5
    assert len(lp.distance_to_ground_truth) >= 5  # callback per IPM iteration


def test_sc105_chambolle_pock_reaches_optimum(sc105):
    lp, gt = sc105
    x, _ = lp.solve(method="chambolle_pock_ppd", nb_iter=600000,
                    nb_iter_plot=100000)
    assert _dist(x, gt) < 1e-4
    assert lp.max_constraint_violation(x) < 1e-6


def test_sc105_admm_family_reaches_optimum(sc105):
    lp, gt = sc105
    for method in ("admm", "admm2", "admm_blocks"):
        x, _ = lp.solve(method=method, nb_iter=500000, nb_iter_plot=250000)
        assert _dist(x, gt) < 1e-2, method
        assert lp.max_constraint_violation(x) < 1e-4, method


def test_sc105_scipy_bridges_exact(sc105):
    lp, gt = sc105
    for method in ("scipy_simplex", "scipy_interior_point"):
        x, _ = lp.solve(method=method)
        assert _dist(x, gt) < 1e-7, method


def test_sc105_dual_methods_improve(sc105):
    lp, gt = sc105
    lp.solve(method="dual_gradient_ascent", nb_iter=500, nb_iter_plot=100,
             ground_truth=gt, ground_truth_indices=np.arange(len(gt)))
    d = lp.distance_to_ground_truth
    assert d[-1] < d[0]


def test_mps_writer_roundtrip(sc105, tmp_path):
    lp, gt = sc105
    path = str(tmp_path / "sc105_out.mps")
    lp.save_mps(path)
    from pysparselp_tpu.io.mps import mps_parser

    with open(path) as f:
        d = mps_parser(f)
    # same feasible set: the certified solution must satisfy the re-read model
    lp3 = SparseLP()
    lp3.add_variables_array(
        len(d["cost_vector"]), lower_bounds=d["lower_bounds"],
        upper_bounds=d["upper_bounds"], costs=d["cost_vector"],
    )
    lp3.add_equality_constraints_sparse(d["a_eq"], d["b_eq"])
    lp3.add_inequality_constraints_sparse(d["a_ineq"], d["b_lower"], d["b_upper"])
    assert lp3.check_solution(gt, tol=1e-5)
    np.testing.assert_allclose(lp3.costsvector @ gt, lp.costsvector @ gt,
                               rtol=1e-9)


def test_sc105_restart_acceleration(sc105):
    """PDLP-style primal weight + adaptive restart: reaches in 40k
    iterations a tolerance the reference-faithful trajectory needs ~600k
    for (see test_sc105_chambolle_pock_reaches_optimum)."""
    lp, gt = sc105
    x, _ = lp.solve(method="chambolle_pock_ppd", nb_iter=40000,
                    nb_iter_plot=2000, restart="average")
    assert _dist(x, gt) < 1e-3
    # averaged iterates carry a small residual; still far below the plain
    # trajectory's violation at this budget
    assert lp.max_constraint_violation(x) < 1e-4
    # omega alone must already help by orders of magnitude
    x2, _ = lp.solve(method="chambolle_pock_ppd", nb_iter=40000,
                     nb_iter_plot=40000, omega="auto")
    assert _dist(x2, gt) < 1.0


def test_sc105_stop_tol_terminates_early(sc105):
    lp, gt = sc105
    x, _ = lp.solve(method="chambolle_pock_ppd", nb_iter=200000,
                    nb_iter_plot=2000, restart="average", stop_tol=1e-6)
    # terminated well before the iteration budget, at the tolerance
    assert lp.itrn_curve[-1] < 200000
    assert _dist(x, gt) < 1e-3


def test_cp_rcm_permute_matches_unpermuted(sc105):
    """The RCM presolve changes only coordinates, not the solution."""
    lp, gt = sc105
    x_p, _ = lp.solve(method="chambolle_pock_ppd", nb_iter=40000,
                      nb_iter_plot=40000, permute=True)
    x_n, _ = lp.solve(method="chambolle_pock_ppd", nb_iter=40000,
                      nb_iter_plot=40000, permute=False)
    # identical math in a different variable order: tiny float divergence
    np.testing.assert_allclose(x_p, x_n, atol=1e-6)
    # callback/curve contract sees original-order solutions
    lp.solve(method="chambolle_pock_ppd", nb_iter=2000, nb_iter_plot=1000,
             permute=True, ground_truth=gt,
             ground_truth_indices=np.arange(len(gt)))
    assert len(lp.distance_to_ground_truth) == 2


@pytest.mark.parametrize("name", ["AFIRO", "KB2", "SC50A", "SC50B"])
def test_all_vendored_netlib_problems_solve(name):
    """Every vendored netlib problem parses and solves to its certified
    perPlex optimum with the interior-point solver."""
    d = get_problem(name)
    gt = d["solution"]
    lp = SparseLP()
    lp.add_variables_array(
        len(d["cost_vector"]), lower_bounds=d["lower_bounds"],
        upper_bounds=np.minimum(d["upper_bounds"], max(np.max(gt), 1) * 10),
        costs=d["cost_vector"],
    )
    lp.add_equality_constraints_sparse(d["a_eq"], d["b_eq"])
    lp.add_inequality_constraints_sparse(d["a_ineq"], d["b_lower"],
                                         d["b_upper"])
    lp2 = copy.deepcopy(lp)
    lp2.convert_to_one_sided_inequality_system()
    assert lp2.check_solution(gt, tol=1e-5)
    x, _ = lp2.solve(method="mehrotra", nb_iter=100)
    # some problems (AFIRO) have non-unique optima: the interior point
    # converges to the optimal face's center, not the perPlex vertex —
    # assert the certified objective value and feasibility instead
    gt_cost = float(lp2.cost(gt))
    assert abs(lp2.cost(x) - gt_cost) < 1e-5 * (1 + abs(gt_cost)), name
    assert lp2.max_constraint_violation(x) < 1e-5, name
