"""Tests for the ADMM solver family (admm, admm2, admm_blocks)."""

import copy

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from pysparselp_tpu import SparseLP
from pysparselp_tpu.utils.random_lp import generate_random_lp


@pytest.fixture(scope="module")
def random_problem():
    lp, _ = generate_random_lp(nbvar=30, n_eq=2, n_ineq=30, sparsity=0.2, seed=10)
    lp2 = copy.deepcopy(lp)
    lp2.convert_to_one_sided_inequality_system()
    x_gt = lp2.solve(method="scipy_simplex", get_timing=False)
    return lp2, x_gt


@pytest.fixture(scope="module")
def blocky_problem():
    """Multi-batch problem so admm_blocks gets a nontrivial decomposition."""
    np.random.seed(5)
    lp = SparseLP()
    lp.add_variables_array(40, 0, 1, costs=np.random.randn(40))
    for _k in range(4):
        cols = np.zeros((5, 3), dtype=int)
        for r in range(5):
            cols[r] = np.random.choice(40, 3, replace=False)
        lp.add_inequality_constraints(
            cols, np.ones((5, 3)), lower_bounds=None, upper_bounds=2.0
        )
    x_gt = lp.solve(method="scipy_simplex", get_timing=False)
    return lp, x_gt


def test_admm_converges(random_problem):
    lp, x_gt = random_problem
    cost_gt = lp.costsvector @ x_gt
    x, _ = lp.solve(method="admm", nb_iter=5000, nb_iter_plot=1000)
    assert lp.max_constraint_violation(x) < 5e-3
    assert abs(lp.costsvector @ x - cost_gt) < 0.1 * max(1, abs(cost_gt))


def test_admm2_converges(random_problem):
    lp, x_gt = random_problem
    cost_gt = lp.costsvector @ x_gt
    x, _ = lp.solve(method="admm2", nb_iter=5000, nb_iter_plot=1000)
    assert lp.max_constraint_violation(x) < 5e-3
    assert abs(lp.costsvector @ x - cost_gt) < 0.1 * max(1, abs(cost_gt))


def test_admm_blocks_exact_convergence(blocky_problem):
    lp, x_gt = blocky_problem
    cost_gt = lp.costsvector @ x_gt
    assert len(lp.a_inequalities.blocks) == 4
    x, _ = lp.solve(method="admm_blocks", nb_iter=5000, nb_iter_plot=2500)
    assert lp.max_constraint_violation(x) < 1e-6
    np.testing.assert_allclose(lp.costsvector @ x, cost_gt, rtol=1e-5)


def test_admm_blocks_sharded_matches_single_device(blocky_problem):
    """Mesh-sharded consensus ADMM must give the same answer as 1-device."""
    lp, x_gt = blocky_problem
    x1, _ = lp.solve(method="admm_blocks", nb_iter=2000, nb_iter_plot=2000)
    mesh = Mesh(np.array(jax.devices()[:4]), ("blocks",))
    x4, _ = lp.solve(method="admm_blocks", nb_iter=2000, nb_iter_plot=2000,
                     mesh=mesh)
    np.testing.assert_allclose(x1, x4, atol=1e-8)


def test_admm_equality_only():
    lp, x_feas = generate_random_lp(nbvar=20, n_eq=8, n_ineq=0, sparsity=0.4,
                                    seed=3)
    x_gt = lp.solve(method="scipy_simplex", get_timing=False)
    x, _ = lp.solve(method="admm2", nb_iter=3000, nb_iter_plot=1000)
    assert lp.max_constraint_violation(x) < 1e-2
    assert abs(lp.costsvector @ (x - x_gt)) < 0.1 * max(
        1, abs(lp.costsvector @ x_gt)
    )


def test_stop_tol_terminates_admm_family():
    import numpy as np

    from pysparselp_tpu.utils.random_lp import generate_random_lp

    lp, _ = generate_random_lp(nbvar=20, n_eq=2, n_ineq=20, sparsity=0.3,
                               seed=3)
    for method, kw in (
        ("admm", {}),
        ("admm", {"inner": "gauss_seidel"}),
        ("admm2", {}),
        ("admm_blocks", {}),
        # (dual methods recover the primal from reduced-cost signs, which
        # oscillates between vertices; feasibility-based tolerance rarely
        # fires there, so they are not asserted here)
    ):
        lp.solve(method=method, nb_iter=100000, nb_iter_plot=500,
                 stop_tol=1e-3, **kw)
        assert lp.itrn_curve[-1] < 100000, method  # terminated on tolerance


def test_admm2_adaptive_rho():
    import numpy as np

    from pysparselp_tpu.utils.random_lp import generate_random_lp

    lp, _ = generate_random_lp(nbvar=25, n_eq=2, n_ineq=25, sparsity=0.25,
                               seed=8)
    ref, _ = lp.solve(method="scipy_simplex")
    x, _ = lp.solve(method="admm2", nb_iter=3000, nb_iter_plot=300,
                    adaptive_rho=True)
    assert abs(lp.cost(x) - lp.cost(ref)) < 5e-2
    assert lp.max_constraint_violation(x) < 1e-2
    # adaptive run must not be worse than the fixed-penalty run
    x_fixed, _ = lp.solve(method="admm2", nb_iter=3000, nb_iter_plot=300)
    assert (abs(lp.cost(x) - lp.cost(ref))
            <= abs(lp.cost(x_fixed) - lp.cost(ref)) * 3 + 1e-6)
