"""Row-sharded ADMM solvers on the virtual 8-device CPU mesh (VERDICT r1
item 8: ``mesh=`` honored beyond the CP/admm_blocks paths)."""

import copy

import numpy as np
import pytest

from pysparselp_tpu import SparseLP
from pysparselp_tpu.parallel.mesh import default_mesh
from pysparselp_tpu.utils.random_lp import generate_random_lp


@pytest.fixture(scope="module")
def problem():
    lp, _ = generate_random_lp(nbvar=30, n_eq=3, n_ineq=28, sparsity=0.25,
                               seed=4)
    lp2 = copy.deepcopy(lp)
    lp2.convert_to_one_sided_inequality_system()
    return lp2


def test_admm2_mesh_matches_single_device(problem):
    lp = problem
    kw = dict(method="admm2", nb_iter=600, nb_iter_plot=300)
    x1, _ = lp.solve(**kw)
    x8, _ = lp.solve(mesh=default_mesh(8), **kw)
    np.testing.assert_allclose(x8, x1, atol=1e-9)


def test_admm2_mesh_cg_regime_matches_dense_regime(problem):
    # dense_threshold=0 forces the sharded-CG Schur path (one psum per CG
    # step); on this small SPD Schur system 100 preconditioned CG steps
    # reach machine precision, so the trajectory must match the factored
    # dense regime
    lp = problem
    kw = dict(method="admm2", nb_iter=120, nb_iter_plot=60,
              mesh=default_mesh(8))
    x_dense, _ = lp.solve(**kw)
    x_cg, _ = lp.solve(dense_threshold=0, **kw)
    np.testing.assert_allclose(x_cg, x_dense, atol=1e-7)


def test_admm_mesh_matches_single_device(problem):
    lp = problem
    kw = dict(method="admm", nb_iter=400, nb_iter_plot=200)
    x1, _ = lp.solve(**kw)
    x8, _ = lp.solve(mesh=default_mesh(8), **kw)
    np.testing.assert_allclose(x8, x1, atol=1e-9)


def test_admm_mesh_device_count_invariance(problem):
    lp = problem
    kw = dict(method="admm", nb_iter=200, nb_iter_plot=100)
    x2, _ = lp.solve(mesh=default_mesh(2), **kw)
    x8, _ = lp.solve(mesh=default_mesh(8), **kw)
    np.testing.assert_allclose(x8, x2, atol=1e-9)


def test_admm2_solves_to_optimum_on_mesh(problem):
    lp = problem
    ref, _ = lp.solve(method="scipy_simplex")
    # (ADMM's tail is slow on this instance: single-chip shows the same
    # ~2.6e-3 violation at 3000 iterations — the mesh path is not looser)
    x8, _ = lp.solve(method="admm2", nb_iter=3000, nb_iter_plot=1000,
                     mesh=default_mesh(8), adaptive_rho=True)
    assert abs(lp.cost(x8) - lp.cost(ref)) < 1e-2
    assert lp.max_constraint_violation(x8) < 5e-3


def test_mesh_dispatch_accepts_full_cp_option_surface(problem):
    """Every ChambollePockConfig option must reach the mesh path without
    TypeError (round-2 review finding: restart_period/save_problem crashed
    it)."""
    lp = problem
    x8, _ = lp.solve(method="chambolle_pock_ppd", mesh=default_mesh(8),
                     nb_iter=400, nb_iter_plot=200, restart="average",
                     restart_period=100, save_problem=False, theta=1.0,
                     stop_tol=1e-12)
    assert np.all(np.isfinite(x8))


def test_mesh_force_integer_matches_single_chip():
    """The sharded chunk tracks the best feasible integer-rounded iterate
    (feasibility pmax, energy psum over shards) — same answer as the
    single-chip path on an integral-polytope matching LP."""
    rng = np.random.RandomState(0)
    nb = 6
    cost = rng.rand(nb, nb)
    lp = SparseLP()
    ids = lp.add_variables_array((nb, nb), 0.0, 1.0, costs=cost)
    lp.add_equality_constraints(ids, np.ones_like(cost), b=np.ones(nb))
    lp.add_equality_constraints(ids.T, np.ones_like(cost), b=np.ones(nb))
    kwargs = dict(method="chambolle_pock_ppd", nb_iter=20000,
                  nb_iter_plot=1000, force_integer=True)
    x1, _ = lp.solve(**kwargs)
    x8, _ = lp.solve(mesh=default_mesh(8), **kwargs)
    assert np.allclose(x8, np.round(x8))
    assert lp.max_constraint_violation(x8) < 1e-9
    np.testing.assert_allclose(x8, x1)
