"""Column-sharded Mehrotra IPM on the virtual 8-device CPU mesh (VERDICT r2
item 5: ``mesh=`` reaches the interior-point solver)."""

import numpy as np
import pytest

from pysparselp_tpu.parallel.mesh import default_mesh
from pysparselp_tpu.parallel.sharded_mehrotra import mpc_sol_sharded
from pysparselp_tpu.solvers.mehrotra import mpc_sol


def _standard_form(m=8, n=30, seed=7):
    """Feasible bounded standard-form LP: min cᵀx, Ax=b, x>=0."""
    rng = np.random.RandomState(seed)
    a = rng.rand(m, n) * (rng.rand(m, n) < 0.6)
    a[:, :m] += np.eye(m)  # full row rank
    x_feas = rng.rand(n) + 0.5
    b = a @ x_feas
    c = rng.rand(n) + 0.1  # positive costs => bounded
    return a, b, c


def test_sharded_mehrotra_matches_single_chip():
    a, b, c = _standard_form()
    f1, x1, y1, s1, n1 = mpc_sol(a, b, c, max_iter=50)
    mesh = default_mesh(8)
    f8, x8, y8, s8, n8 = mpc_sol_sharded(a, b, c, mesh, max_iter=50)
    # identical trajectory up to reduction reassociation in f64
    np.testing.assert_allclose(x8, x1, atol=1e-9)
    np.testing.assert_allclose(y8, y1, atol=1e-9)
    assert abs(f8 - f1) < 1e-9


@pytest.mark.parametrize("ndev", [1, 4, 8])
def test_sharded_mehrotra_device_count_invariance(ndev):
    a, b, c = _standard_form(seed=3)
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:ndev]), ("cols",))
    f, x, _y, _s, _n = mpc_sol_sharded(a, b, c, mesh, max_iter=50)
    f1, x1, *_ = mpc_sol(a, b, c, max_iter=50)
    np.testing.assert_allclose(x, x1, atol=1e-8)


def test_sharded_mehrotra_cg_regime():
    """dense_threshold=0 forces the matrix-free sharded-CG Schur solve
    (one psum per CG step); result matches the dense-regime answer."""
    a, b, c = _standard_form(m=6, n=25, seed=11)
    mesh = default_mesh(8)
    f_d, x_d, *_ = mpc_sol_sharded(a, b, c, mesh, max_iter=50)
    f_cg, x_cg, *_ = mpc_sol_sharded(a, b, c, mesh, max_iter=50,
                                     dense_threshold=0)
    np.testing.assert_allclose(x_cg, x_d, atol=1e-6)


def test_mehrotra_mesh_dispatch():
    """lp.solve(method='mehrotra', mesh=...) routes through the sharded
    path and matches the single-chip solution."""
    from pysparselp_tpu import SparseLP

    rng = np.random.RandomState(5)
    cost = rng.rand(5, 5)
    lp = SparseLP()
    x = lp.add_variables_array(cost.shape, 0, 1, costs=cost)
    lp.add_equality_constraints(x, np.ones_like(cost), b=np.ones(5))
    x1, _ = lp.solve(method="mehrotra", nb_iter=40)
    x8, _ = lp.solve(method="mehrotra", nb_iter=40, mesh=default_mesh(8))
    np.testing.assert_allclose(x8, x1, atol=1e-8)
