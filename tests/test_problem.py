"""Tests for the device lowering (EllMatrix SpMV correctness)."""

import numpy as np
import scipy.sparse

from pysparselp_tpu.problem import EllMatrix, lower_lp
from pysparselp_tpu.utils.random_lp import generate_random_lp


def test_ell_matvec_matches_scipy():
    rng = np.random.RandomState(0)
    a = scipy.sparse.random(37, 53, density=0.1, random_state=rng, format="csr")
    m = EllMatrix.from_scipy(a)
    x = rng.randn(53)
    y = rng.randn(37)
    np.testing.assert_allclose(np.asarray(m.matvec(x)), a @ x, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(m.rmatvec(y)), a.T @ y, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(m.to_dense()), a.toarray(), rtol=1e-12)


def test_ell_empty_rows_and_cols():
    a = scipy.sparse.csr_matrix((5, 7))
    a[2, 3] = 4.0
    m = EllMatrix.from_scipy(a.tocsr())
    x = np.arange(7, dtype=float)
    np.testing.assert_allclose(np.asarray(m.matvec(x)), a @ x)
    np.testing.assert_allclose(np.asarray(m.rmatvec(np.ones(5))), a.T @ np.ones(5))


def test_lower_lp_roundtrip():
    lp, x_feas = generate_random_lp(nbvar=25, n_eq=5, n_ineq=20, sparsity=0.3, seed=4)
    prob = lower_lp(lp)
    assert prob.n == 25
    x = np.asarray(x_feas)
    r_eq = np.asarray(prob.a_eq.matvec(x)) - np.asarray(prob.b_eq)
    np.testing.assert_allclose(r_eq, 0.0, atol=1e-9)
    r = np.asarray(prob.a_ineq.matvec(x))
    assert np.all(r <= np.asarray(prob.b_upper) + 1e-9)
