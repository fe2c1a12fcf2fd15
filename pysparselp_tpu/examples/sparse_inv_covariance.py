"""Sparse inverse covariance estimation as an LP (CLIME-style).

Reference: ``pysparselp/examples/example_sparse_inv_covariance.py`` —
estimate a sparse precision matrix P from an empirical covariance C by
solving  min ‖P‖₁  s.t.  ‖C P − I‖_∞ ≤ λ, modeled with a kron(C, I)
constraint block and L1 penalization via auxiliary variables.
"""

from __future__ import annotations

import numpy as np
from scipy import linalg, sparse

from ..modeling import SparseLP


class SparseInvCov(SparseLP):
    """Models the sparse-inverse-covariance LP
    (``example_sparse_inv_covariance.py:14-35``)."""

    def add_abs_penalization(self, ids, coef_penalization):
        ids = np.asarray(ids)
        aux = self.add_variables_array(
            ids.shape, upper_bounds=None, lower_bounds=0,
            costs=coef_penalization,
        )
        cols = np.column_stack((ids.ravel(), aux.ravel()))
        vals = np.tile(np.array([1.0, -1.0]), [ids.size, 1])
        self.add_inequality_constraints(cols, vals, lower_bounds=None,
                                        upper_bounds=0)
        vals = np.tile(np.array([-1.0, -1.0]), [ids.size, 1])
        self.add_inequality_constraints(cols, vals, lower_bounds=None,
                                        upper_bounds=0)


def make_data(n_samples=40, n_features=20, seed=1):
    from sklearn.datasets import make_sparse_spd_matrix

    prng = np.random.RandomState(seed)
    prec = make_sparse_spd_matrix(
        n_features, alpha=0.98, smallest_coef=0.4, largest_coef=0.7,
        random_state=prng,
    )
    cov = linalg.inv(prec)
    d = np.sqrt(np.diag(cov))
    cov /= d
    cov /= d[:, np.newaxis]
    prec *= d
    prec *= d[:, np.newaxis]
    x = prng.multivariate_normal(np.zeros(n_features), cov, size=n_samples)
    x -= x.mean(axis=0)
    x /= x.std(axis=0)
    return x, prec, cov


def run(display=False, method="mehrotra", nb_iter=6000, lamb=0.15):
    """Returns ``(sum_abs_diff, nb_zeros_lp)`` — the reference's test contract
    (``tests/test_sparse_inv_covariance.py:11-17``)."""
    x, prec, cov = make_data()
    n_features = x.shape[1]
    emp_cov = (x.T @ x) / x.shape[0]

    lp = SparseInvCov()
    ids = lp.add_variables_array(shape=emp_cov.shape, lower_bounds=None,
                                 upper_bounds=None)
    c = sparse.kron(sparse.csr_matrix(emp_cov), sparse.eye(n_features))
    lp.add_inequality_constraints_sparse(
        c,
        np.eye(emp_cov.shape[0]).flatten() - lamb,
        np.eye(emp_cov.shape[0]).flatten() + lamb,
    )
    lp.add_abs_penalization(ids, 1)
    lp.convert_to_one_sided_inequality_system()
    sol = lp.solve(method=method, nb_iter=nb_iter, max_time=np.inf,
                   nb_iter_plot=max(1, nb_iter // 4))[0]
    lp_prec = sol[ids]
    lp_prec = 0.5 * (lp_prec + lp_prec.T)
    lp_prec = lp_prec * (np.abs(lp_prec) > 1e-8)

    sum_abs_diff = float(np.sum(np.abs(lp_prec - prec)))
    nb_zeros_lp = int(np.sum(lp_prec == 0))
    if display:  # pragma: no cover
        print("sum_abs_diff", sum_abs_diff, "nb_zeros", nb_zeros_lp)
    return sum_abs_diff, nb_zeros_lp


if __name__ == "__main__":
    run(display=True)
