"""Bridge to scipy.optimize.linprog (reference ``SparseLP.py:1101-1132``).

The reference used scipy's (long removed) ``simplex`` / ``interior-point``
methods with per-iteration callbacks; modern scipy only ships HiGHS, which
does not support callbacks.  We map ``scipy_simplex`` → ``highs-ds`` and
``scipy_interior_point`` → ``highs-ipm`` and emit a single metrics point after
the solve (same behavior the reference has for OSQP, ``SparseLP.py:1372-1373``).
"""

from __future__ import annotations

import time

import numpy as np
import scipy.optimize

_METHOD_MAP = {
    "scipy_simplex": "highs-ds",
    "scipy_interior_point": "highs-ipm",
}


def solve_scipy(lp, method, nb_iter=10000, callback_func=None, start_time=None):
    if lp.b_lower is not None and lp.a_inequalities.shape[0] > 0 and not np.all(
        np.isinf(lp.b_lower) & (lp.b_lower < 0)
    ):
        raise ValueError(
            "you need to convert your lp to a one sided inequality system "
            "using convert_to_one_sided_inequality_system"
        )
    start = time.perf_counter() if start_time is None else start_time
    a_ineq = lp.a_inequalities.tocsr() if lp.a_inequalities.shape[0] else None
    a_eq = lp.a_equalities.tocsr() if lp.a_equalities.shape[0] else None
    sol = scipy.optimize.linprog(
        lp.costsvector,
        A_ub=a_ineq,
        b_ub=lp.b_upper if a_ineq is not None else None,
        A_eq=a_eq,
        b_eq=lp.b_equalities if a_eq is not None else None,
        bounds=np.column_stack((lp.lower_bounds, lp.upper_bounds)),
        method=_METHOD_MAP[method],
        options={"maxiter": int(nb_iter)},
    )
    x = np.asarray(sol.x, dtype=np.float64)
    if callback_func is not None:
        callback_func(
            int(getattr(sol, "nit", 0)),
            x,
            float(lp.costsvector.dot(x)),
            float(lp.costsvector.dot(x)),
            time.perf_counter() - start,
            0.0,
            0.0,
        )
    return x
