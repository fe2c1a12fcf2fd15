"""Vendored ``example.mps`` (the public lp_solve MPS-format docs example,
also shipped by the reference at ``pysparselp/data/example.mps``): parse it,
build a :class:`SparseLP`, and solve to the hand-computed optimum.

The model: min x1 + 4 x2 + 9 x3 s.t. x1 + x2 <= 5, x1 + x3 >= 10,
-x2 + x3 = 7, x1 in [0, 4], x2 in [-1, 1], x3 >= 0.  Substituting
x3 = 7 + x2 gives min x1 + 13 x2 + 63 with x1 + x2 >= 3, so the optimum
is x = (4, -1, 6) with objective 54.
"""

import os

import numpy as np

from pysparselp_tpu import SparseLP
from pysparselp_tpu.io.mps import mps_parser

DATA = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                    "pysparselp_tpu", "io", "data", "example.mps")


def _parse():
    with open(DATA) as f:
        return mps_parser(f)


def test_example_mps_parses():
    d = _parse()
    np.testing.assert_allclose(d["cost_vector"], [1.0, 4.0, 9.0])
    # one equality row (MYEQN), two inequality rows (LIM1 L, LIM2 G)
    assert d["a_eq"].shape == (1, 3)
    np.testing.assert_allclose(d["b_eq"], [7.0])
    np.testing.assert_allclose(d["a_eq"].toarray(), [[0.0, -1.0, 1.0]])
    assert d["a_ineq"].shape == (2, 3)
    np.testing.assert_allclose(d["b_upper"][0], 5.0)       # LIM1: <= 5
    assert d["b_lower"][0] == -np.inf
    np.testing.assert_allclose(d["b_lower"][1], 10.0)      # LIM2: >= 10
    assert d["b_upper"][1] == np.inf
    np.testing.assert_allclose(d["lower_bounds"], [0.0, -1.0, 0.0])
    np.testing.assert_allclose(d["upper_bounds"][:2], [4.0, 1.0])
    assert d["upper_bounds"][2] == np.inf


def test_example_mps_solves_to_known_optimum():
    d = _parse()
    lp = SparseLP()
    lp.add_variables_array(
        3, lower_bounds=d["lower_bounds"],
        upper_bounds=np.minimum(d["upper_bounds"], 100.0),
        costs=d["cost_vector"])
    lp.add_equality_constraints_sparse(d["a_eq"], d["b_eq"])
    lp.add_inequality_constraints_sparse(d["a_ineq"], d["b_lower"],
                                         d["b_upper"])
    lp.convert_to_one_sided_inequality_system()
    for method in ("scipy_simplex", "mehrotra"):
        x, _ = lp.solve(method=method, nb_iter=60)
        np.testing.assert_allclose(x, [4.0, -1.0, 6.0], atol=1e-6,
                                   err_msg=method)
    np.testing.assert_allclose(lp.costsvector @ np.array([4.0, -1.0, 6.0]),
                               54.0)
