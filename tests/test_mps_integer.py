"""Integer MPS declarations (BEYOND the reference, which raises at
``MPSparser.py:173-175``): BOUNDS BV/LI/UI and COLUMNS INTORG/INTEND
markers parse into an ``is_integer`` mask, the mask reaches
``SparseLP.is_integer``, and a MIP-flavored file solves end-to-end —
LP relaxation, ``force_integer``, ``greedy_round`` — with the result
verified by constraint propagation.

The model: min -2 X1 - 3 X2 - Z + 0.5 W
           s.t. X1 + X2 + Z <= 2.2        (CAP, L row)
                X1 + W      >= 1          (USE, G row)
           X1, X2 integer in [0, 2] (INTORG/INTEND markers),
           Z binary (BV), W integer in [1, 3] (LI/UI).
LP relaxation optimum: (0.2, 2, 0, 1) with objective -5.9 (X1 fractional
— strictly below the 0.5 rounding knife edge, so rounded iterates near
the relax optimum are integer-feasible and force_integer can track them).
Integer optimum:       (0,   2, 0, 1) with objective -5.5.
"""

import io

import numpy as np

from pysparselp_tpu.integer.propagation import propagate_constraints
from pysparselp_tpu.integer.rounding import greedy_round
from pysparselp_tpu.io.mps import mps_parser, to_sparse_lp

def _l(f1="", f2="", f3="", f4="", f5="", f6=""):
    """One fixed-column MPS line: fields at 0-based columns 1/4/14/24/39/49
    (the positions ``mps._fields`` reads)."""
    return (f" {f1:<2} {f2:<10}{f3:<10}{f4:<15}{f5:<10}{f6}").rstrip()


MIP_MPS = "\n".join([
    "NAME          TINYMIP",
    "ROWS",
    " N  COST",
    " L  CAP",
    " G  USE",
    "COLUMNS",
    _l("", "MARKER", "'MARKER'", "", "'INTORG'"),
    _l("", "X1", "COST", "-2.0", "CAP", "1.0"),
    _l("", "X1", "USE", "1.0"),
    _l("", "X2", "COST", "-3.0", "CAP", "1.0"),
    _l("", "MARKER", "'MARKER'", "", "'INTEND'"),
    _l("", "Z", "COST", "-1.0", "CAP", "1.0"),
    _l("", "W", "COST", "0.5", "USE", "1.0"),
    "RHS",
    _l("", "RHS", "CAP", "2.2", "USE", "1.0"),
    "BOUNDS",
    _l("UP", "BND", "X1", "2.0"),
    _l("UP", "BND", "X2", "2.0"),
    _l("BV", "BND", "Z"),
    _l("LI", "BND", "W", "1"),
    _l("UI", "BND", "W", "3"),
    "ENDATA",
]) + "\n"


def _parse():
    return mps_parser(io.StringIO(MIP_MPS))


def test_integer_declarations_parse():
    d = _parse()
    np.testing.assert_allclose(d["cost_vector"], [-2.0, -3.0, -1.0, 0.5])
    # X1/X2 from the INTORG block, Z from BV, W from LI/UI
    np.testing.assert_array_equal(d["is_integer"],
                                  [True, True, True, True])
    np.testing.assert_allclose(d["lower_bounds"], [0.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(d["upper_bounds"], [2.0, 2.0, 1.0, 3.0])


def test_marker_only_integrality_and_continuous_mix():
    # drop the BOUNDS integer lines: only the marker block is integer
    txt = MIP_MPS.replace(_l("BV", "BND", "Z") + "\n", "") \
                 .replace(_l("LI", "BND", "W", "1"),
                          _l("LO", "BND", "W", "1.0")) \
                 .replace(_l("UI", "BND", "W", "3"),
                          _l("UP", "BND", "W", "3.0"))
    d = mps_parser(io.StringIO(txt))
    np.testing.assert_array_equal(d["is_integer"],
                                  [True, True, False, False])
    # bounds identical either way — integrality is the only difference
    np.testing.assert_allclose(d["lower_bounds"], [0.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(d["upper_bounds"],
                               [2.0, 2.0, np.inf, 3.0])


def test_mip_solves_with_force_integer_and_propagation_verifies():
    d = _parse()
    lp = to_sparse_lp(d)
    np.testing.assert_array_equal(lp.is_integer, d["is_integer"])

    # LP relaxation: fractional X1
    relax, _ = lp.solve(method="mehrotra", nb_iter=60)
    np.testing.assert_allclose(relax, [0.2, 2.0, 0.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(lp.cost(relax), -5.9, atol=1e-6)

    # greedy rounding from the relaxation reaches the integer optimum
    x_round, valid = greedy_round(relax.copy(), lp)
    assert valid == 1
    np.testing.assert_allclose(x_round, [0.0, 2.0, 0.0, 1.0], atol=1e-9)
    np.testing.assert_allclose(lp.cost(x_round), -5.5, atol=1e-9)

    # force_integer end-to-end through solve(): the tracked best rounded
    # iterate must be integral and feasible
    x_fi, _ = lp.solve(method="chambolle_pock_ppd", nb_iter=4000,
                       nb_iter_plot=200, force_integer=True)
    np.testing.assert_allclose(x_fi, np.round(x_fi), atol=1e-7)
    assert lp.max_constraint_violation(np.round(x_fi)) <= 1e-7
    assert lp.cost(np.round(x_fi)) <= -5.5 + 1e-6

    # propagation-verify the integer solution: with every variable fixed
    # at its rounded value the system is consistent...
    import copy

    lp2 = copy.deepcopy(lp)
    lp2.convert_to_all_inequalities()
    a_csr = lp2.a_inequalities.tocsr()
    a_csc = a_csr.tocsc()
    x_l = x_round.copy()
    x_u = x_round.copy()
    ok, _row = propagate_constraints(
        np.arange(a_csr.shape[1]), x_l, x_u, a_csr, a_csc,
        lp2.b_lower, lp2.b_upper, [])
    assert ok == 1
    # ...and an infeasible integer point is flagged with a violated row
    x_bad = np.array([2.0, 2.0, 1.0, 1.0])
    ok, row = propagate_constraints(
        np.arange(a_csr.shape[1]), x_bad.copy(), x_bad.copy(), a_csr,
        a_csc, lp2.b_lower, lp2.b_upper, [])
    assert ok == 0 and row is not None
