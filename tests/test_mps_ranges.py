"""MPS RANGES support — a capability *beyond* the reference.

The reference parser raises on RANGES (``pysparselp/MPSparser.py:70-72``);
this framework implements the standard semantics (L: ``[rhs-|R|, rhs]``,
G: ``[rhs, rhs+|R|]``, E: two-sided ``[rhs, rhs+R]`` / ``[rhs+R, rhs]`` by
sign of R).  No vendored netlib SIF carries a RANGES section (and the
environment has no network), so the semantics are locked down on a
synthetic fixed-column MPS verified end-to-end against scipy linprog.
"""

import io
import os

import numpy as np
import pytest
import scipy.optimize

from pysparselp_tpu.io.mps import mps_parser

__folder__ = os.path.dirname(__file__)

def _row(f1, f2, f3="", f4="", f5="", f6=""):
    """Emit one fixed-column MPS data line matching the standard field
    positions the tokenizer reads: [1:3], [4:12], [14:22], [24:36],
    [39:47], [49:61]."""
    return (" " + str(f1).ljust(2) + " " + str(f2).ljust(8) + "  "
            + str(f3).ljust(8) + "  " + str(f4).ljust(12) + "   "
            + str(f5).ljust(8) + "  " + str(f6))


RANGES_MPS = "\n".join([
    "NAME          RANGETEST",
    "ROWS",
    _row("N", "COST"),
    _row("L", "LIM1"),
    _row("G", "LIM2"),
    _row("E", "EQ1"),
    _row("E", "EQ2"),
    _row("E", "EQ3"),
    "COLUMNS",
    _row("", "X1", "COST", "1.0", "LIM1", "1.0"),
    _row("", "X1", "LIM2", "1.0", "EQ1", "1.0"),
    _row("", "X2", "COST", "2.0", "LIM1", "1.0"),
    _row("", "X2", "EQ2", "1.0"),
    _row("", "X3", "COST", "0.5", "EQ3", "1.0"),
    "RHS",
    _row("", "RHS", "LIM1", "4.0", "LIM2", "1.0"),
    _row("", "RHS", "EQ1", "2.0", "EQ2", "3.0"),
    _row("", "RHS", "EQ3", "5.0"),
    "RANGES",
    _row("", "RNG", "LIM1", "2.0", "LIM2", "3.0"),
    _row("", "RNG", "EQ1", "1.5", "EQ2", "-1.0"),
    "ENDATA",
]) + "\n"


@pytest.fixture(scope="module")
def parsed():
    return mps_parser(io.StringIO(RANGES_MPS))


def test_ranges_two_sided_bounds(parsed):
    d = parsed
    # LIM1 (L, rhs 4, R 2) -> [2, 4]; LIM2 (G, rhs 1, R 3) -> [1, 4];
    # EQ1 (E, rhs 2, R 1.5) -> [2, 3.5]; EQ2 (E, rhs 3, R -1) -> [2, 3].
    np.testing.assert_allclose(d["b_lower"], [2.0, 1.0, 2.0, 2.0])
    np.testing.assert_allclose(d["b_upper"], [4.0, 4.0, 3.5, 3.0])
    # EQ3 has no range entry and stays an equality with compacted id 0.
    assert d["a_eq"].shape == (1, 3)
    np.testing.assert_allclose(d["b_eq"], [5.0])
    np.testing.assert_allclose(d["a_eq"].toarray(), [[0.0, 0.0, 1.0]])


def test_ranges_converted_rows_keep_their_entries(parsed):
    a = parsed["a_ineq"].toarray()
    np.testing.assert_allclose(a[0], [1.0, 1.0, 0.0])  # LIM1: x1 + x2
    np.testing.assert_allclose(a[1], [1.0, 0.0, 0.0])  # LIM2: x1
    np.testing.assert_allclose(a[2], [1.0, 0.0, 0.0])  # EQ1 -> ineq: x1
    np.testing.assert_allclose(a[3], [0.0, 1.0, 0.0])  # EQ2 -> ineq: x2


def test_ranges_problem_solves_to_expected_optimum(parsed):
    d = parsed
    a_ub = scipy.sparse.vstack([d["a_ineq"], -d["a_ineq"]])
    b_ub = np.concatenate([d["b_upper"], -d["b_lower"]])
    res = scipy.optimize.linprog(
        d["cost_vector"], A_ub=a_ub, b_ub=b_ub,
        A_eq=d["a_eq"], b_eq=d["b_eq"],
        bounds=list(zip(d["lower_bounds"], d["upper_bounds"])),
        method="highs",
    )
    assert res.success
    # min x1 + 2 x2 + 0.5 x3 over x1 in [2, 3.5], x2 in [2, 3], x3 = 5,
    # x1 + x2 <= 4  ->  x = (2, 2, 5), objective 8.5.
    np.testing.assert_allclose(res.x, [2.0, 2.0, 5.0], atol=1e-9)
    np.testing.assert_allclose(res.fun, 8.5, atol=1e-9)


def test_zero_range_on_equality_stays_equality():
    mps = RANGES_MPS.replace(_row("", "RNG", "EQ1", "1.5", "EQ2", "-1.0"),
                             _row("", "RNG", "EQ1", "0.0"))
    d = mps_parser(io.StringIO(mps))
    # EQ1 (zero range) and EQ2/EQ3 (no range) all remain equalities.
    assert d["a_eq"].shape == (3, 3)
    assert d["a_ineq"].shape == (2, 3)


def test_scagr7_perplex_solution_vendored():
    """Data parity: all 6 reference perPlex certificates are vendored
    (reference ``pysparselp/data/perPlex/scagr7.txt``)."""
    path = os.path.join(os.path.dirname(__folder__), "pysparselp_tpu", "io",
                        "data", "perPlex", "scagr7.txt")
    with open(path) as f:
        text = f.read()
    names = text.count("V Name")
    states = text.count("V State")
    assert names == states == 140  # SCAGR7 has 140 structural variables
    # basic variables carry explicit rational values; the rest sit on bounds
    assert text.count("V Value") == text.count("V State    : Basic") == 97
    assert "Probname : SCAGR7" in text
