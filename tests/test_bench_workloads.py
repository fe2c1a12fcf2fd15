"""Bench workload builders are driver-critical: they must be
deterministic (the recorded reference-CPU baselines were measured on
these exact matrices) and must match the shapes recorded in bench.py's
baseline provenance comments."""

import sys

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402


def test_unstructured_matrix_matches_baseline_provenance():
    a, b, c = bench._unstructured_matrix()
    assert a.shape == (150_000, 100_000)
    assert a.nnz == 1_949_874  # the matrix the 126.8 it/s ref ran on
    # feasible interior point => the LP is feasible by construction
    assert b.shape == (150_000,) and c.shape == (100_000,)
    a2, b2, _ = bench._unstructured_matrix()
    assert a2.nnz == a.nnz and np.array_equal(b2, b)


def test_kmedians_lp_matches_baseline_provenance():
    lp = bench._kmedians_lp()
    assert lp.nb_variables == 150_030
    assert lp.a_inequalities.shape[0] == 150_001
    assert lp.a_equalities.shape == (5_000, 150_030)
    assert lp.a_inequalities.nnz + lp.a_equalities.nnz == 450_030
