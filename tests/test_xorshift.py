"""XorShift determinism + the Mehrotra random-instance self-test.

Mirrors the reference's PDIP self-test (``MehrotraPDIP.py:218-228``): a
random standard-form LP generated with the language-portable XorShift RNG,
solved to interior-point tolerance.
"""

import numpy as np
import scipy.optimize
import scipy.sparse

from pysparselp_tpu.solvers.mehrotra import mpc_sol
from pysparselp_tpu.utils import XorShift


def test_xorshift_stream_is_deterministic():
    g1, g2 = XorShift(), XorShift()
    s1 = [g1.next_value() for _ in range(5)]
    s2 = [g2.next_value() for _ in range(5)]
    assert s1 == s2
    assert all(0 <= v < 2**32 for v in s1)
    r = XorShift().rand(3, 4)
    assert r.shape == (3, 4) and np.all((r >= 0) & (r < 1))
    z = XorShift().randn(2, 500)
    assert abs(z.mean()) < 0.2 and abs(z.std() - 1) < 0.2


def test_mehrotra_selftest_on_xorshift_instance():
    rng = XorShift()
    m, n = 12, 30
    a = rng.rand(m, n)
    xfeas = rng.rand(n, 1).ravel()
    b = a @ xfeas
    c = rng.rand(n, 1).ravel()

    f, x, y, s, niter = mpc_sol(scipy.sparse.csr_matrix(a), b, c,
                                max_iter=60)
    assert np.all(np.isfinite(x)) and np.all(x >= -1e-9)
    assert np.abs(a @ x - b).max() < 1e-7
    # primal-dual optimality: complementarity gap closed
    assert abs(np.dot(x, s)) / (1 + abs(np.dot(c, x))) < 1e-7
    ref = scipy.optimize.linprog(c, A_eq=a, b_eq=b, bounds=(0, None)).fun
    assert abs(float(f) - ref) < 1e-6
