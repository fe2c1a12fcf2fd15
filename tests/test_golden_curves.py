"""Golden convergence-curve regression (the reference's core test pattern).

Every deterministic solver runs a fixed iteration budget on netlib SC105 and
its recorded curves (iterations, primal objective, max violations — never
wall-clock) must match the checked-in goldens element-wise.  Regenerate with

    pytest tests/test_golden_curves.py --update-goldens

mirroring the reference's ``update_results`` flag
(``tests/test_netlib.py:104-107``).  Determinism is part of the contract:
seeded RNG, no ``max_time`` budgets, float64 on the CPU mesh.
"""

import json
import os

import numpy as np
import pytest

from tests.test_netlib import sc105  # noqa: F401  (reuse the fixture)

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "sc105_curves.json")

RUNS = {
    "chambolle_pock_ppd": dict(nb_iter=2000, nb_iter_plot=500),
    "dual_gradient_ascent": dict(nb_iter=400, nb_iter_plot=100),
    "dual_coordinate_ascent": dict(nb_iter=40, nb_iter_plot=10),
    "admm": dict(nb_iter=400, nb_iter_plot=100),
    "admm2": dict(nb_iter=400, nb_iter_plot=100),
    "admm_blocks": dict(nb_iter=200, nb_iter_plot=50),
    "mehrotra": dict(nb_iter=100, nb_iter_plot=1),
    # HiGHS-native curves (solvers/highs_bridge): one point per
    # nb_iter_plot solver iterations, matching the reference's
    # per-iteration scipy callback contract (SparseLP.py:1101-1132)
    "scipy_simplex": dict(nb_iter=4000, nb_iter_plot=20),
    "scipy_interior_point": dict(nb_iter=4000, nb_iter_plot=5),
}


def _curves(lp):
    return {
        "itrn": [int(i) for i in lp.itrn_curve],
        "pobj": [float(v) for v in lp.pobj_curve],
        "viol_eq": [float(v) for v in lp.max_violated_equality],
        "viol_ineq": [float(v) for v in lp.max_violated_inequality],
    }


@pytest.fixture(scope="module")
def goldens():
    if os.path.isfile(GOLDEN_PATH):
        with open(GOLDEN_PATH) as f:
            return json.load(f)
    return {}


@pytest.mark.parametrize("method", sorted(RUNS))
def test_golden_curves_sc105(sc105, goldens, method, request):  # noqa: F811
    lp, _gt = sc105
    update = request.config.getoption("--update-goldens")
    lp.solve(method=method, **RUNS[method])
    got = _curves(lp)
    if update:
        goldens[method] = got
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(goldens, f, indent=1, sort_keys=True)
        pytest.skip("goldens updated")
    assert method in goldens, (
        f"no golden for {method}; run with --update-goldens"
    )
    ref = goldens[method]
    assert got["itrn"] == ref["itrn"]
    for key in ("pobj", "viol_eq", "viol_ineq"):
        np.testing.assert_allclose(
            got[key], ref[key], rtol=1e-7, atol=1e-9,
            err_msg=f"{method}:{key} curve drifted from golden",
        )
