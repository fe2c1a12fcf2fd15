"""Golden convergence curves on the Potts segmentation LP.

Mirrors the reference's second golden fixture
(``tests/test_pott_segmentation.py`` / ``test_pott_segmentation_curves.json``):
the first-order solver family runs fixed budgets on a small seeded Potts
image LP and the distance-to-graph-cut curves must match checked-in goldens.
Regenerate with ``pytest tests/test_golden_potts.py --update-goldens``.
"""

import json
import os

import numpy as np
import pytest

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "potts20_curves.json")

RUNS = {
    "chambolle_pock_ppd": dict(nb_iter=3000, nb_iter_plot=1000),
    "dual_gradient_ascent": dict(nb_iter=300, nb_iter_plot=100),
    "admm": dict(nb_iter=600, nb_iter_plot=200),
    "admm2": dict(nb_iter=600, nb_iter_plot=200),
    "dual_coordinate_ascent": dict(nb_iter=9, nb_iter_plot=3),
}


@pytest.fixture(scope="module")
def potts20():
    from pysparselp_tpu.examples.potts import build_linear_program

    lp, gt, idx, _ = build_linear_program(20, 0.5, 500, seed=1)
    return lp, gt, idx


@pytest.fixture(scope="module")
def goldens():
    if os.path.isfile(GOLDEN_PATH):
        with open(GOLDEN_PATH) as f:
            return json.load(f)
    return {}


@pytest.mark.parametrize("method", sorted(RUNS))
def test_golden_potts_curves(potts20, goldens, method, request):
    lp, gt, idx = potts20
    update = request.config.getoption("--update-goldens")
    lp.solve(method=method, ground_truth=gt, ground_truth_indices=idx,
             **RUNS[method])
    got = {
        "itrn": [int(i) for i in lp.itrn_curve],
        "dist": [float(v) for v in lp.distance_to_ground_truth],
        "pobj": [float(v) for v in lp.pobj_curve],
    }
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
    for key in ("dist", "pobj"):
        np.testing.assert_allclose(
            got[key], ref[key], rtol=1e-7, atol=1e-9,
            err_msg=f"{method}:{key} curve drifted from golden",
        )
