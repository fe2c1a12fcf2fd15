"""light_metrics solve mode: one-fetch checkpoints with the same curves.

The light path records device scalars lazily and materializes them after
the solve; the trajectory is identical to the default path (the compute
is unchanged — only the per-checkpoint host traffic differs), and
``max_violated_constraint`` comes from the solver's converted one-sided
system instead of a host-side recompute on the original matrices."""

import numpy as np
import pytest

from pysparselp_tpu import SparseLP


def _make_lp(seed=3):
    rng = np.random.RandomState(seed)
    cost = rng.rand(8, 8)
    lp = SparseLP()
    x = lp.add_variables_array(cost.shape, 0, 1, costs=cost)
    lp.add_equality_constraints(x, np.ones_like(cost), b=np.ones(8))
    lp.add_inequality_constraints(x.T, np.ones_like(cost),
                                  upper_bounds=np.ones(8))
    return lp


def _curves(lp):
    return {k: list(getattr(lp, k)) for k in
            ("itrn_curve", "pobj_curve", "dobj_curve",
             "max_violated_equality", "max_violated_inequality",
             "max_violated_constraint")}


def test_light_metrics_matches_default_curves():
    kwargs = dict(method="chambolle_pock_ppd", nb_iter=3000,
                  nb_iter_plot=1000, dtype=np.float64)
    lp = _make_lp()
    sol_d, _ = lp.solve(**kwargs)
    default = _curves(lp)
    sol_l, _ = lp.solve(light_metrics=True, **kwargs)
    light = _curves(lp)

    np.testing.assert_allclose(sol_l, sol_d, atol=1e-12)
    assert light["itrn_curve"] == default["itrn_curve"]
    for k in ("pobj_curve", "dobj_curve", "max_violated_equality",
              "max_violated_inequality"):
        assert all(isinstance(v, float) for v in light[k]), k
        np.testing.assert_allclose(light[k], default[k], rtol=1e-9,
                                   atol=1e-12, err_msg=k)
    # converted-system violation vs the host recompute on the original
    # matrices: same constraints (one-sided folding preserves violations)
    np.testing.assert_allclose(light["max_violated_constraint"],
                               default["max_violated_constraint"],
                               rtol=1e-6, atol=1e-9)


def test_light_metrics_ground_truth_distance_unpermuted():
    """With a ground truth the light path must still fetch + unpermute the
    solution for the distance curve (wants_solution stays True)."""
    kwargs = dict(method="chambolle_pock_ppd", nb_iter=4000,
                  nb_iter_plot=2000, dtype=np.float64)
    lp = _make_lp(seed=5)
    ref, _ = lp.solve(method="scipy_simplex")
    sol, _ = lp.solve(ground_truth=ref,
                      ground_truth_indices=np.arange(ref.size),
                      light_metrics=True, **kwargs)
    d = lp.distance_to_ground_truth
    assert len(d) == 2 and d[-1] < 0.05, d


@pytest.mark.parametrize("method", ["admm", "admm2", "admm_blocks"])
def test_light_metrics_admm_family_matches_default(method):
    """The one-fetch checkpoint contract extends to the ADMM family: the
    device loops are identical, only the per-checkpoint host traffic
    differs, so the recorded curves must match the default path."""
    kwargs = dict(method=method, nb_iter=60, nb_iter_plot=20,
                  dtype=np.float64)
    lp = _make_lp(seed=7)
    sol_d, _ = lp.solve(**kwargs)
    default = _curves(lp)
    sol_l, _ = lp.solve(light_metrics=True, **kwargs)
    light = _curves(lp)

    np.testing.assert_allclose(sol_l, sol_d, atol=1e-12)
    assert light["itrn_curve"] == default["itrn_curve"]
    for k in ("pobj_curve", "dobj_curve", "max_violated_equality",
              "max_violated_inequality"):
        assert all(isinstance(v, float) for v in light[k]), k
        np.testing.assert_allclose(light[k], default[k], rtol=1e-9,
                                   atol=1e-12, err_msg=k)


@pytest.mark.parametrize("method", ["admm", "admm2"])
def test_light_metrics_admm_family_mesh(method):
    """light_metrics composes with mesh= for the sharded ADMM paths."""
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:2]), ("r",))
    kwargs = dict(method=method, nb_iter=40, nb_iter_plot=20,
                  dtype=np.float64)
    lp = _make_lp(seed=9)
    sol_d, _ = lp.solve(mesh=mesh, **kwargs)
    default = _curves(lp)
    sol_l, _ = lp.solve(mesh=mesh, light_metrics=True, **kwargs)
    light = _curves(lp)

    np.testing.assert_allclose(sol_l, sol_d, atol=1e-12)
    assert light["itrn_curve"] == default["itrn_curve"]
    for k in ("pobj_curve", "max_violated_equality",
              "max_violated_inequality"):
        np.testing.assert_allclose(light[k], default[k], rtol=1e-9,
                                   atol=1e-12, err_msg=k)


def test_light_metrics_rejected_for_unsupported_solvers():
    lp = _make_lp()
    with pytest.raises(TypeError):
        lp.solve(method="mehrotra", nb_iter=10, light_metrics=True)


def test_dispatch_back_wrapper_preserves_wants_solution():
    """The fixed-variable untransform wrapper in ``solvers.dispatch`` must
    mirror ``wants_solution`` and skip the untransform (and its device
    fetch) for solution-less light callbacks."""
    import jax

    from pysparselp_tpu.solvers import dispatch

    lp = _make_lp()
    # fix one variable so remove_fixed_variables yields a real m_change
    lp.set_bounds_on_variables(np.array([5]), 0.25, 0.25)

    received = []

    def cb(niter, sol, *rest):
        received.append(sol)

    cb.wants_solution = False
    dispatch(lp, method="chambolle_pock_ppd", x0=None, nb_iter=200,
             max_time=None, callback_func=cb, nb_iter_plot=100,
             start_time=None, light_metrics=True)
    assert received
    # no untransform: the device array reaches the callback as-is
    assert all(isinstance(s, jax.Array) for s in received)

    received.clear()
    cb.wants_solution = True
    dispatch(lp, method="chambolle_pock_ppd", x0=None, nb_iter=200,
             max_time=None, callback_func=cb, nb_iter_plot=100,
             start_time=None, light_metrics=True)
    assert received
    # untransformed to the ORIGINAL variable space, fixed value restored
    assert all(isinstance(s, np.ndarray) and s.size == lp.nb_variables
               and abs(s[5] - 0.25) < 1e-9 for s in received)
