"""Typed per-solver configuration (SURVEY §5 config-system item)."""

import numpy as np
import pytest

from pysparselp_tpu import SparseLP
from pysparselp_tpu.config import (Admm2Config, ChambollePockConfig,
                                   CONFIG_CLASSES, MehrotraConfig,
                                   resolve_config)


@pytest.fixture()
def lp():
    rng = np.random.RandomState(3)
    cost = rng.rand(6, 6)
    lp = SparseLP()
    x = lp.add_variables_array(cost.shape, 0, 1, costs=cost)
    lp.add_equality_constraints(x, np.ones_like(cost), b=np.ones(6))
    return lp


def test_config_equivalent_to_kwargs(lp):
    x_kw, _ = lp.solve(method="admm2", nb_iter=500, nb_iter_plot=100,
                       adaptive_rho=True)
    x_cfg, _ = lp.solve(config=Admm2Config(nb_iter=500, nb_iter_plot=100,
                                           adaptive_rho=True))
    np.testing.assert_allclose(x_cfg, x_kw, atol=1e-12)


def test_config_names_the_method(lp):
    x, _ = lp.solve(config=MehrotraConfig(nb_iter=30))
    ref, _ = lp.solve(method="scipy_simplex")
    assert abs(lp.cost(x) - lp.cost(ref)) < 1e-6


def test_explicit_kwargs_override_config(lp):
    # non-default explicit kwargs win over config fields (values equal to
    # solve()'s defaults are indistinguishable from unset and yield to the
    # config — documented in solve()'s docstring)
    lp.solve(config=ChambollePockConfig(nb_iter=50, nb_iter_plot=25),
             nb_iter_plot=5)
    assert len(lp.itrn_curve) == 10  # 50/5, not 50/25


def test_unknown_option_raises_with_field_list(lp):
    with pytest.raises(TypeError, match="restart_perriod"):
        lp.solve(method="chambolle_pock_ppd", nb_iter=10,
                 restart_perriod=7)
    with pytest.raises(TypeError, match="valid options"):
        lp.solve(method="admm", nb_iter=10, adaptive_rho=True)


def test_every_builtin_method_has_a_config():
    from pysparselp_tpu.modeling import solving_methods

    for m in solving_methods:
        assert m in CONFIG_CLASSES, m


def test_resolve_config_roundtrip():
    cfg = resolve_config("chambolle_pock_ppd",
                         {"restart": "average", "stop_tol": 1e-6})
    assert cfg.restart == "average" and cfg.stop_tol == 1e-6
    assert cfg.solver_kwargs()["restart"] == "average"


def test_explicit_method_config_mismatch_raises(lp):
    """An explicit method that conflicts with the config's solver family
    errors instead of silently preferring one (advisor r2: the old
    default-value sentinel made method="chambolle_pock_ppd" ambiguous)."""
    with pytest.raises(ValueError, match="conflicts"):
        lp.solve(method="chambolle_pock_ppd", config=Admm2Config(nb_iter=5))
    with pytest.raises(ValueError, match="conflicts"):
        lp.solve(method="admm", config=ChambollePockConfig(nb_iter=5))


def test_explicit_method_with_shared_config_class(lp):
    """Methods sharing a config class stay selectable alongside it."""
    from pysparselp_tpu.config import ScipyConfig

    x, _ = lp.solve(method="scipy_simplex", config=ScipyConfig(nb_iter=50))
    assert np.all(np.isfinite(x))


def test_cvxopt_not_a_dead_dispatch_branch():
    """method="CVXOPT" either solves (cvxpy with a CVXOPT backend) or dies
    at the registry check — never at an unreachable dispatch branch."""
    from pysparselp_tpu.modeling import solving_methods

    rng = np.random.RandomState(3)
    cost = rng.rand(4, 4)
    lp2 = SparseLP()
    x = lp2.add_variables_array(cost.shape, 0, 1, costs=cost)
    lp2.add_equality_constraints(x, np.ones_like(cost), b=np.ones(4))
    if "CVXOPT" in solving_methods:
        import importlib.util

        assert importlib.util.find_spec("cvxpy") is not None  # registered => backend exists
        sol, _ = lp2.solve(method="CVXOPT", nb_iter=50)
        assert np.all(np.isfinite(sol))
    else:
        with pytest.raises(ValueError, match="not valid"):
            lp2.solve(method="CVXOPT", nb_iter=50)
