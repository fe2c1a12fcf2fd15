"""Checkpoint/resume, SolutionStat, debug mode, and the benchmark driver."""

import os

import numpy as np
import pytest

from pysparselp_tpu import (
    CheckpointingCallback,
    SparseLP,
    load_checkpoint,
    save_checkpoint,
)
from pysparselp_tpu.benchmarks import plot_results, run_solvers
from pysparselp_tpu.utils import (
    SolutionStat,
    assert_all_finite,
    debug_mode,
    load_arguments,
    save_arguments,
)
from pysparselp_tpu.utils.random_lp import generate_random_lp


@pytest.fixture(scope="module")
def lp():
    lp, _ = generate_random_lp(nbvar=25, n_eq=2, n_ineq=25, sparsity=0.25,
                               seed=2)
    return lp


def test_checkpoint_roundtrip(tmp_path):
    p = str(tmp_path / "state.npz")
    x = np.arange(5.0)
    save_checkpoint(p, x, y_eq=np.ones(2), niter=42, meta={"energy1": 3.5})
    st = load_checkpoint(p)
    np.testing.assert_array_equal(st["x"], x)
    np.testing.assert_array_equal(st["y_eq"], np.ones(2))
    assert st["y_ineq"] is None
    assert st["niter"] == 42
    assert float(st["meta"]["energy1"]) == 3.5


def test_checkpointing_callback_and_resume(lp, tmp_path):
    """Full-state checkpoint mid-solve, resume through lp.solve, and match
    the uninterrupted trajectory exactly (same chunk boundaries)."""
    x_full, _ = lp.solve(method="chambolle_pock_ppd", nb_iter=800,
                         nb_iter_plot=200)

    p = str(tmp_path / "cp.npz")
    ckpt = CheckpointingCallback(p, every_sec=0.0)  # checkpoint every tick
    lp.solve(method="chambolle_pock_ppd", nb_iter=400, nb_iter_plot=200,
             callback_func=ckpt.wrap(None))
    assert os.path.exists(p)
    st = load_checkpoint(p)
    assert st["niter"] == 400
    assert st["y_eq"] is not None and st["y_ineq"] is not None
    assert "x3" in st["meta"]

    x_res, _ = lp.solve(method="chambolle_pock_ppd", nb_iter=400,
                        nb_iter_plot=200, x0=st["x"], y_eq0=st["y_eq"],
                        y_ineq0=st["y_ineq"], x30=st["meta"]["x3"])
    np.testing.assert_allclose(x_res, x_full, atol=1e-9)


def test_warm_start_is_used_through_dispatch(lp):
    """x0 must actually reach the flagship solver through dispatch.

    Round-1 advisor finding: dispatch hardcoded ``x0=None``, so any
    user-supplied warm start was silently discarded — the trajectories of a
    warm and a cold run were identical."""
    ref, _ = lp.solve(method="scipy_simplex")
    warm, _ = lp.solve(method="chambolle_pock_ppd", nb_iter=100,
                       nb_iter_plot=100, x0=ref)
    cold, _ = lp.solve(method="chambolle_pock_ppd", nb_iter=100,
                       nb_iter_plot=100)
    assert np.max(np.abs(warm - cold)) > 1e-8


def test_full_state_resume_with_fixed_variables(tmp_path):
    """Resume must survive remove_fixed_variables' reduced-space mapping."""
    from pysparselp_tpu.utils.random_lp import generate_random_lp

    lp, _ = generate_random_lp(nbvar=25, n_eq=2, n_ineq=25, sparsity=0.25,
                               seed=7)
    # pin a few variables (lb == ub) so dispatch actually reduces
    lp.upper_bounds[:3] = lp.lower_bounds[:3]
    x_full, _ = lp.solve(method="chambolle_pock_ppd", nb_iter=600,
                         nb_iter_plot=200)

    p = str(tmp_path / "cp.npz")
    ckpt = CheckpointingCallback(p, every_sec=0.0)
    lp.solve(method="chambolle_pock_ppd", nb_iter=200, nb_iter_plot=200,
             callback_func=ckpt)
    st = load_checkpoint(p)
    x_res, _ = lp.solve(method="chambolle_pock_ppd", nb_iter=400,
                        nb_iter_plot=200, x0=st["x"], y_eq0=st["y_eq"],
                        y_ineq0=st["y_ineq"], x30=st["meta"]["x3"])
    np.testing.assert_allclose(x_res, x_full, atol=1e-9)
    # fixed variables keep their pinned values in the returned solution
    np.testing.assert_allclose(x_res[:3], lp.lower_bounds[:3], atol=1e-9)


def test_solution_stat_records(lp):
    stat = SolutionStat(lp)
    lp.solve(method="chambolle_pock_ppd", nb_iter=300, nb_iter_plot=100,
             callback_func=stat)
    assert stat.iterations == [100, 200, 300]
    assert len(stat.costs) == 3
    assert stat.summary()["niter"] == 300
    assert np.isfinite(stat.summary()["final_cost"])


def test_save_load_arguments(tmp_path):
    p = str(tmp_path / "args.pkl")

    def solver_entry(c, a, tol=1e-3):
        save_arguments(p)
        return c

    solver_entry(np.ones(3), "matrix", tol=0.5)
    st = load_arguments(p)
    np.testing.assert_array_equal(st["c"], np.ones(3))
    assert st["a"] == "matrix"
    assert st["tol"] == 0.5


def test_debug_mode_and_assert_finite():
    import jax

    with debug_mode(nans=True):
        assert jax.config.jax_debug_nans
    assert not jax.config.jax_debug_nans
    assert_all_finite("ok", np.ones(3))
    with pytest.raises(FloatingPointError, match="non-finite"):
        assert_all_finite("bad", np.array([1.0, np.nan]))


def test_benchmark_driver_and_plot(lp, tmp_path):
    gt, _ = lp.solve(method="scipy_simplex")
    results = run_solvers(
        lp, ground_truth=gt,
        methods=["chambolle_pock_ppd", "dual_gradient_ascent"],
        nb_iter=300, nb_iter_plot=100, max_time=30.0, verbose=False,
    )
    assert set(results) == {"chambolle_pock_ppd", "dual_gradient_ascent"}
    for r in results.values():
        assert "error" not in r
        assert len(r["itrn_curve"]) == 3
        assert len(r["distance_to_ground_truth"]) == 3
    fig = plot_results(results, show=False,
                       save_path=str(tmp_path / "bench.png"))
    assert fig is not None
    assert (tmp_path / "bench.png").exists()


def test_linear_solve_wrappers():
    import scipy.sparse

    from pysparselp_tpu.ops.linear_solve import (
        CgSolver,
        DenseCholesky,
        make_spd_solver,
    )

    rng = np.random.RandomState(0)
    a = rng.randn(30, 30)
    m = a @ a.T + 30 * np.eye(30)
    b = rng.randn(30)
    ref = np.linalg.solve(m, b)

    dc = DenseCholesky(m)
    np.testing.assert_allclose(np.asarray(dc.solve(b)), ref, atol=1e-8)

    sp = scipy.sparse.csr_matrix(m)
    s = make_spd_solver(sp)
    np.testing.assert_allclose(np.asarray(s.solve(b)), ref, atol=1e-8)

    cg = CgSolver(lambda v: m @ v, diag=np.diag(m), maxiter=300)
    np.testing.assert_allclose(np.asarray(cg.solve(b)), ref, atol=1e-6)

    big = make_spd_solver(sp, dense_max_dim=10, diag=np.diag(m))
    np.testing.assert_allclose(np.asarray(big.solve(b)), ref, atol=1e-6)


def test_benchmark_random_lp_harness():
    from pysparselp_tpu.benchmarks import benchmark_random_lp

    results, lp = benchmark_random_lp(
        nbvar=20, n_eq=2, n_ineq=20, sparsity=0.3, seed=2,
        methods=["chambolle_pock_ppd", "admm2"],
        nb_iter=400, nb_iter_plot=200, max_time=30.0, verbose=False,
    )
    assert set(results) == {"chambolle_pock_ppd", "admm2"}
    for r in results.values():
        assert np.isfinite(r["cost"]) and len(r["itrn_curve"]) == 2
        assert r["distance_to_ground_truth"][-1] < 10.0
