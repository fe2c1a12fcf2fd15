"""Windowed whole-iteration fused CP kernel (ops/cp_windowed) vs the
unfused reference iteration, in Pallas interpreter mode with the VMEM
budget shrunk so several windows + halos are exercised."""

import functools

import numpy as np
import pytest
import scipy.sparse

import jax
import jax.numpy as jnp

from pysparselp_tpu.ops import cp_windowed as cw
from pysparselp_tpu.problem import DiaMatrix, LPProblem
from pysparselp_tpu.solvers.chambolle_pock import _cp_iteration

OFFSETS = (-3, 0, 5, 130)


def _dia_problem(n=20000, seed=0):
    rng = np.random.RandomState(seed)
    mats = [rng.rand(n) * 2 - 1 for _ in OFFSETS]
    a = scipy.sparse.diags(mats, OFFSETS, shape=(n, n)).tocsr()
    dia = DiaMatrix.from_scipy(a, dtype=jnp.float32)
    f32 = jnp.float32
    prob = LPProblem(
        c=jnp.asarray(rng.rand(n), f32),
        lb=jnp.asarray(np.zeros(n), f32),
        ub=jnp.asarray(np.ones(n) * 2, f32),
        a_eq=None, b_eq=None,
        a_ineq=dia, b_lower=None,
        b_upper=jnp.asarray(rng.rand(n) * 2, f32),
        n=n, m_eq=0, m_ineq=n,
    )
    pre = dict(
        diag_t=jnp.asarray(rng.rand(n) * 0.1 + 0.01, f32),
        theta=jnp.asarray(1.0, f32),
        sigma_ineq=jnp.asarray(rng.rand(n) * 0.1 + 0.01, f32),
    )
    x0 = jnp.asarray(rng.rand(n), f32)
    y0 = jnp.asarray(rng.rand(n) * 0.1, f32)
    return prob, pre, x0, y0


@pytest.fixture()
def small_windows(monkeypatch):
    # shrink the budget so the 20k-position problem needs several windows
    monkeypatch.setattr(cw, "WINDOWED_VMEM_BUDGET", 2 * 1024 * 1024)
    monkeypatch.setattr(cw, "_MIN_WQ", 32)


def _reference(prob, pre, x0, y0, nsteps):
    state = (x0, x0, jnp.zeros(0, jnp.float32), y0)
    for _ in range(nsteps):
        state = _cp_iteration(prob, pre, state)
    return state


def test_window_layout_plans_multiple_windows(small_windows):
    prob, pre, x0, y0 = _dia_problem()
    plan = cw.window_layout(prob.a_ineq.offsets, prob.a_ineq.offsets_t,
                            prob.n, prob.m_ineq, 4)
    assert plan is not None
    wq, hq, gq, nw, kk = plan
    assert nw >= 3, plan
    assert wq >= hq + gq  # windows must cover their own halo+guard
    assert kk >= 1


def test_cp_windowed_matches_reference(small_windows):
    prob, pre, x0, y0 = _dia_problem()
    nsteps = 5
    x_r, x3_r, _ye, y_r = _reference(prob, pre, x0, y0, nsteps)
    x_w, x3_w, y_w = cw._cp_windowed_call(prob, pre, x0, y0, nsteps, 1.0,
                                          interpret=True)
    np.testing.assert_allclose(x_w, x_r, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(x3_w, x3_r, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(y_w, y_r, rtol=2e-5, atol=2e-5)


def test_cp_windowed_sums(small_windows):
    """with_sums accumulates the per-iteration primal/dual sums the PDLP
    restart-to-average controller consumes."""
    prob, pre, x0, y0 = _dia_problem(seed=3)
    nsteps = 4
    sx_ref = np.zeros(prob.n)
    sy_ref = np.zeros(prob.m_ineq)
    state = (x0, x0, jnp.zeros(0, jnp.float32), y0)
    for _ in range(nsteps):
        state = _cp_iteration(prob, pre, state)
        sx_ref += np.asarray(state[0], np.float64)
        sy_ref += np.asarray(state[3], np.float64)
    x_w, _x3, y_w, sx, sy = cw._cp_windowed_call(
        prob, pre, x0, y0, nsteps, 1.0, interpret=True, with_sums=True)
    np.testing.assert_allclose(sx, sx_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(sy, sy_ref, rtol=1e-4, atol=1e-4)


def test_cp_windowed_eligibility_gate():
    """Eligibility: ineq-only DIA beyond the fused budget; the driver must
    not select the windowed path off-TPU without the force hook."""
    prob, pre, x0, y0 = _dia_problem()
    assert not cw.cp_windowed_eligible(prob, jnp.float32)  # off-TPU
    try:
        cw._FORCE_INTERPRET = True
        assert cw.cp_windowed_eligible(prob, jnp.float32)
    finally:
        cw._FORCE_INTERPRET = False


@pytest.mark.parametrize("k", [1, 2, 3])
def test_cp_windowed_time_tiling_k(small_windows, monkeypatch, k):
    """K time-tiled iterations per launch must equal K unfused iterations
    (the halo covers K stencil radii; interiors stay exact)."""
    monkeypatch.setattr(
        cw, "window_layout",
        functools.partial(_layout_fixed_k, k))
    prob, pre, x0, y0 = _dia_problem(seed=7)
    nsteps = 2 * k + 1  # exercises full launches AND a remainder launch
    x_r, x3_r, _ye, y_r = _reference(prob, pre, x0, y0, nsteps)
    x_w, x3_w, y_w = cw._cp_windowed_call(prob, pre, x0, y0, nsteps, 1.0,
                                          interpret=True)
    np.testing.assert_allclose(x_w, x_r, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(y_w, y_r, rtol=2e-5, atol=2e-5)


_orig_window_layout = cw.window_layout


def _layout_fixed_k(k, offsets, offsets_t, n, m, iv, k_iters=None, eq=None):
    return _orig_window_layout(offsets, offsets_t, n, m, iv, k_iters=k,
                               eq=eq)


def test_cp_windowed_one_sided_offsets(small_windows):
    """Regression (r3 review): offset sets that do NOT straddle zero need
    the halo to cover the single-tap reach, not just the chained span —
    with offsets all >= 1200 the y-update reads x3 at +1300 which lies
    beyond a chained-span-only halo and silently read zeroed guard rows."""
    n = 20000
    rng = np.random.RandomState(5)
    offs = (1200, 1203, 1300)
    mats = [rng.rand(n) * 2 - 1 for _ in offs]
    a = scipy.sparse.diags(mats, offs, shape=(n, n)).tocsr()
    dia = DiaMatrix.from_scipy(a, dtype=jnp.float32)
    f32 = jnp.float32
    prob = LPProblem(
        c=jnp.asarray(rng.rand(n), f32),
        lb=jnp.zeros(n, f32), ub=jnp.ones(n, f32) * 2,
        a_eq=None, b_eq=None, a_ineq=dia, b_lower=None,
        b_upper=jnp.asarray(rng.rand(n) * 2, f32),
        n=n, m_eq=0, m_ineq=n,
    )
    pre = dict(diag_t=jnp.asarray(rng.rand(n) * 0.1 + 0.01, f32),
               theta=jnp.asarray(1.0, f32),
               sigma_ineq=jnp.asarray(rng.rand(n) * 0.1 + 0.01, f32))
    x0 = jnp.asarray(rng.rand(n), f32)
    y0 = jnp.asarray(rng.rand(n) * 0.1, f32)
    x_r, _x3r, _ye, y_r = _reference(prob, pre, x0, y0, 3)
    x_w, _x3w, y_w = cw._cp_windowed_call(prob, pre, x0, y0, 3, 1.0,
                                          interpret=True)
    np.testing.assert_allclose(x_w, x_r, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(y_w, y_r, rtol=2e-5, atol=2e-5)


def _dia_eq_problem(n=20000, seed=0, m_eq=None):
    """DIA problem with BOTH systems (eq offsets differ from ineq)."""
    rng = np.random.RandomState(seed)
    m_eq = n if m_eq is None else m_eq
    mats = [rng.rand(n) * 2 - 1 for _ in OFFSETS]
    a = scipy.sparse.diags(mats, OFFSETS, shape=(n, n)).tocsr()
    eq_offs = (-7, 0, 64)
    me = [rng.rand(n) * 2 - 1 for _ in eq_offs]
    ae = scipy.sparse.diags(me, eq_offs, shape=(m_eq, n)).tocsr()
    dia = DiaMatrix.from_scipy(a, dtype=jnp.float32)
    dia_e = DiaMatrix.from_scipy(ae, dtype=jnp.float32)
    f32 = jnp.float32
    xf = rng.rand(n)  # a feasible point so b_eq is consistent
    prob = LPProblem(
        c=jnp.asarray(rng.rand(n), f32),
        lb=jnp.asarray(np.zeros(n), f32),
        ub=jnp.asarray(np.ones(n) * 2, f32),
        a_eq=dia_e, b_eq=jnp.asarray(ae @ xf, f32),
        a_ineq=dia, b_lower=None,
        b_upper=jnp.asarray(rng.rand(n) * 2, f32),
        n=n, m_eq=m_eq, m_ineq=n,
    )
    pre = dict(
        diag_t=jnp.asarray(rng.rand(n) * 0.1 + 0.01, f32),
        theta=jnp.asarray(1.0, f32),
        sigma_eq=jnp.asarray(rng.rand(m_eq) * 0.1 + 0.01, f32),
        sigma_ineq=jnp.asarray(rng.rand(n) * 0.1 + 0.01, f32),
    )
    x0 = jnp.asarray(rng.rand(n), f32)
    ye0 = jnp.asarray(rng.rand(m_eq) * 0.1 - 0.05, f32)
    y0 = jnp.asarray(rng.rand(n) * 0.1, f32)
    return prob, pre, x0, ye0, y0


def _reference_eq(prob, pre, x0, ye0, y0, nsteps):
    state = (x0, x0, ye0, y0)
    for _ in range(nsteps):
        state = _cp_iteration(prob, pre, state)
    return state


def test_cp_windowed_eq_matches_reference(small_windows):
    """Eq+ineq windowed kernel vs the unfused iteration (VERDICT r3 #1:
    the canonical LP form must run windowed, parity to interpreter
    precision)."""
    prob, pre, x0, ye0, y0 = _dia_eq_problem()
    nsteps = 5
    x_r, x3_r, ye_r, y_r = _reference_eq(prob, pre, x0, ye0, y0, nsteps)
    x_w, x3_w, ye_w, y_w = cw._cp_windowed_call_full(
        prob, pre, x0, ye0, y0, nsteps, 1.0, interpret=True)
    np.testing.assert_allclose(x_w, x_r, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(x3_w, x3_r, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(ye_w, ye_r, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(y_w, y_r, rtol=2e-5, atol=2e-5)


def test_cp_windowed_eq_rectangular(small_windows):
    """m_eq != n != m_ineq: the joint window grid covers the longest
    system; shorter vectors are zero-padded with neutral updates."""
    prob, pre, x0, ye0, y0 = _dia_eq_problem(n=12000, seed=4, m_eq=14000)
    nsteps = 3
    x_r, _x3r, ye_r, y_r = _reference_eq(prob, pre, x0, ye0, y0, nsteps)
    x_w, _x3w, ye_w, y_w = cw._cp_windowed_call_full(
        prob, pre, x0, ye0, y0, nsteps, 1.0, interpret=True)
    np.testing.assert_allclose(x_w, x_r, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(ye_w, ye_r, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(y_w, y_r, rtol=2e-5, atol=2e-5)


def test_cp_windowed_eq_sums(small_windows):
    """with_sums accumulates x, y_eq AND y_ineq sums for the restart
    controller."""
    prob, pre, x0, ye0, y0 = _dia_eq_problem(seed=6)
    nsteps = 4
    sx_ref = np.zeros(prob.n)
    se_ref = np.zeros(prob.m_eq)
    sy_ref = np.zeros(prob.m_ineq)
    state = (x0, x0, ye0, y0)
    for _ in range(nsteps):
        state = _cp_iteration(prob, pre, state)
        sx_ref += np.asarray(state[0], np.float64)
        se_ref += np.asarray(state[2], np.float64)
        sy_ref += np.asarray(state[3], np.float64)
    _xw, _x3, _yew, _yw, sx, se, sy = cw._cp_windowed_call_full(
        prob, pre, x0, ye0, y0, nsteps, 1.0, interpret=True,
        with_sums=True)
    np.testing.assert_allclose(sx, sx_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(se, se_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(sy, sy_ref, rtol=1e-4, atol=1e-4)


def test_cp_windowed_eq_eligibility():
    """Eq systems are eligible when DIA-lowered; non-DIA eq blocks."""
    prob, pre, x0, ye0, y0 = _dia_eq_problem()
    try:
        cw._FORCE_INTERPRET = True
        assert cw.cp_windowed_eligible(prob, jnp.float32)
        import dataclasses

        class FakeOp:
            nrows, ncols = prob.m_eq, prob.n

        bad = dataclasses.replace(prob, a_eq=FakeOp())
        assert not cw.cp_windowed_eligible(bad, jnp.float32)
    finally:
        cw._FORCE_INTERPRET = False


def test_cp_windowed_eq_with_restart_controller(small_windows, monkeypatch):
    """The restart controller's windowed branch with an equality system
    must match the unfused controller (eq sums + eq restart state)."""
    from pysparselp_tpu.solvers.chambolle_pock import (
        _cp_chunk_restart_device, _kkt_score)

    prob, pre, x0, ye0, y0 = _dia_eq_problem(seed=13)
    f32 = jnp.float32
    rstate0 = {
        "state": (x0, x0, ye0, y0),
        "omega": jnp.asarray(1.0, f32),
        "mu_restart": _kkt_score(prob, x0, ye0, y0).astype(f32),
        "mu_last": jnp.asarray(np.inf, f32),
        "zx": x0, "zeq": ye0, "zineq": y0,
    }
    ref_rs, ref_metrics = _cp_chunk_restart_device(
        prob, pre, rstate0, 45, 20, use_fused=None, theta_f=1.0)
    monkeypatch.setattr(cw, "_FORCE_INTERPRET", True)
    win_rs, win_metrics = _cp_chunk_restart_device(
        prob, pre, rstate0, 45, 20, use_fused="windowed", theta_f=1.0)
    np.testing.assert_allclose(win_rs["state"][0], ref_rs["state"][0],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(win_rs["state"][2], ref_rs["state"][2],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(win_rs["omega"]),
                               float(ref_rs["omega"]), rtol=1e-4)
    np.testing.assert_allclose(float(win_metrics["energy1"]),
                               float(ref_metrics["energy1"]), rtol=1e-3)


def test_cp_windowed_eq_end_to_end_solver(small_windows, monkeypatch):
    """Full solver dispatch: an eq+ineq DIA problem routes to the
    windowed regime and matches the unfused per-op trajectory."""
    import functools as ft

    from pysparselp_tpu.solvers import chambolle_pock as cp_mod

    n = 9000
    rng = np.random.RandomState(17)
    offs = (-3, 0, 5)
    a = scipy.sparse.diags([rng.rand(n) * 2 - 1 for _ in offs], offs,
                           shape=(n, n)).tocsr()
    ae = scipy.sparse.diags([rng.rand(n) * 2 - 1 for _ in (0, 7)], (0, 7),
                            shape=(n, n)).tocsr()
    xf = rng.rand(n)
    c = rng.rand(n)
    lb, ub = np.zeros(n), np.ones(n) * 2
    b_eq = ae @ xf
    b_up = a @ xf + rng.rand(n)
    kwargs = dict(nb_max_iter=12, nb_iter_plot=6, dtype=jnp.float32,
                  permute=False)
    monkeypatch.setattr(
        cp_mod, "ell_from_scipy",
        ft.partial(__import__("pysparselp_tpu.problem",
                              fromlist=["ell_from_scipy"]).ell_from_scipy,
                   prefer="dia"))
    x_ref, _ = cp_mod.chambolle_pock_ppd(
        c, ae, b_eq, a, None, b_up, lb, ub, **kwargs)
    monkeypatch.setattr(cw, "_FORCE_INTERPRET", True)
    x_win, _ = cp_mod.chambolle_pock_ppd(
        c, ae, b_eq, a, None, b_up, lb, ub, **kwargs)
    np.testing.assert_allclose(x_win, x_ref, rtol=2e-5, atol=2e-5)


def test_cp_windowed_with_restart_controller(small_windows, monkeypatch):
    """The device-resident restart controller's windowed branch (sums +
    remainder calls) must match the unfused controller's trajectory —
    this combination only engages on TPU at >2M rows, so pin it here in
    interpreter mode."""
    from pysparselp_tpu.ops import cp_fused
    from pysparselp_tpu.solvers.chambolle_pock import (
        _cp_chunk_restart_device, _kkt_score)

    prob, pre, x0, y0 = _dia_problem(seed=11)
    f32 = jnp.float32
    pre = dict(pre, sigma_ineq=pre["sigma_ineq"])
    state = (x0, x0, jnp.zeros(0, f32), y0)
    rstate0 = {
        "state": state,
        "omega": jnp.asarray(1.0, f32),
        "mu_restart": _kkt_score(prob, x0, state[2], y0).astype(f32),
        "mu_last": jnp.asarray(np.inf, f32),
        "zx": x0, "zeq": state[2], "zineq": y0,
    }
    ref_rs, ref_metrics = _cp_chunk_restart_device(
        prob, pre, rstate0, 45, 20, use_fused=None, theta_f=1.0)
    monkeypatch.setattr(cw, "_FORCE_INTERPRET", True)
    win_rs, win_metrics = _cp_chunk_restart_device(
        prob, pre, rstate0, 45, 20, use_fused="windowed", theta_f=1.0)
    np.testing.assert_allclose(win_rs["state"][0], ref_rs["state"][0],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(win_rs["omega"]),
                               float(ref_rs["omega"]), rtol=1e-4)
    np.testing.assert_allclose(float(win_metrics["energy1"]),
                               float(ref_metrics["energy1"]), rtol=1e-3)
